package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum spanning forest — distributed Borůvka, the classic
  * parallel-MSF shape: every round each component picks its cheapest
  * outgoing edge under the TOTAL order (w, u, v) (ties deterministic,
  * so with distinct weights the result is THE unique MSF and with ties
  * it is still replayable), the picked edges join the forest, and
  * components contract along them. Component count at least halves per
  * round ⇒ ≤ log₂(V) rounds.
  *
  * Per round: two comp-label joins over the edge set (equi, keyed),
  * one min-struct aggregate per component side, and a component-level
  * connected-components relabel ([[Dedup.clusters]], pointer-doubling
  * — the merge graph is one edge per component, so the CC input
  * SHRINKS with the component count, not the data). Frontier tables
  * are lazily checkpointed per round so the iterated plan never nests
  * (the [[Bfs]]/[[PageRank]] contract); the loop early-stops the first
  * round no cross-component edge remains.
  *
  * Contraction reuses [[Dedup.clusters]] (pointer-doubling, reliable
  * per-round checkpoints — the executor-loss contract of every CC in
  * this library); a lazy-checkpoint inner CC was tried and measured
  * SLOWER (lazy chains across two nested loops thrash recomputation),
  * so the reliable form is also the fast form here.
  *
  * No SQL twin exists for iterative union–find, so the driver gate for
  * this operator is rows-only by declared design; correctness is
  * pinned by Kruskal-parity property specs (random graphs with
  * distinct md5 weights → edge-set equality with a local union–find).
  */
object Msf {

  /** `edges`: long `src`, `dst`, `w` (undirected; parallel edges keep
    * the min weight). Returns forest edges (u, v, w, round) with
    * u < v; `round` is the Borůvka round that admitted the edge.
    */
  def msf(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1)
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"),
        col("w").cast("long").as("w"))
      .where(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
      .localCheckpoint(false)
    var comp = e.select(explode(array(col("u"), col("v"))).as("node"))
      .distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(false)
    var forest: DataFrame = null
    var done = false
    var round = 1
    while (!done && round <= maxRounds) {
      val labeled = e
        .join(comp.select(col("node").as("u"), col("comp").as("cu")), "u")
        .join(comp.select(col("node").as("v"), col("comp").as("cv")), "v")
        .where(col("cu") =!= col("cv"))
        .localCheckpoint(false) // two consumers: done-probe + both pick sides
      // count(), not isEmpty: a take-based probe materializes only ONE
      // partition of the lazy checkpoint and every later consumer then
      // recomputes the rest from the full cross-round lineage — the
      // classic partial-materialization blowup; an aggregate probe
      // materializes every partition exactly once
      if (labeled.count() == 0) done = true
      else {
        val cand = labeled.select(col("cu").as("c"), col("w"), col("u"), col("v"))
          .unionByName(labeled.select(col("cv").as("c"), col("w"), col("u"), col("v")))
        val picked = cand.groupBy(col("c"))
          .agg(min(struct(col("w"), col("u"), col("v"))).as("m"))
          .select(col("m.u").as("u"), col("m.v").as("v"), col("m.w").as("w"))
          .distinct() // the edge both of its components picked enters once
          .localCheckpoint(false) // consumers: forest union + contraction
        val add = picked.withColumn("round", lit(round.toLong))
        forest = if (forest == null) add
          else forest.unionByName(add).localCheckpoint(false)
        // contract: CC over the component-level merge edges, then
        // relabel every node's component; components untouched this
        // round keep their label (left join + coalesce)
        val mergeEdges = picked
          .join(comp.select(col("node").as("u"), col("comp").as("ca")), "u")
          .join(comp.select(col("node").as("v"), col("comp").as("cb")), "v")
          .select(least(col("ca"), col("cb")).as("doc_a"),
            greatest(col("ca"), col("cb")).as("doc_b"))
        val relabel = Dedup.clusters(mergeEdges, doubling = true)
          .select(col("doc_id").as("comp"), col("cluster_id"))
        comp = comp.join(relabel, Seq("comp"), "left")
          .select(col("node"),
            coalesce(col("cluster_id"), col("comp")).as("comp"))
          .localCheckpoint(false)
      }
      round += 1
    }
    // components at least halve per round, so hitting the bound means
    // maxRounds < log2(components) — a silently partial forest would
    // be a wrong answer, so refuse instead
    require(done || round > maxRounds && {
      val remaining = e
        .join(comp.select(col("node").as("u"), col("comp").as("cu")), "u")
        .join(comp.select(col("node").as("v"), col("comp").as("cv")), "v")
        .where(col("cu") =!= col("cv")).isEmpty
      remaining
    }, s"Msf.msf: not converged after $maxRounds rounds — raise maxRounds")
    if (forest == null)
      e.limit(0).withColumn("round", lit(0L))
    else forest
  }

}
