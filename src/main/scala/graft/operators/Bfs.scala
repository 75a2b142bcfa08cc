package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS: minimum hop distance from a seed set, the
  * distributed answer to recursive-CTE workloads (reachability,
  * blast-radius, org-hierarchy rollups) that SQL engines express with
  * `WITH RECURSIVE` and Spark lacks natively.
  *
  * Frontier iteration with the textbook bound: each round joins ONLY the
  * current frontier (not the visited set) to the edge list, distincts
  * the expansion, and anti-joins the visited set — so total work across
  * all rounds is O(edges reached) regardless of depth, and a node's
  * first discovery round IS its minimum hop distance (no min-aggregate
  * needed). Frontier and visited are lazily checkpointed per round so
  * the iterated plan never nests (same contract as [[PageRank]]).
  */
object Bfs {

  /** The loop-static edge table, width-pinned once for the per-SEED
    * loops' CPU-dense expansion joins — see [[StaticTable.pinned]] for
    * the measured scope (win here, net loss on the cheap-per-row
    * rank-propagation loops, and no exchange elimination under AQE).
    */
  private def prepEdges(edges: DataFrame): DataFrame =
    StaticTable.pinned(
      edges.select(col("src").cast("long"), col("dst").cast("long")),
      col("src"))

  /** `edges` must have long columns (`src`, `dst`; directed — symmetrize
    * for undirected), `seeds` a `node` column. Returns (node, dist) for
    * every node within `maxHops` of any seed; seeds are dist 0.
    */
  def hopDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    // plain checkpoint, no [[prepEdges]]: the single-source frontier is
    // tiny, and the one-time repartition+sort costs more than the
    // per-round edge exchanges it removes (measured r15 twice:
    // q_bfs_reach +0.2/+0.5 s with the pinned layout)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false)
    var visited = seeds.select(col("node").cast("long"), lit(0L).as("dist"))
      .distinct().localCheckpoint(false)
    var frontier: DataFrame = visited.select(col("node"))
    for (h <- 1 to maxHops) {
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(false) // two consumers: union + next frontier
      visited = visited
        .unionByName(next.select(col("node"), lit(h.toLong).as("dist")))
        .localCheckpoint(false)
      frontier = next
    }
    visited
  }

  /** Per-seed BFS: minimum hop distance from EACH seed separately —
    * the state is keyed (seed, node), so one pass answers every seed's
    * neighborhood query at once instead of looping seeds on the driver.
    * Same frontier discipline as [[hopDistances]] (expand only the
    * frontier, anti-join the visited set, lazy checkpoint per round);
    * total work is O(Σ_seed edges reached), the sampled-centrality
    * budget, and the caller bounds it by sampling seeds.
    */
  def perSeedHopDistances(edges: DataFrame, seeds: DataFrame,
                          maxHops: Int): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    val e = prepEdges(edges)
    var visited = seeds.select(col("node").cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"))
      .localCheckpoint(false)
    var frontier: DataFrame = visited.select(col("seed"), col("node"))
    for (h <- 1 to maxHops) {
      // Joins deliberately stay SORT-MERGE: shuffle-hash was measured
      // at sf1 (r10) and REJECTED — hinting either side grew spill
      // (disk 0.91 → 1.24 GB, mem 14.3 → 20.1 GB; the spillable hash
      // builds of the per-round edge/visited partitions cost more than
      // the sorts). The residual ~0.9 GB sf1 spill lives in the
      // per-round distinct over the expanded frontier — seeds ×
      // frontier fan-in, inherent to multi-source BFS and bounded by
      // the visited set.
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(visited, Seq("seed", "node"), "left_anti")
        .localCheckpoint(false) // two consumers: union + next frontier
      visited = visited
        .unionByName(next.select(col("seed"), col("node"),
          lit(h.toLong).as("dist")))
        .localCheckpoint(false)
      frontier = next
    }
    visited
  }

  /** Truncated harmonic centrality (Boldi–Vigna's centrality of choice
    * for web-scale graphs, here hop-bounded): for each seed,
    * Σ_{node ≠ seed, d(seed,node) ≤ maxHops} 1/d — reachability-robust
    * (unreached nodes contribute 0 instead of ∞-poisoning the mean)
    * and exact in integer e6 (`1e6 div d` per hop ring; hop counts are
    * small integers, so no rounding ambiguity). Seeds that reach
    * nothing emit an explicit 0 row. One [[perSeedHopDistances]] pass
    * + one keyed aggregate.
    */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame,
                         maxHops: Int): DataFrame = {
    val reached = perSeedHopDistances(edges, seeds, maxHops)
      .where(col("dist") > 0)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000L div dist")).as("harmonic_e6"))
    seeds.select(col("node").cast("long").as("seed")).distinct()
      .join(reached, Seq("seed"), "left")
      .na.fill(0L, Seq("n_reached", "harmonic_e6"))
  }

  /** Hop-bounded stress centrality from sampled sources — the
    * ALL-INTEGER member of the betweenness family (Shimbel's stress:
    * COUNT of shortest paths through a node, where betweenness sums
    * FRACTIONS whose addition order no engine replays exactly). For
    * each seed s: forward BFS layers carry σ(s, v) = number of
    * shortest s→v paths (sum over parents — all shortest parents sit
    * exactly one layer up, so the frontier aggregate IS the path
    * count); backward, ψ(s, v) = number of shortest-path-DAG paths
    * leaving v within the horizon (ψ = Σ_succ (1 + ψ(w))); every
    * shortest s→t path through interior v factors as σ·ψ, so
    * stress(v) = Σ_s σ(s,v)·ψ(s,v) over layers 1..H−1 (layer 0 is the
    * seed itself, layer H has ψ = 0 by truncation — the declared
    * hop-bounded semantics). Products ride DECIMAL(38,0); the final
    * cast to long is ANSI-loud on overflow.
    *
    * Scale shape: the [[perSeedHopDistances]] frontier discipline plus
    * one σ-sum per layer forward and one ψ-sum per layer backward —
    * all (seed, node)-keyed exchanges, O(Σ_seed edges reached) total;
    * seeds are the caller's sampling budget.
    */
  def stressCentrality(edges: DataFrame, seeds: DataFrame,
                       maxHops: Int): DataFrame = {
    require(maxHops >= 2, "stress needs ≥ 2 hops: interior nodes only " +
      "exist between layers 1 and maxHops−1")
    // plain checkpoint, no [[prepEdges]]: unlike the pure per-seed BFS
    // loops, stress re-joins e in BOTH directions (forward sigma +
    // backward psi passes) and the pin measured a consistent ~+1 s
    // (6.09 -> 7.08 s clean full-pass; subset medians 8.9 -> 9.8)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var visited = seeds.select(col("node").cast("long").as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"), lit(1L).as("sigma"))
      .localCheckpoint(false)
    var frontier = visited
    val layers = scala.collection.mutable.ArrayBuffer(frontier)
    for (_ <- 1 to maxHops) {
      val next = frontier.join(e, col("node") === col("src"))
        .groupBy(col("seed"), col("dst"))
        .agg(sum(col("sigma")).as("sigma"))
        .withColumnRenamed("dst", "node")
        .join(visited.select(col("seed"), col("node")),
          Seq("seed", "node"), "left_anti")
        .localCheckpoint(false)
      visited = visited.unionByName(next).localCheckpoint(false)
      frontier = next
      layers += next
    }
    var psiNext = layers(maxHops)
      .select(col("seed"), col("node"), lit(0L).as("psi"))
    var contribs = List.empty[DataFrame]
    for (h <- (maxHops - 1) to 1 by -1) {
      val pn = psiNext.select(col("seed").as("ps"), col("node").as("w"),
        col("psi").as("wpsi"))
      // ψ contributions aggregated from the SUCCESSOR side alone: expand
      // layer h+1's (seed, w, ψ) rows backward over in-edges and sum per
      // (seed, src) — one join where the previous shape ran a 3-way
      // (layers(h) ⋈ e ⋈ pn) whose first join re-shuffled the full layer
      // + σ payload per layer and whose output needed a THIRD exchange
      // into the aggregate. Keys aggregated here that are not layer-h
      // nodes are dropped by the left join below, so psiH is row-for-row
      // identical (e is distinct, pn unique per (seed, w)).
      val succSums = pn.join(e, col("w") === col("dst"))
        .groupBy(col("ps").as("seed"), col("src").as("node"))
        .agg(sum(col("wpsi") + 1L).as("psi0"))
      val psiH = layers(h).join(succSums, Seq("seed", "node"), "left")
        .select(col("seed"), col("node"), col("sigma"),
          coalesce(col("psi0"), lit(0L)).as("psi"))
        .localCheckpoint(false)
      contribs ::= psiH.where(col("psi") > 0)
        .select(col("node"),
          (col("sigma").cast("decimal(38,0)") * col("psi")).as("c"))
      psiNext = psiH.select(col("seed"), col("node"), col("psi"))
    }
    val stress = contribs.reduce(_.unionByName(_))
      .groupBy(col("node")).agg(sum(col("c")).as("s"))
    nodes.join(stress, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("s"), lit(0)).cast("decimal(38,0)").cast("long")
          .as("stress"))
  }
}
