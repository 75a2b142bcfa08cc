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

  /** `edges` must have long columns (`src`, `dst`; directed — symmetrize
    * for undirected), `seeds` a `node` column. Returns (node, dist) for
    * every node within `maxHops` of any seed; seeds are dist 0.
    */
  def hopDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
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
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false)
    var visited = seeds.select(col("node").cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"))
      .localCheckpoint(false)
    var frontier: DataFrame = visited.select(col("seed"), col("node"))
    for (h <- 1 to maxHops) {
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
}
