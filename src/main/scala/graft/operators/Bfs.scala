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
}
