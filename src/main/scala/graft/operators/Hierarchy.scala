package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bill-of-materials / org-chart hierarchy flattening: from a
  * (child, parent, qty) edge table, every (node, ancestor) pair with
  * its depth and the PRODUCT of edge quantities along the path — the
  * classic `WITH RECURSIVE` workload (part explosion, cost rollup,
  * management chains) that Spark has no native recursion for.
  *
  * The Spark-first answer is the [[Bfs]] frontier loop specialized to
  * forests: each round joins the CURRENT frontier of (node, ancestor,
  * qty) paths to the edge table on ancestor = child, extending every
  * path one level. In a forest each node has ≤1 parent, so the frontier
  * NEVER grows (no distinct, no visited anti-join needed — paths are
  * unique by construction) and total work is O(nodes × depth). Rounds
  * are lazily checkpointed so the iterated plan never nests, and the
  * loop stops early the first time a frontier comes back empty (one
  * cheap isEmpty probe per round on the already-checkpointed frontier —
  * the [[PageRank]] one-job-probe contract).
  */
object Hierarchy {

  /** `edges`: long `child`, long `parent`, long `qty` (use 1 for pure
    * ancestry). Requires a forest (≤1 parent per child) — the no-growth
    * contract above; cyclic or multi-parent input is the caller's bug,
    * bounded by `maxDepth` rather than detected. Returns
    * (node, ancestor, depth, qty): depth ≥ 1, qty = product along the
    * path (int64 — overflow is real past ~2⁶³ cumulative fan-in; keep
    * per-edge qty small or pre-scale).
    */
  def flatten(edges: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, "need at least one level")
    val e = edges.select(col("child").cast("long"), col("parent").cast("long"),
      col("qty").cast("long")).localCheckpoint(false)
    var frontier = e.select(col("child").as("node"), col("parent").as("ancestor"),
      lit(1L).as("depth"), col("qty")).localCheckpoint(false)
    var acc = frontier
    var d = 1
    var drained = false
    while (d < maxDepth && !drained) {
      val next = frontier
        .join(e.select(col("child").as("ancestor"), col("parent").as("__p"),
          col("qty").as("__q")), "ancestor")
        .select(col("node"), col("__p").as("ancestor"),
          (col("depth") + 1L).as("depth"), (col("qty") * col("__q")).as("qty"))
        .localCheckpoint(false) // two consumers: union + next frontier
      if (next.isEmpty) drained = true
      else {
        acc = acc.unionByName(next).localCheckpoint(false)
        frontier = next
      }
      d += 1
    }
    acc
  }
}
