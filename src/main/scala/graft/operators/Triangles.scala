package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree orientation — the classic
  * bounded-fan-out formulation (cf. Suri & Vassilvitskii, "Counting
  * Triangles and the Curse of the Last Reducer", WWW'11).
  *
  * The naive wedge join fans out quadratically in the HIGHEST degree:
  * one celebrity node with degree 10⁶ yields 5·10¹¹ wedges in a single
  * reducer. Orienting every edge from its (degree, id)-smaller endpoint
  * to the larger turns the graph into a DAG where each vertex's
  * OUT-degree is O(√m) regardless of its true degree — so the wedge
  * join's per-key fan-out is bounded by construction, which is the
  * difference between "finishes at 100 TB" and "last reducer never
  * ends". Each triangle then has exactly one apex (its orientation-
  * minimal vertex) and is found exactly once: apex→x, apex→y wedges
  * closed by the canonical undirected edge (x, y).
  *
  * Pure integer joins/aggregates; the oracle replays the same
  * orientation bit-for-bit.
  */
object Triangles {

  /** Per-node triangle participation counts `(node, n_tri)` over an
    * undirected edge list (`src`, `dst`; self-loops dropped, direction
    * and duplicates ignored). Nodes in no triangle are absent.
    *
    * The canonical edge set feeds three consumers (degrees, the two
    * oriented sides, the closure probe) and the oriented set two — both
    * are lazily checkpointed so each computes once per action.
    */
  def perNodeCounts(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
      .localCheckpoint(false)
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("u"), col("e2.t").as("v"))
      .join(e, Seq("u", "v")) // wedge (x<y) closes iff canonical edge (x,y) exists
      .select(col("a"), col("u"), col("v"))
    tri.select(explode(array(col("a"), col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
