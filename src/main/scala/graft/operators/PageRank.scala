package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list, in FIXED-POINT INT64 units.
  *
  * Floating-point PageRank is summation-order-dependent: a distributed
  * sum of double contributions differs in ulps from run to run and engine
  * to engine, and iteration compounds the divergence. Ranks here are
  * integer "mass units" (`unit` = 1e12 ≈ total mass 1.0): every transfer
  * is an integer floor-division, every combine an exact int64 sum, so the
  * result is bit-identical on any partitioning, any engine, any scale —
  * the property that makes a distributed iterative computation testable
  * against an independent oracle at all. (The floor discards < 1e-10 of
  * mass per hop — far below any ranking-relevant difference.)
  *
  * Each iteration is one join (ranks ⋈ edges, both keyed on the node id)
  * + one aggregate (sum per destination) + one left join back to the node
  * set for no-inbound nodes — the same bounded-shuffle shape per round as
  * [[Dedup.clusters]]. Degrees are computed once. With damping d=85/100:
  *
  *   pr'(v) = 15·unit/(100·N)  +  Σ_{u→v} (pr(u)·85) div (100·deg(u))
  */
object PageRank {

  val MassUnit: Long = 1000000000000L

  /** `edges` must have long columns (`src`, `dst`). Returns (node, pr)
    * after `iters` rounds from a uniform start. Node set = src ∪ dst.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // nodes is referenced iters+1 times and edges-with-degrees iters
    // times; lazy localCheckpoints truncate the shared lineage so the
    // edge derivation runs ONCE per action instead of once per reference
    // (on a long-running cluster job swap for reliable checkpoint() /
    // a table write — same contract as Dedup.clusters)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesWithDeg = e.join(deg, "src").localCheckpoint(false)
    // N via broadcast 1-row aggregate — the scalar reaches every task
    // without a driver round-trip, and the plan stays fully lazy
    val n = nodes.agg(count(lit(1)).as("nn"))
    var ranks = nodes.join(broadcast(n))
      .select(col("node"), expr(s"${MassUnit}L div nn").as("pr"))
    for (_ <- 1 to iters) {
      val contribs = edgesWithDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("(pr * 85L) div (100L * deg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inbound"))
      ranks = nodes.join(broadcast(n))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(15L * ${MassUnit}L) div (100L * nn)") + coalesce(col("inbound"), lit(0L))).as("pr"))
    }
    ranks
  }
}
