package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-modularity audit: given an undirected edge list and a node
  * labeling, score how much MORE intra-label linkage the graph has than
  * a degree-preserving random rewiring would give — Newman's Q,
  * decomposed per label:
  *
  *   Q = Σ_c ( e_c/m − (d_c / 2m)² )
  *
  * with m = |edges|, e_c = edges with both endpoints in c, d_c = degree
  * sum of c's nodes. This is the standard yardstick for ANY partition —
  * communities from [[LabelProp]], attribute homophily (do suppliers
  * trade inside their own nation?), or blocking keys before a linkage
  * join — and it needs no ground truth.
  *
  * Exactness: both Q terms are non-negative rationals with denominators
  * m and 4m², so the audit emits `within_ppm = e_c·10⁶ div m` and
  * `expected_ppm = d_c²·10⁶ div 4m²` separately — every numerator is
  * non-negative, so truncating `div` agrees with any engine's integer
  * division convention, and Σ(within−expected)/10⁶ reconstructs Q.
  * d_c² needs DECIMAL(38,0) (HUGEINT in the DuckDB twin): d_c ≤ 2m
  * overflows int64 past ~1.5G edge endpoints.
  *
  * Distributed shape: two keyed joins label the edge endpoints (the
  * label table is node-sized — never broadcast blindly), then three
  * label-keyed partial aggregates and one 2-long-column broadcast of
  * the global totals. Nothing edge-sized survives the aggregates.
  */
object Modularity {

  /** edges: (src, dst) — ONE row per undirected edge (no mirror rows);
    * labels: (node, label) — every endpoint must be labeled (inner
    * joins drop unlabeled strays, the caller's contract).
    * Returns one row per label:
    * (label, n_nodes, degree_sum, e_within, within_ppm, expected_ppm).
    */
  def partitionModularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("node"), col("label"))
    val e = edges.select(col("src"), col("dst"))
      .join(lab.select(col("node").as("src"), col("label").as("l_src")), "src")
      .join(lab.select(col("node").as("dst"), col("label").as("l_dst")), "dst")
    val within = e.where(col("l_src") === col("l_dst"))
      .groupBy(col("l_src").as("label")).agg(count(lit(1)).as("e_within"))
    val degree = e.select(col("l_src").as("label"))
      .unionAll(e.select(col("l_dst").as("label")))
      .groupBy(col("label")).agg(count(lit(1)).as("degree_sum"))
    val nodes = lab.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
    val m = e.agg(count(lit(1)).as("m"))
    nodes
      .join(degree, Seq("label"), "left_outer")
      .join(within, Seq("label"), "left_outer")
      .na.fill(0L, Seq("degree_sum", "e_within"))
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"), col("degree_sum"), col("e_within"),
        when(col("m") === 0,
          raise_error(lit("partitionModularity: empty edge set")))
          .otherwise(expr("e_within * 1000000L div m")).as("within_ppm"),
        expr("CAST(CAST(degree_sum AS DECIMAL(38,0)) * degree_sum * 1000000 " +
          "div (CAST(m AS DECIMAL(38,0)) * m * 4) AS BIGINT)").as("expected_ppm"))
  }
}
