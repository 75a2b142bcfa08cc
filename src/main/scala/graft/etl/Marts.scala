package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BI-mart operators (reference: etl_imdb.py:196–235): grouped KPIs,
  * (thresholded) top-N per group, fixed-width histograms.
  */
object Marts {

  /** Grouped KPI aggregate — count/avg/sum per group key
    * (reference: etl_imdb.py:196 `build_mart_year_kpi`). Spark's hash
    * aggregate does map-side partial aggregation, so the shuffle carries
    * only (group, partial state) regardless of input size.
    */
  def kpiByGroup(df: DataFrame, group: Column, as: String, aggs: Seq[Column]): DataFrame =
    df.groupBy(group.as(as)).agg(aggs.head, aggs.tail: _*)

  /** Top-N rows per group under a TOTAL order (callers must include a
    * unique tie-break column — the reference ranks by `num_votes` alone,
    * etl_imdb.py:210, which is non-deterministic under ties; we fix that).
    * Optional pre-filter = the reference's `--min-votes` threshold
    * (etl_imdb.py:217).
    *
    * Scale: row_number over (group, order) is one shuffle; with AQE a
    * skewed group splits into multiple reducers only for the pre-rank sort.
    * For small N a per-partition top-N pre-prune would cut the exchange —
    * noted as a future custom operator.
    */
  def topNPerGroup(df: DataFrame, groups: Seq[Column], order: Seq[Column], n: Int,
                   preFilter: Option[Column] = None): DataFrame = {
    val base = preFilter.map(df.filter).getOrElse(df)
    val w = Window.partitionBy(groups: _*).orderBy(order: _*)
    base.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= n)
  }

  /** Fixed-width histogram (reference: etl_imdb.py:230
    * `build_mart_rating_distribution`, width 0.5 via floor(x*2)/2).
    * Emits the integer bucket index `floor(value/width)` so engines agree
    * bit-for-bit; callers recover the bound as index*width.
    */
  def histogram(df: DataFrame, groups: Seq[Column], value: Column, width: Double): DataFrame = {
    val bucket = floor(value / lit(width)).cast("long")
    df.groupBy((groups :+ bucket.as("bucket")): _*).agg(count(lit(1)).as("n"))
  }
}
