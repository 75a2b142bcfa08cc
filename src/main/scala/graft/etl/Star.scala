package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema builders: dimensions, multi-valued bridge tables, facts.
  * (reference: etl_imdb.py:152–193 — dim_year / dim_title / dim_genre +
  * bridge_title_genre / fact_ratings.)
  */
object Star {

  /** Dimension from the distinct non-null values of one column
    * (reference: etl_imdb.py:152 `build_dim_year`). The distinct is a
    * single hash-shuffle on the dimension value with map-side partial
    * aggregation — the cheapest possible plan.
    */
  def dimFromColumn(df: DataFrame, c: Column, as: String): DataFrame =
    df.select(c.as(as)).where(col(as).isNotNull).distinct()

  /** Multi-valued attribute → (normalized dim, bridge) pair:
    * split on a separator, explode, trim+lower, distinct
    * (reference: etl_imdb.py:168–182 `build_dim_genre_and_bridge`).
    *
    * Unlike the reference (which joins the exploded rows back against the
    * freshly-built dim — an extra shuffle), the bridge here is just the
    * distinct exploded pairs: the dim key IS the normalized value, so the
    * join is redundant. One less exchange at scale, identical result.
    */
  def explodeBridge(df: DataFrame, key: Column, multi: Column, sep: String,
                    keyAs: String, valAs: String): (DataFrame, DataFrame) = {
    val pairs = df
      .select(key.as(keyAs), explode(filter(split(multi, sep), t => t =!= lit(""))).as(valAs))
      .withColumn(valAs, lower(trim(col(valAs))))
    val dim = pairs.select(col(valAs)).distinct()
    val bridge = pairs.distinct()
    (dim, bridge)
  }

  /** Fact build: inner key-join + projection/rename
    * (reference: etl_imdb.py:185 `build_fact_ratings`). Callers wrap the
    * smaller side in `broadcast(...)` when it fits (dims almost always do).
    */
  def fact(left: DataFrame, right: DataFrame, joinCols: Seq[String],
           projection: Seq[Column]): DataFrame =
    left.join(right, joinCols, "inner").select(projection: _*)
}
