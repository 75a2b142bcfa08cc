package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators

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

  /** Calendar dimension: one row per day of `[start, start+days)` with
    * the standard attributes — generated distributed (`spark.range`,
    * no driver loop) and engine-portably (ISO week from `weekofyear`;
    * `dow` 1=Sunday..7=Saturday, Spark's convention, which the twin
    * derives from DuckDB's 0-based `dayofweek`+1). Every warehouse's
    * first conformed dimension — generated, never loaded.
    */
  def calendarDim(spark: org.apache.spark.sql.SparkSession,
                  startDate: String, days: Int): DataFrame = {
    require(days >= 1)
    spark.range(days.toLong)
      .select(date_add(to_date(lit(startDate)), col("id").cast("int")).as("dd"))
      // the date key travels as its ISO string — DATE values cross
      // engine/pandas bridges with inconsistent dtypes, strings don't
      .select(col("dd").cast("string").as("d"),
        year(col("dd")).cast("long").as("y"),
        quarter(col("dd")).cast("long").as("q"),
        month(col("dd")).cast("long").as("m"),
        dayofmonth(col("dd")).cast("long").as("dom"),
        dayofweek(col("dd")).cast("long").as("dow"),
        weekofyear(col("dd")).cast("long").as("iso_week"),
        (dayofweek(col("dd")).isin(1, 7)).as("is_weekend"))
  }

  /** Incremental surrogate-key assignment: existing dimension rows keep
    * their keys VERBATIM (facts already reference them — stability is
    * the whole contract); unseen natural keys get `max(sk) + dense rank
    * in natural-key order`, ranked through [[operators.GlobalRank]] so
    * no global-sort window ever touches the batch. Re-running with the
    * same batch is idempotent by construction (second pass finds no
    * unseen keys).
    */
  def assignSurrogates(existing: DataFrame, incoming: DataFrame,
                       keyCol: String, skCol: String): DataFrame = {
    val fresh = incoming.select(col(keyCol)).where(col(keyCol).isNotNull)
      .distinct()
      .join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")
    val maxSk = existing.agg(
      coalesce(max(col(skCol)), lit(0L)).as("__mx"))
    val ranked = operators.GlobalRank.globalRank(fresh,
        Seq(col(keyCol).asc), "__rk")
      .crossJoin(broadcast(maxSk))
      .select(col(keyCol), (col("__mx") + col("__rk")).as(skCol))
    existing.select(col(keyCol), col(skCol)).unionByName(ranked)
  }
}
