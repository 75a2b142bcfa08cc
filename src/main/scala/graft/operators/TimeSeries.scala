package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer series statistics over a bounded, post-aggregate
  * series (one row per period) — the sequential/lag math never touches
  * the fact table; the caller reduces the fact table to the series
  * with one partial aggregate first.
  */
object TimeSeries {

  /** Autocorrelation at lags 1..maxLag of an integer series, exact to
    * the last bit: with S = Σx and n rows, n²(x_t−x̄)(x_{t+k}−x̄) =
    * (n·x_t−S)(n·x_{t+k}−S), so numerator and denominator are exact
    * DECIMAL(38,0) integers and the single ppm division truncates
    * toward zero (matching DuckDB/C `//` semantics — spec-pinned on a
    * negative lag). Input `series`: (`mkey` long — DENSE consecutive
    * period keys, `x` long). Emits (k, n_pairs, acf_ppm); lags with no
    * pairs produce no row.
    */
  def acf(series: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val st = series.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val c = series.crossJoin(broadcast(st))
      .select(col("mkey"),
        (col("n") * col("x") - col("sx")).cast("decimal(38,0)").as("cx"))
    val den = c.agg(sum(col("cx") * col("cx")).as("den"))
    c.withColumn("k", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("mkey2", col("mkey") + col("k"))
      .join(c.select(col("mkey").as("mkey2"), col("cx").as("cx2")), Seq("mkey2"))
      .groupBy(col("k").cast("long").as("k"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("cx") * col("cx2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("k"), col("n_pairs"),
        expr("num * 1000000 div den").as("acf_ppm"))
  }

  /** Seasonal decomposition by phase baseline: each period's phase
    * (mkey mod `period`) gets the integer mean of its phase class
    * (`Σx div count` — exact, floor for the non-negative measures this
    * serves), and the residual x − baseline is the deseasonalized
    * series. The phase aggregate is `period` rows, so the join back is
    * a broadcast; the fact table was already reduced to the series by
    * the caller. Emits (mkey, phase, x, baseline, residual).
    */
  def seasonalBaseline(series: DataFrame, period: Int): DataFrame = {
    require(period >= 1)
    val s = series.select(col("mkey"), col("x"),
      pmod(col("mkey"), lit(period.toLong)).as("phase"))
    val base = s.groupBy("phase")
      .agg(expr("sum(x) div count(1)").as("baseline"))
    s.join(broadcast(base), Seq("phase"))
      .select(col("mkey"), col("phase"), col("x"), col("baseline"),
        (col("x") - col("baseline")).as("residual"))
  }
}
