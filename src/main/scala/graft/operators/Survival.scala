package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event statistics over right-censored data — retention
  * beyond the fixed-horizon cohort matrix: every subject contributes
  * exactly the information it has (a still-active user is "censored",
  * not a churn), which is what makes the curve unbiased while half the
  * population is still alive.
  */
object Survival {

  /** Kaplan–Meier product-limit survival curve over one row per
    * subject: (duration int64 ≥ 0, observed 0/1 — 1 = the terminal
    * event happened at `duration`, 0 = censored then). Emits one row
    * per distinct EVENT time t, the curve's step points:
    * (t, n_risk, n_event, n_censor, surv_e6) with
    * S(t) = Π_{u ≤ t} (r_u − d_u)/r_u.
    *
    * Engine parity: the product is computed as a SEQUENTIAL integer
    * recurrence S_k = S_{k−1}·(r_k − d_k) div r_k from S₀ = 10⁶ —
    * each step one int64 multiply + truncating divide, so any engine
    * replaying the same ordered steps lands on identical integers
    * (the [[TimeSeries]] fold discipline; a float Π + one final round
    * would be partition-order–dependent). Intermediates are bounded by
    * 10⁶·r — never near overflow.
    *
    * Scale shape: the fact table collapses to one row per distinct
    * duration FIRST (one partial-agg shuffle); everything after — the
    * reverse-cumulative at-risk window and the prefix fold — runs on
    * the curve axis, whose length is calendar-bounded, and carries the
    * [[TimeSeries.boundedSeries]] guard, so misuse on an unaggregated
    * axis fails loudly instead of folding a corpus in one row. The
    * at-risk window is a declared-bounded `partitionBy(lit(0))` over
    * those curve rows only.
    */
  def kaplanMeier(units: DataFrame, duration: Column, observed: Column,
                  maxSeriesLen: Int = TimeSeries.DefaultMaxSeriesLen): DataFrame = {
    val perT = units
      .select(duration.cast("long").as("t"),
        observed.cast("long").as("obs"))
      .groupBy(col("t"))
      .agg(sum(col("obs")).as("d"),
        sum(lit(1L) - col("obs")).as("c"))
    // at-risk at t = subjects whose duration ≥ t: reverse running sum
    // over the curve axis (declared-bounded: one row per distinct
    // duration, calendar-sized — see PlanSpec's window budget)
    val atRisk = perT.withColumn("r",
      sum(col("d") + col("c")).over(Window.partitionBy(lit(0))
        .orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the survival product only steps at event times; censor-only times
    // drop out AFTER contributing their at-risk mass above
    val steps = atRisk.where(col("d") > 0)
      .agg(array_sort(collect_list(
        struct(col("t"), col("r"), col("d"), col("c")))).as("series"))
      .select(TimeSeries.boundedSeries(col("series"), "kaplanMeier",
        maxSeriesLen).as("series"))
    steps.select(posexplode(col("series")), col("series"))
      .select(col("col.t").as("t"), col("col.r").as("n_risk"),
        col("col.d").as("n_event"), col("col.c").as("n_censor"),
        expr("aggregate(slice(series, 1, pos + 1), 1000000L, " +
          "(s, x) -> s * (x.r - x.d) div x.r)").as("surv_e6"))
  }
}
