package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experimentation statistics — the readout layer for any
  * assignment produced by [[Sampling.split]]-style hashing: Welch's
  * unequal-variance t statistic and CUPED variance reduction.
  *
  * Engine-portability discipline (the [[graft.SparkEntry]] stats-suite
  * contract): ONE partial-aggregating pass collects exact int64 sums
  * (n, Σx, Σy, Σx², Σxy per arm — order-independent, identical in any
  * engine), then each statistic is derived ONCE from those identical
  * integers with an IEEE double expression spelled with the same op
  * tree in the DuckDB twin, and floor-scaled (floor of identical
  * doubles is portable; round() is not). Integer ratios that stay
  * exact (mean difference, θ) are emitted as truncating fixed-point
  * divisions instead — DuckDB `//` and Spark `div` both truncate
  * toward zero, verified including negatives.
  */
object Experiment {

  /** IEEE / integer fragments shared VERBATIM with the DuckDB twins in
    * [[graft.Oracles]] — every token is valid in both dialects, so the
    * two engines evaluate the same op tree (only the integer-division
    * operator differs per dialect and stays inline at each use site).
    */
  private[graft] val SeaFrag =
    "((CAST(na AS DOUBLE)*CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE)*CAST(s1a AS DOUBLE)) / (CAST(na AS DOUBLE)*(CAST(na AS DOUBLE)-1)) / CAST(na AS DOUBLE))"
  private[graft] val SebFrag =
    "((CAST(nb AS DOUBLE)*CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE)*CAST(s1b AS DOUBLE)) / (CAST(nb AS DOUBLE)*(CAST(nb AS DOUBLE)-1)) / CAST(nb AS DOUBLE))"
  private[graft] def tE6Frag(sea: String, seb: String): String =
    s"CAST(floor((CAST(s1a AS DOUBLE)/CAST(na AS DOUBLE) - CAST(s1b AS DOUBLE)/CAST(nb AS DOUBLE)) / sqrt($sea + $seb) * 1e6) AS BIGINT)"
  private[graft] def dfE6Frag(sea: String, seb: String): String =
    s"CAST(floor(($sea + $seb)*($sea + $seb) / ($sea*$sea/(CAST(na AS DOUBLE)-1) + $seb*$seb/(CAST(nb AS DOUBLE)-1)) * 1e6) AS BIGINT)"
  private[graft] val ThetaNumFrag =
    "(CAST(n AS DECIMAL(38,0))*sxy - CAST(sx AS DECIMAL(38,0))*sy)"
  private[graft] val ThetaDenFrag =
    "(CAST(n AS DECIMAL(38,0))*sxx - CAST(sx AS DECIMAL(38,0))*sx)"
  private[graft] def adjE4Frag(tnum: String, tden: String): String =
    s"CAST(floor((CAST(sy_arm AS DOUBLE)/CAST(n_arm AS DOUBLE) - (CAST($tnum AS DOUBLE)/CAST($tden AS DOUBLE)) * (CAST(sx_arm AS DOUBLE)/CAST(n_arm AS DOUBLE) - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))) * 1e4) AS BIGINT)"

  /** Wilson-interval IEEE fragment, shared verbatim with
    * [[graft.Oracles.qWilsonCi]]: z = 1.96 (95%), so z² = 3.8416,
    * z²/2 = 1.9208, z²/4 = 0.9604 — all spelled as literals so both
    * engines evaluate the identical double op tree over the exact
    * integer (n, k) pair. `sign` is "-" (lower) or "+" (upper).
    */
  private[graft] def wilsonFrag(sign: String): String =
    "CAST(floor(((CAST(k AS DOUBLE)/CAST(n AS DOUBLE)) + 1.9208/CAST(n AS DOUBLE) " +
      s"$sign 1.96*sqrt((CAST(k AS DOUBLE)/CAST(n AS DOUBLE))*(1.0-CAST(k AS DOUBLE)/CAST(n AS DOUBLE))/CAST(n AS DOUBLE) " +
      "+ 0.9604/(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)))) " +
      "/ (1.0 + 3.8416/CAST(n AS DOUBLE)) * 1e6) AS BIGINT)"

  /** Per-group binomial proportion with the Wilson 95% score interval —
    * the release gate for any pass-rate / defect-rate / conversion
    * metric: unlike the naive normal interval it never leaves [0,1] and
    * stays calibrated at small n or extreme p, so a tiny stratum can't
    * fake a confident rate. One partial-agg pass collects exact (n, k)
    * per group; the bounds are one IEEE expression over those integers,
    * floor-scaled to ppm (portable), shared token-for-token with the
    * DuckDB twin. Emits (grp, n, n_pos, p_ppm, lo_ppm, hi_ppm).
    *
    * Scale: a single groupBy with two int64 counters of state — the
    * cheapest shape Spark has; no window, no second pass.
    */
  /** Per-stratum odds ratio with a 95% CI on the log scale — the 2×2
    * effect readout (epidemiology's native tongue, equally at home on
    * conversion tables): per group, cells a/b/c/d =
    * (exposed ∧ outcome / exposed ∧ ¬ / ¬exposed ∧ / ¬ ∧ ¬),
    * `OR = (a·d)/(b·c)` as exact-ppm truncating cross-multiplication,
    * and the Woolf interval `ln OR ± 1.96·√(1/a+1/b+1/c+1/d)` as ONE
    * IEEE expression over exact counts (shared with the twin), e6
    * floor. Any empty cell NULLs the estimate (the standard refusal —
    * a Haldane correction is a policy the caller can apply upstream).
    */
  def oddsRatio(df: DataFrame, group: Column, exposed: Column,
                outcome: Column): DataFrame = {
    val cellFrag = "cast(1.0 as double)/a + cast(1.0 as double)/b + " +
      "cast(1.0 as double)/c + cast(1.0 as double)/d"
    def bound(sign: String) =
      s"cast(floor(exp(ln((cast(a as double) * d) / " +
        s"(cast(b as double) * c)) $sign 1.96 * sqrt($cellFrag)) * 1e6) " +
        "as bigint)"
    df.select(group.as("grp"), exposed.cast("boolean").as("e"),
        outcome.cast("boolean").as("o"))
      .groupBy(col("grp"))
      .agg(sum(when(col("e") && col("o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("e") && !col("o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("e") && col("o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("e") && !col("o"), 1L).otherwise(0L)).as("d"))
      .select(col("grp"), col("a"), col("b"), col("c"), col("d"),
        when(col("a") === 0L || col("b") === 0L || col("c") === 0L ||
          col("d") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "cast(a as decimal(38,0)) * d * 1000000 div " +
              "(cast(b as decimal(38,0)) * c)")).as("or_ppm"),
        when(col("a") === 0L || col("b") === 0L || col("c") === 0L ||
          col("d") === 0L, lit(null).cast("long"))
          .otherwise(expr(bound("-"))).as("lo_e6"),
        when(col("a") === 0L || col("b") === 0L || col("c") === 0L ||
          col("d") === 0L, lit(null).cast("long"))
          .otherwise(expr(bound("+"))).as("hi_e6"))
  }

  def wilsonCI(df: DataFrame, group: Column, success: Column): DataFrame =
    df.select(group.as("grp"), success.cast("boolean").as("ok"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("k"))
      .select(col("grp"), col("n"), col("k").as("n_pos"),
        expr("k * 1000000L div n").as("p_ppm"),
        // Wilson lower bound can dip fractionally below 0 in IEEE at
        // k=0 (−2e−16 · 1e6 floors to −1); clamp both bounds to the
        // [0, 1e6] range the score interval guarantees mathematically
        greatest(lit(0L), expr(wilsonFrag("-"))).as("lo_ppm"),
        least(lit(1000000L), expr(wilsonFrag("+"))).as("hi_ppm"))

  /** Welch's t over one row per experimental unit: (arm ∈ {0,1},
    * metric int64). Output one row:
    * (n_a, n_b, sum_a, sum_b, diff_ppm, t_e6, df_e6) — diff exact ppm
    * (mean_a − mean_b), t and Welch–Satterthwaite df floor-scaled 10⁶.
    * Both arms need ≥ 2 units and nonzero pooled variance (raises
    * otherwise — a one-unit arm has no variance estimate).
    */
  def welchT(units: DataFrame, arm: Column, metric: Column): DataFrame = {
    val agg = units.select(arm.cast("long").as("arm"), metric.as("m"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") =!= 0, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 0, col("m")).otherwise(0L)).as("s1a"),
        sum(when(col("arm") =!= 0, col("m")).otherwise(0L)).as("s1b"),
        // Σm² over ~1e6 users × (1e6 cents)² brushes int64 at sf100 —
        // DECIMAL(38,0) accumulators (envelope audit r11); the IEEE
        // fragments CAST(... AS DOUBLE) downstream read decimal fine
        sum(when(col("arm") === 0,
          col("m").cast("decimal(38,0)") * col("m")).otherwise(lit(0L))).as("s2a"),
        sum(when(col("arm") =!= 0,
          col("m").cast("decimal(38,0)") * col("m")).otherwise(lit(0L))).as("s2b"))
    // IEEE fragments over the exact sums — spelled identically in the
    // DuckDB twin (Oracles.qAbTtest); sea/seb are variances OF THE MEAN
    val (sea, seb) = (SeaFrag, SebFrag)
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
      col("s1a").as("sum_a"), col("s1b").as("sum_b"),
      when(col("na") < 2 || col("nb") < 2,
        raise_error(lit("welchT: both arms need >= 2 units")))
        .otherwise(expr(
          "CAST((CAST(s1a AS DECIMAL(38,0))*nb - CAST(s1b AS DECIMAL(38,0))*na) " +
            "* 1000000 div (CAST(na AS DECIMAL(38,0))*nb) AS BIGINT)"))
        .as("diff_ppm"),
      // every derived column carries the guard: CaseWhen short-circuits,
      // so the (na−1)=0 ANSI divide-by-zero never evaluates on the
      // raise path
      when(col("na") < 2 || col("nb") < 2,
        raise_error(lit("welchT: both arms need >= 2 units")))
        .otherwise(expr(tE6Frag(sea, seb))).as("t_e6"),
      when(col("na") < 2 || col("nb") < 2,
        raise_error(lit("welchT: both arms need >= 2 units")))
        .otherwise(expr(dfE6Frag(sea, seb))).as("df_e6"))
  }

  /** Post-stratification (standardization) treatment-effect readout:
    * within each stratum the treated/control mean difference is
    * confounder-free by design, and the overall effect reweights each
    * stratum by its population share — the observational-data
    * counterpart to [[welchT]]'s randomized readout.
    *
    * One row per stratum: (grp, n, n_t, n_c, diff_e2, contrib_e2) —
    * diff is the within-stratum mean difference in hundredths of the
    * metric unit as an EXACT cross-multiplied truncating ratio,
    * contrib its population-weighted share `diff·n div N`. A final
    * `__ate__` row carries Σ contrib in BOTH diff/contrib columns —
    * the standardized average treatment effect. Every step is integer
    * (per-stratum terms truncate before the final integer sum), so the
    * result is independent of partitioning AND of stratum enumeration
    * order — a float Σ over strata would not be.
    *
    * Strata missing an arm have no within-stratum contrast: diff and
    * contrib are NULL and the stratum is excluded from the ATE sum
    * (the standard common-support restriction, visible as the NULL).
    */
  def stratifiedAte(units: DataFrame, stratum: Column, treated: Column,
                    metric: Column): DataFrame = {
    val per = units.select(stratum.cast("string").as("grp"),
        when(treated, 1L).otherwise(0L).as("tr"), metric.as("m"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("tr")).as("n_t"),
        sum(lit(1L) - col("tr")).as("n_c"),
        sum(when(col("tr") === 1, col("m")).otherwise(0L)).as("s_t"),
        sum(when(col("tr") === 0, col("m")).otherwise(0L)).as("s_c"))
    val tot = per.agg(sum(col("n")).as("n_all"))
    val rows = per.crossJoin(broadcast(tot))
      .select(col("grp"), col("n"), col("n_t"), col("n_c"),
        when(col("n_t") > 0 && col("n_c") > 0, expr(
          "CAST((CAST(s_t AS DECIMAL(38,0))*n_c - CAST(s_c AS DECIMAL(38,0))*n_t)" +
            " * 100 div (CAST(n_t AS DECIMAL(38,0))*n_c) AS BIGINT)"))
          .as("diff_e2"),
        col("n_all"))
      .withColumn("contrib_e2",
        expr("CAST(CAST(diff_e2 AS DECIMAL(38,0)) * n div n_all AS BIGINT)"))
      .drop("n_all")
    val ate = rows.agg(sum(col("n")).as("n"), sum(col("n_t")).as("n_t"),
        sum(col("n_c")).as("n_c"),
        sum(col("contrib_e2")).as("ate"))
      .select(lit("__ate__").as("grp"), col("n"), col("n_t"), col("n_c"),
        col("ate").as("diff_e2"), col("ate").as("contrib_e2"))
    rows.unionByName(ate)
  }

  /** Sample-ratio-mismatch gate: χ² of the observed arm counts against
    * the intended 50/50 split — the FIRST check any experiment readout
    * runs, because a biased assignment invalidates every downstream
    * statistic. χ² = (n_a−n_b)²/(n_a+n_b) exact (DECIMAL square —
    * safe to 10¹⁹ units), floor-scaled e4; the flag trips at the
    * 1-df 95% critical value 3.8415. One row:
    * (n_a, n_b, chi2_e4, srm_flag).
    */
  def srmGate(units: DataFrame, arm: Column): DataFrame =
    units.select(when(arm, 1L).otherwise(0L).as("a"))
      .agg(sum(when(col("a") === 1, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("a") === 0, 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b) * 10000" +
          " div (n_a + n_b) AS BIGINT)").as("chi2_e4"))
      .withColumn("srm_flag", col("chi2_e4") > 38415L)

  /** Difference-in-differences IEEE fragment, shared verbatim with the
    * DuckDB twin: (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre) over the
    * four exact (n, Σ) cell sums, floor-scaled 10⁴.
    */
  private[graft] val DidE4Frag =
    "CAST(floor(((CAST(s_tp AS DOUBLE)/CAST(n_tp AS DOUBLE) - CAST(s_ta AS DOUBLE)/CAST(n_ta AS DOUBLE)) " +
      "- (CAST(s_cp AS DOUBLE)/CAST(n_cp AS DOUBLE) - CAST(s_ca AS DOUBLE)/CAST(n_ca AS DOUBLE))) * 1e4) AS BIGINT)"

  /** Difference-in-differences over one row per (unit-period)
    * observation: (arm ∈ {0,1}, post ∈ {0,1}, metric int64). The
    * parallel-trends workhorse for launch readouts without
    * randomization: the control arm's pre→post drift nets out shared
    * seasonality/shocks. One partial-agg pass collects the four cell
    * (n, Σ); the estimate is one shared-fragment IEEE expression over
    * those integers. Output one row: the four cells' n/sums +
    * did_e4. All four cells must be populated (raises otherwise).
    */
  def did(obs: DataFrame, arm: Column, post: Column, metric: Column): DataFrame = {
    val agg = obs.select(when(arm, 1L).otherwise(0L).as("a"),
        when(post, 1L).otherwise(0L).as("p"), metric.as("m"))
      .agg(
        sum(when(col("a") === 1 && col("p") === 0, 1L).otherwise(0L)).as("n_ta"),
        sum(when(col("a") === 1 && col("p") === 1, 1L).otherwise(0L)).as("n_tp"),
        sum(when(col("a") === 0 && col("p") === 0, 1L).otherwise(0L)).as("n_ca"),
        sum(when(col("a") === 0 && col("p") === 1, 1L).otherwise(0L)).as("n_cp"),
        sum(when(col("a") === 1 && col("p") === 0, col("m")).otherwise(0L)).as("s_ta"),
        sum(when(col("a") === 1 && col("p") === 1, col("m")).otherwise(0L)).as("s_tp"),
        sum(when(col("a") === 0 && col("p") === 0, col("m")).otherwise(0L)).as("s_ca"),
        sum(when(col("a") === 0 && col("p") === 1, col("m")).otherwise(0L)).as("s_cp"))
    val empty = col("n_ta") === 0 || col("n_tp") === 0 ||
      col("n_ca") === 0 || col("n_cp") === 0
    agg.select(col("n_ta"), col("n_tp"), col("n_ca"), col("n_cp"),
      col("s_ta"), col("s_tp"), col("s_ca"), col("s_cp"),
      when(empty, raise_error(lit("did: all four arm×period cells need units")))
        .otherwise(expr(DidE4Frag)).as("did_e4"))
  }

  /** CUPED (controlled-experiment-using-pre-experiment-data) adjusted
    * means over one row per unit: (arm, x = pre-period covariate,
    * y = experiment metric), both int64. θ = cov(x,y)/var(x) is fitted
    * on the POOLED units (the standard choice — θ from pre-period data
    * is independent of assignment), exact integer num/den; each arm
    * reports its raw and adjusted mean:
    * ŷ_arm = ȳ_arm − θ·(x̄_arm − x̄). Output one row per arm:
    * (arm, n, sum_pre, sum_post, theta_e6, mean_post_e4, mean_adj_e4).
    * theta_e6 is an exact truncating fixed-point ratio; the adjusted
    * mean is the IEEE-discipline double over exact sums.
    */
  def cuped(units: DataFrame, arm: Column, pre: Column, post: Column): DataFrame = {
    val u = units.select(arm.cast("long").as("arm"),
      pre.as("x"), post.as("y"))
    val pooled = u.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      // same envelope as welchT's s2a/s2b: Σx²/Σxy over per-user cents
      // wrap int64 around sf100 — DECIMAL(38,0) accumulators
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
    val arms = u.groupBy(col("arm")).agg(count(lit(1)).as("n_arm"),
      sum(col("x")).as("sx_arm"), sum(col("y")).as("sy_arm"))
    val (tnum, tden) = (ThetaNumFrag, ThetaDenFrag)
    arms.crossJoin(broadcast(pooled))
      .select(col("arm"), col("n_arm").as("n"),
        col("sx_arm").as("sum_pre"), col("sy_arm").as("sum_post"),
        when(expr(tden) === 0,
          raise_error(lit("cuped: zero pre-period variance")))
          .otherwise(expr(s"CAST($tnum * 1000000 div $tden AS BIGINT)"))
          .as("theta_e6"),
        expr("CAST(floor(CAST(sy_arm AS DOUBLE)/CAST(n_arm AS DOUBLE) * 1e4) AS BIGINT)")
          .as("mean_post_e4"),
        when(expr(tden) === 0,
          raise_error(lit("cuped: zero pre-period variance")))
          .otherwise(expr(adjE4Frag(tnum, tden))).as("mean_adj_e4"))
  }
}
