package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer series statistics over a bounded, post-aggregate
  * series (one row per period) — the sequential/lag math never touches
  * the fact table; the caller reduces the fact table to the series
  * with one partial aggregate first.
  */
object TimeSeries {

  /** Default bound for [[boundedSeries]] — generous for any calendar
    * axis (10k monthly periods ≈ 800 years) while failing long before
    * a quadratic prefix-fold over a mistakenly-unaggregated fact table
    * could wedge an executor. */
  val DefaultMaxSeriesLen = 10000

  /** Loud bound for the collect-to-array fold family ([[holtSmooth]],
    * [[holtWinters]], and the EWMA/CUSUM query forms): these folds are
    * only correct AND only cheap because the caller reduced the fact
    * table to one bounded row per period before collecting — the whole
    * series lands in a single row and the prefix recurrence is O(n²).
    * That precondition was previously prose per-operator; this makes it
    * executable: past `maxLen` the plan raises at execution (same
    * inside-the-plan `raise_error` contract as
    * [[Similarity.bruteForceTopK]]'s maxQueries guard — composing and
    * explaining stay lazy, running a misuse fails loudly instead of
    * silently building a corpus-sized array on one executor).
    */
  def boundedSeries(series: Column, op: String,
                    maxLen: Int = DefaultMaxSeriesLen): Column =
    when(size(series) > maxLen, raise_error(concat(
      lit(s"$op: series exceeds maxSeriesLen=$maxLen rows — this fold " +
        "collects the whole series into one row and runs a quadratic " +
        "prefix recurrence; aggregate the fact table down to a bounded " +
        "(calendar-sized) series first")))).otherwise(series)

  /** Single change-point detection by binary segmentation (the first
    * split of the PELT/BinSeg family): per group, the boundary k that
    * best explains the series as two constant segments — maximize
    * `S1ₗ²/k + S1ᵣ²/(n−k)` (the SSE-reduction argmax after the constant
    * Σx² cancels). Prefix sums are exact int64; each split's score is
    * ONE double built from them with an op tree the twin replays
    * token-for-token, so the argmax (ties → smallest k) is
    * engine-exact. The O(n²) prefix fold rides the [[boundedSeries]]
    * contract — series are post-aggregate calendar-sized rows, never
    * fact rows. Output per group with ≥ 2 periods:
    * `(grp, n, split_k, mean_left, mean_right)` — means exact
    * truncating cents, split_k = size of the left segment.
    */
  def changePoint(df: DataFrame, group: Column, key: Column, value: Column,
                  maxSeriesLen: Int = DefaultMaxSeriesLen): DataFrame = {
    val series = df.select(group.as("grp"), key.as("k"),
        value.cast("long").as("v"))
      .groupBy(col("grp"), col("k")).agg(sum(col("v")).as("v"))
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(struct(col("k"), col("v")))).as("s0"))
      .select(col("grp"),
        boundedSeries(transform(col("s0"), x => x.getField("v")),
          "changePoint", maxSeriesLen).as("vs"))
      .select(col("grp"), size(col("vs")).cast("long").as("n"), col("vs"))
      .where(col("n") >= 2L)
      .withColumn("tot", aggregate(col("vs"), lit(0L), (a, x) => a + x))
    val scored = series.withColumn("best",
      array_max(transform(sequence(lit(1), (col("n") - 1L).cast("int")), k => {
        val s1l = aggregate(slice(col("vs"), lit(1), k), lit(0L), (a, x) => a + x)
        val s1r = col("tot") - s1l
        val score = (s1l.cast("double") * s1l.cast("double")) / k.cast("double") +
          (s1r.cast("double") * s1r.cast("double")) /
            (col("n") - k.cast("long")).cast("double")
        struct(score.as("s"), (-k).cast("long").as("nk"))
      })))
    scored
      .withColumn("split_k", -col("best").getField("nk"))
      .withColumn("__s1l", aggregate(
        slice(col("vs"), lit(1), col("split_k").cast("int")),
        lit(0L), (a, x) => a + x))
      .select(col("grp"), col("n"), col("split_k"),
        expr("__s1l div split_k").as("mean_left"),
        expr("(tot - __s1l) div (n - split_k)").as("mean_right"))
  }

  /** Holt double exponential smoothing (α = β = 1/4), exact-integer:
    * `l' = (x + 3(l+b)) div 4`, `b' = (l' − l + 3b) div 4`, initialized
    * at (x₀, 0). Same bounded array-fold shape as the EWMA query: the
    * series collects to one sorted array post-aggregate, the sequential
    * recurrence runs inside `aggregate(...)` per prefix, and every
    * intermediate is exact int64 (Spark `div` and DuckDB `//` truncate
    * identically, which matters because the trend goes negative).
    * Input: one row per period `(keyCol, valCol)` — already aggregated;
    * values must be non-negative (a −1 sentinel marks the fold's seed,
    * the same convention as the EWMA query).
    * Output: `(keyCol, valCol, level, trend, forecast)`.
    */
  def holtSmooth(series: DataFrame, keyCol: String, valCol: String,
                 maxSeriesLen: Int = DefaultMaxSeriesLen): DataFrame =
    series
      .agg(array_sort(collect_list(struct(col(keyCol).as("k"), col(valCol).as("v"))))
        .as("series"))
      .select(boundedSeries(col("series"), "holtSmooth", maxSeriesLen).as("series"))
      .select(col("series"), posexplode(col("series")))
      .select(col("col.k").as(keyCol), col("col.v").as(valCol),
        expr("aggregate(slice(series, 1, pos + 1), " +
          "named_struct('l', -1L, 'b', 0L), (acc, r) -> " +
          "if(acc.l < 0L, named_struct('l', r.v, 'b', 0L), " +
          "named_struct('l', (r.v + 3L*(acc.l + acc.b)) div 4L, " +
          "'b', (((r.v + 3L*(acc.l + acc.b)) div 4L) - acc.l " +
          "+ 3L*acc.b) div 4L)))").as("h"))
      .select(col(keyCol), col(valCol),
        col("h.l").as("level"), col("h.b").as("trend"),
        (col("h.l") + col("h.b")).as("forecast"))

  /** Holt–Winters triple (additive-seasonal) smoothing, α = β = γ =
    * 1/4, exact-integer — extends [[holtSmooth]] with a seasonal state
    * ARRAY of `period` slots carried through the fold: with
    * s = seasonal[i mod period],
    * `l' = (x − s + 3(l+b)) div 4`, `b' = (l' − l + 3b) div 4`,
    * `s' = (x − l' + 3s) div 4`, seeded at (x₀, 0, zeros) — the
    * zero-seeded seasonal warms up over the first cycles, the exact
    * analogue of [[holtSmooth]]'s (x₀, 0) seed, so no separate
    * first-season initialization pass is needed and every intermediate
    * stays int64 (`div` truncation matches DuckDB `//` on the negative
    * trend/seasonal intermediates, same contract as the EWMA/Holt
    * folds). One-step forecast = l' + b' + seasonal'[next phase].
    * Input: one row per period (keyCol, valCol), already aggregated
    * upstream — the O(n²) prefix-fold runs on the bounded series, not
    * the fact table. Output:
    * (keyCol, valCol, level, trend, seasonal, forecast).
    */
  def holtWinters(series: DataFrame, keyCol: String, valCol: String,
                  period: Int,
                  maxSeriesLen: Int = DefaultMaxSeriesLen): DataFrame = {
    require(period >= 1, s"holtWinters: period must be >= 1, got $period")
    // the level update, repeated inline wherever l' is needed (the
    // lambda can't bind intermediates) — phase is 0-based `acc.i % p`
    val lNew = "((r.v - element_at(acc.s, (acc.i % " + period + ") + 1) " +
      "+ 3L*(acc.l + acc.b)) div 4L)"
    series
      .agg(array_sort(collect_list(struct(col(keyCol).as("k"), col(valCol).as("v"))))
        .as("series"))
      .select(boundedSeries(col("series"), "holtWinters", maxSeriesLen).as("series"))
      .select(col("series"), posexplode(col("series")))
      .select(col("col.k").as(keyCol), col("col.v").as(valCol), col("pos"),
        expr("aggregate(slice(series, 1, pos + 1), " +
          "named_struct('l', -1L, 'b', 0L, 'i', 0, " +
          s"'s', array_repeat(0L, $period)), (acc, r) -> " +
          "if(acc.l < 0L, " +
          "named_struct('l', r.v, 'b', 0L, 'i', 1, 's', acc.s), " +
          "named_struct(" +
          s"'l', $lNew, " +
          s"'b', ($lNew - acc.l + 3L*acc.b) div 4L, " +
          "'i', acc.i + 1, " +
          s"'s', transform(acc.s, (x, j) -> if(j = acc.i % $period, " +
          s"(r.v - $lNew + 3L*element_at(acc.s, (acc.i % $period) + 1)) div 4L, " +
          "x)))))").as("h"))
      .select(col(keyCol), col(valCol),
        col("h.l").as("level"), col("h.b").as("trend"),
        expr(s"element_at(h.s, (pos % $period) + 1)").as("seasonal"),
        (col("h.l") + col("h.b") +
          expr(s"element_at(h.s, ((pos + 1) % $period) + 1)")).as("forecast"))
  }

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

  /** Per-group exact OLS trend fit over an integer series: slope and
    * intercept of the least-squares line from the closed form
    * `slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)` — every moment an exact
    * DECIMAL(38,0) sum in ONE partial-aggregate pass per group (the
    * n²-cancellation trick the ACF uses: no mean-centering pass, no
    * doubles), then two truncating divisions:
    * `slope_ppm = num·1e6 div den` and
    * `intercept = (Σy·den − num·Σx) div (n·den)` (the exact rational
    * form of ȳ − slope·x̄). Degenerate groups (single point, or all x
    * equal → den = 0) yield NULL slope/intercept explicitly — a bare
    * div would null-divide in Spark but ERROR in DuckDB, so the guard
    * is part of the portable contract. The trend-per-segment companion
    * to [[holtSmooth]]'s smoothing: one shuffle on the group key,
    * constant state per group.
    */
  def trendFit(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol).cast("decimal(38,0)")).as("__sx"),
        sum(col(yCol).cast("decimal(38,0)")).as("__sy"),
        sum(col(xCol).cast("decimal(38,0)") * col(yCol)).as("__sxy"),
        sum(col(xCol).cast("decimal(38,0)") * col(xCol)).as("__sxx"))
      .select(col(groupCol), col("n"), col("__sx"), col("__sy"),
        expr("n * __sxy - __sx * __sy").as("__num"),
        expr("n * __sxx - __sx * __sx").as("__den"))
      .select(col(groupCol), col("n"),
        when(col("__den") === 0, lit(null).cast("long"))
          .otherwise(expr("__num * 1000000 div __den")).as("slope_ppm"),
        when(col("__den") === 0, lit(null).cast("long"))
          .otherwise(expr("(__sy * __den - __num * __sx) div (n * __den)"))
          .as("intercept"))

  /** Period-over-period change: for each (group, period) the exact-ppm
    * growth vs the previous period (`lagShort`, e.g. 1 = MoM) and vs
    * the same period a cycle ago (`lagCycle`, e.g. 12 = YoY) — the
    * BI-dashboard staple, exact integers so every engine agrees on
    * every cell. Lags are ROW lags over the PRESENT periods — a gap in
    * the series makes "previous period" mean "previous observed
    * period"; run [[graft.etl.Marts]]' calendar gap-fill upstream when
    * strict calendar lags are wanted. First-`lag` periods report NULL
    * (no base), division
    * is by the LAGGED value (`(y−y₋ₗ)·10⁶ div y₋ₗ` — trunc in both
    * engines, sign-correct for declines). One bounded per-group window
    * pass over the already-aggregated series.
    */
  def pctChange(series: DataFrame, groupCol: String, xCol: String,
                yCol: String, lagShort: Int, lagCycle: Int): DataFrame = {
    require(lagShort >= 1 && lagCycle > lagShort)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__x").asc)
    series
      .select(col(groupCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .withColumn("__ls", lag(col("__y"), lagShort).over(w))
      .withColumn("__lc", lag(col("__y"), lagCycle).over(w))
      .select(col(groupCol), col("__x").as(xCol), col("__y").as(yCol),
        // per-period totals (monthly cents) reach ~2e13 at sf100 — the
        // ×1e6 scale-up wraps int64, so it rides DECIMAL(38,0)
        // (envelope audit r11); div returns BIGINT, ppm result is tiny
        expr("CAST(CAST(__y - __ls AS DECIMAL(38,0)) * 1000000 " +
          "div __ls AS BIGINT)").as("short_ppm"),
        expr("CAST(CAST(__y - __lc AS DECIMAL(38,0)) * 1000000 " +
          "div __lc AS BIGINT)").as("cycle_ppm"))
  }

  /** Theil–Sen robust trend: the MEDIAN of all pairwise slopes
    * (y_j−y_i)/(x_j−x_i), i<j — the standard outlier-immune alternative
    * to OLS ([[trendFit]]): one wild month moves OLS arbitrarily but
    * shifts the pairwise-slope median by at most one rank. Slopes are
    * exact ppm integers (`(Δy·10⁶) div Δx` — trunc-toward-zero in both
    * engines); the median is the exact two-middle-ranks form of
    * [[graft.etl.Marts.exactMedian]].
    *
    * Scale shape: the caller has already reduced the fact table to a
    * per-group series, so the self-join is O(L²) pairs per group where
    * L is the SERIES length (a few hundred points for years of monthly
    * data) — bounded by the time axis, never by corpus size. One
    * group-keyed shuffle for the pair join, one for the median window.
    */
  def theilSen(series: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val a = series.select(col(groupCol).as("grp"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val b = a.select(col("grp"), col("x").as("x2"), col("y").as("y2"))
    val slopes = a.join(b, Seq("grp")).filter(col("x2") > col("x"))
      .select(col("grp"), col("x"), col("x2"),
        // Δy ~ per-period totals (monthly cents ~2e13 at sf100): ×1e6
        // wraps int64 — DECIMAL(38,0) numerator (envelope audit r11);
        // the ppm slope itself is small, so div lands back in BIGINT
        ((col("y2") - col("y")).cast("decimal(38,0)") * lit(1000000L)).as("__num"),
        (col("x2") - col("x")).as("__den"))
      .withColumn("slope_ppm", expr("CAST(__num div __den AS BIGINT)"))
    // (x, x2) is unique per pair → a deterministic total order; ties in
    // slope value make the rank choice irrelevant to the median VALUE
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("slope_ppm").asc, col("x").asc, col("x2").asc)
    slopes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .filter(col("__rn") === expr("(__cnt + 1) div 2") ||
        col("__rn") === expr("(__cnt + 2) div 2"))
      .groupBy(col("grp"))
      .agg(max(col("__cnt")).as("n_pairs"),
        round(avg(col("slope_ppm")), 4).as("slope_ppm_med"))
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
