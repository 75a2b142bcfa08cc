package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality operators: column profiling and rule-based validation.
  *
  * A 100 TB ingest is unusable without (a) a cheap census of what the
  * data looks like and (b) a gate that splits rows violating the
  * contract into a quarantine with an audit trail. Both are single-pass
  * aggregations here — the profile's width is O(columns) and the audit's
  * is O(rules), so neither shuffles more than one row per partition.
  */
object Quality {

  /** Column profile: for each (name, projection) pair emit
    * `(col_name, n_rows, n_vals, n_distinct, min_val, max_val)`.
    * min/max are cast to string AFTER aggregating so the ordering is the
    * column's own type ordering, not string ordering.
    *
    * Projections must be engine-portable types (long / string — e.g.
    * doubles normalized to integer cents first): profile output is meant
    * to be diffable across engines and runs.
    *
    * `exactDistinct=true` unions one per-column two-level aggregate per
    * projection: groupBy(value) collapses each column to its distinct
    * values map-side (a sketch-sized shuffle), and every scan is pruned
    * to its single column. The former one-pass form with N exact
    * `count_distinct`s planned an Expand — the input stream duplicated
    * 2N+1 times into a SortAggregate, which both duplicates scan volume
    * at scale AND costs seconds of planning/codegen (measured 3.5 s at
    * sf0.1, ~all overhead). `exactDistinct=false` keeps the true
    * single-pass single-stream form via `approx_count_distinct` (HLL,
    * ±2%) — same schema, sketch accuracy, the 100 TB default.
    */
  def profile(df: DataFrame, cols: Seq[(String, Column)],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    if (exactDistinct) {
      cols.map { case (name, c) =>
        df.groupBy(c.as("__v")).agg(count(lit(1)).as("__n"))
          .agg(
            coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("__v").isNotNull, col("__n"))), lit(0L)).as("n_vals"),
            count(col("__v")).as("n_distinct"),
            min(col("__v")).cast("string").as("min_val"),
            max(col("__v")).cast("string").as("max_val"))
          .select(lit(name).as("col_name"), col("n_rows"), col("n_vals"),
            col("n_distinct"), col("min_val"), col("max_val"))
      }.reduce(_.unionByName(_))
    } else {
      val aggs = cols.zipWithIndex.flatMap { case ((_, c), i) =>
        Seq(count(c).as(s"nv_$i"), approx_count_distinct(c).as(s"nd_$i"),
          min(c).cast("string").as(s"mn_$i"), max(c).cast("string").as(s"mx_$i"))
      }
      val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      // melt with typed lit()/struct() + explode (semantically `stack`):
      // splicing caller-supplied names into an expr() string would break
      // on a quote in a name — and be an injection surface if names ever
      // come from data. The exploded array is one row wide.
      val rows = cols.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("col_name"), col(s"nv_$i").as("n_vals"),
          col(s"nd_$i").as("n_distinct"), col(s"mn_$i").as("min_val"),
          col(s"mx_$i").as("max_val"))
      }
      one.select(col("n_rows"), explode(array(rows: _*)).as("r"))
        .select(col("r.col_name"), col("n_rows"), col("r.n_vals"),
          col("r.n_distinct"), col("r.min_val"), col("r.max_val"))
    }
  }

  /** Annotate each row with `violations`: the (input-ordered) array of
    * rule names whose predicate is NOT satisfied. A NULL predicate result
    * counts as a violation — a rule must affirmatively hold to pass,
    * otherwise three-valued logic would wave NULL rows through every
    * gate. Pure map-side projection; no shuffle.
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules needs at least one rule")
    val marks = rules.map { case (name, pred) =>
      when(coalesce(pred, lit(false)), lit(null).cast("string")).otherwise(lit(name))
    }
    df.withColumn("violations", filter(array(marks: _*), x => x.isNotNull))
  }

  /** Rows satisfying every rule (empty `violations`, column dropped). */
  def valid(checked: DataFrame): DataFrame =
    checked.where(size(col("violations")) === 0).drop("violations")

  /** Rows violating at least one rule, with the `violations` audit
    * column kept for triage.
    */
  def quarantined(checked: DataFrame): DataFrame =
    checked.where(size(col("violations")) > 0)

  /** Robust per-group outlier detection: flag rows where
    * `|value − median| > k × MAD` (MAD = median absolute deviation).
    * Median/MAD resist the very outliers they hunt — mean/stddev gates
    * drag their own threshold toward the anomaly (masking), which is why
    * data-quality monitors use this form.
    *
    * Both medians are TYPE-1 lower medians (the value AT rank
    * `(n+1) div 2`), so with an integer `value` every bound stays exact
    * int64 — no distributed float summation anywhere. Cost: two
    * group-keyed window passes (rank for median, rank for MAD) plus two
    * broadcast joins of the per-group statistics; the deviation table
    * feeds the MAD pass and the final gate and is lazily checkpointed
    * so it computes once. `tieBreak` must be unique within a group for
    * deterministic ranks.
    *
    * Output: (group-as, row_key = tieBreak, value, med, mad) for
    * flagged rows only.
    */
  def robustOutliers(df: DataFrame, group: Column, as: String, value: Column,
                     tieBreak: Column, k: Long): DataFrame = {
    require(k > 0, "outlier threshold multiplier must be positive")
    val base = df.select(group.as(as), value.as("__v"), tieBreak.as("__t"))
    val w1 = Window.partitionBy(col(as)).orderBy(col("__v").asc, col("__t").asc)
    val med = base
      .withColumn("__rn", row_number().over(w1))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(as))))
      .where(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col(as), col("__v").as("med"))
    val dev = base.join(broadcast(med), as)
      .withColumn("__dev", abs(col("__v") - col("med")))
      .localCheckpoint(false)
    val w2 = Window.partitionBy(col(as)).orderBy(col("__dev").asc, col("__t").asc)
    val mad = dev
      .withColumn("__rn", row_number().over(w2))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(as))))
      .where(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col(as), col("__dev").as("mad"))
    dev.join(broadcast(mad), as)
      .where(col("__dev") > lit(k) * col("mad"))
      .select(col(as), col("__t").as("row_key"), col("__v").as("value"),
        col("med"), col("mad"))
  }

  /** Warner randomized response, the local-privacy release: each row's
    * sensitive bit is reported FLIPPED with probability p (the
    * respondent's plausible deniability — ε = ln((1−p)/p) local DP), and
    * the per-group true rate is recovered by the exact debias
    * `(r̂ − p) / (1 − 2p)` over the reported count. Flips are salted-hash
    * draws (`hash32(id) · 1e6 < p_ppm · 2³²`), so the release is
    * reproducible for the oracle and the specs; a production release
    * would key the salt secretly, which changes no plan shape.
    *
    * Arithmetic: the debias products run in DECIMAL(38,0) (n·10¹² wraps
    * int64 past ~9M rows/group) and the estimate CLAMPS to [0, 1e6] ppm
    * before the integral divide — sampling noise can push the raw
    * estimator outside the meaningful range, and the clamp also keeps
    * the floor division sign-free (truncate-vs-floor never diverges
    * cross-engine on non-negatives). One map-side flip + one grouped
    * count: the sensitive column itself never shuffles.
    * Output: `(grp, n, reported_cnt, est_true_ppm)`.
    */
  def randomizedResponse(df: DataFrame, group: Column, id: Column,
                         bit: Column, pPpm: Long, salt: String): DataFrame = {
    require(pPpm > 0 && pPpm < 500000,
      "flip probability must be in (0, 0.5): at p = 0.5 the report carries " +
        "zero signal and the debias divides by zero")
    val flip = graft.functions.HashFunctions.hash32(id, salt) * lit(1000000L) <
      lit(pPpm) * lit(4294967296L)
    df.select(group.as("grp"),
        when(bit.cast("boolean") =!= flip, 1L).otherwise(0L).as("rep"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("rep")).as("reported_cnt"))
      .select(col("grp"), col("n"), col("reported_cnt"),
        least(lit(1000000L), expr(
          s"""(greatest(cast(0 as decimal(38,0)),
             |  cast(reported_cnt as decimal(38,0)) * 1000000
             |    - cast(n as decimal(38,0)) * ${pPpm}) * 1000000)
             | div (cast(n as decimal(38,0)) * ${1000000L - 2 * pPpm})"""
            .stripMargin.replaceAll("\n", " ")))
          .as("est_true_ppm"))
  }

  /** k-anonymity audit over quasi-identifier columns: one row per QI
    * combination with its population and whether it meets the k floor —
    * the standard re-identification risk census a privacy gate runs
    * before a dataset (or its aggregates) leaves the pipeline. One
    * map-side-combined aggregate on the QI key; output is bounded by
    * the QI-combination cardinality, never the row count.
    */
  def kAnonymity(df: DataFrame, qis: Seq[(String, Column)], k: Long): DataFrame = {
    require(qis.nonEmpty && k > 0, "need at least one QI column and k > 0")
    val keyed = qis.map { case (name, c) => c.cast("string").as(name) }
    df.select(keyed: _*)
      .groupBy(qis.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** k-anonymity enforcement by suppression: rows whose QI combination
    * has fewer than `k` members get every QI value replaced by `*` (the
    * generalize-to-top suppression cell), so no released row's QI tuple
    * identifies a group smaller than k. Non-QI columns pass through.
    * Cost: the same QI-keyed census as [[kAnonymity]] joined back onto
    * the rows. With `broadcastCensus` (the default) the below-k group
    * list broadcasts and the data itself never shuffles — right when QI
    * combinations are demographic-sized. For NEAR-UNIQUE QIs the
    * below-k census is almost as large as the data (worst case every
    * row is its own group): pass `broadcastCensus = false` to let the
    * planner pick a keyed join instead of forcing an unbounded
    * broadcast.
    */
  def kSuppress(df: DataFrame, qis: Seq[(String, Column)], k: Long,
                broadcastCensus: Boolean = true): DataFrame = {
    require(qis.forall(q => !df.columns.contains(q._1)),
      "suppressed QI output names must not collide with input columns")
    val small0 = kAnonymity(df, qis, k).where(!col("anonymous"))
      .select(qis.map(q => col(q._1).as(s"__q_${q._1}")): _*)
      .withColumn("__small", lit(1))
    val small = if (broadcastCensus) broadcast(small0) else small0
    val cond = qis.map { case (name, c) =>
      c.cast("string") <=> col(s"__q_$name")
    }.reduce(_ && _)
    val out = qis.map { case (name, c) =>
      when(col("__small").isNotNull, lit("*")).otherwise(c.cast("string")).as(name)
    }
    df.join(small, cond, "left")
      .select(df.columns.map(col).toSeq ++ out: _*)
  }

  /** l-diversity audit, the companion gate to [[kAnonymity]]: a QI
    * equivalence class is safe to release only if it also contains at
    * least `l` DISTINCT values of the sensitive attribute — k-anonymity
    * alone lets an attacker who locates a victim's class read off the
    * sensitive value when the class is homogeneous. Output is the QI
    * census with both counts and the `diverse` verdict per class.
    *
    * Cost: one QI-keyed aggregate; the distinct-count is a two-level
    * partial aggregate (no row-level shuffle beyond the census key), so
    * the data never moves by more than the QI cardinality.
    */
  def lDiversity(df: DataFrame, qis: Seq[(String, Column)],
                 sensitive: Column, l: Long): DataFrame = {
    require(qis.nonEmpty && l > 0, "need at least one QI column and l > 0")
    val keyed = qis.map { case (name, c) => c.cast("string").as(name) } :+
      sensitive.as("__s")
    df.select(keyed: _*)
      .groupBy(qis.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("n"), count_distinct(col("__s")).as("n_sens"))
      .withColumn("diverse", col("n_sens") >= l)
  }

  /** t-closeness audit — the release gate l-diversity can't give: a
    * class may span many sensitive values yet still skew far from the
    * population (e.g. all high balances). Per QI class, the Earth
    * Mover's Distance between the class's distribution over the ORDERED
    * sensitive bands and the global one; for 1-D ordered bands EMD is
    * the mean absolute cumulative-share gap, and cross-multiplying the
    * cumulative counts (|cum_c·N − cum·n_c|) keeps it exact-integer to
    * one final truncating ppm division (DECIMAL(38,0), any scale).
    *
    * Cost shape: the fact table is reduced by two keyed aggregates
    * (global band census, class×band census); everything after runs on
    * the bounded class×band grid (built by a cross join of two
    * post-aggregate tables, zero-filled so absent bands still hold the
    * cumulative line). A single-band corpus has EMD 0 by definition
    * (greatest(B−1, 1) guards the denominator).
    */
  def tCloseness(df: DataFrame, qis: Seq[(String, Column)],
                 sensitiveBand: Column, tPpm: Long): DataFrame = {
    require(qis.nonEmpty && tPpm >= 0, "need at least one QI column and t >= 0")
    val names = qis.map(_._1)
    val base = df.select(qis.map { case (n, c) => c.cast("string").as(n) } :+
      sensitiveBand.cast("long").as("band"): _*)
    val g = base.groupBy("band").agg(count(lit(1)).as("gc"))
      .localCheckpoint(false)
    val tot = g.agg(sum(col("gc")).as("n_total"), count(lit(1)).as("n_bands"))
    val gcum = g.select(col("band"), sum(col("gc"))
      .over(Window.partitionBy(lit(0)).orderBy("band")).as("gcum"))
    val cls = base.groupBy(names.map(col): _*).agg(count(lit(1)).as("n"))
    val cb = base.groupBy(names.map(col) :+ col("band"): _*)
      .agg(count(lit(1)).as("cc"))
    val ccum = cls.crossJoin(gcum)
      .join(cb, names :+ "band", "left")
      .withColumn("ccum", sum(coalesce(col("cc"), lit(0L)))
        .over(Window.partitionBy(names.map(col): _*).orderBy("band")))
    ccum.crossJoin(broadcast(tot))
      .groupBy(names.map(col) :+ col("n") :+ col("n_total") :+ col("n_bands"): _*)
      .agg(sum(abs(col("ccum") * col("n_total") - col("gcum") * col("n")))
        .as("raw"))
      .select(names.map(col) :+ col("n") :+
        // the int64 denominator n·n_total·bands brushes 2^63 at sf100
        // (6e8·6e8·8 ≈ 3e18) — DECIMAL(38,0) product (envelope audit r11)
        expr("CAST(raw AS DECIMAL(38,0)) * 1000000 div " +
          "(CAST(n AS DECIMAL(38,0)) * n_total * greatest(n_bands - 1, 1))").as("emd_ppm"): _*)
      .withColumn("close", col("emd_ppm") <= tPpm)
  }

  /** Per-rule violation census in ONE pass: `(rule, n_viol)`, including
    * rules with zero violations (an explode-and-count would silently
    * drop those — and a clean run is exactly when the audit matters).
    * The scan aggregates to a single row of conditional sums, then
    * stacks; nothing wider than one row per partition shuffles.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val sums = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"v_$i")
    }
    val one = df.agg(count(lit(1)).as("n_rows"), sums: _*)
    // typed melt, same reasoning as profile(): rule names are caller
    // input and must never be spliced into a SQL string
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"v_$i").as("n_viol"))
    }
    one.select(col("n_rows"), explode(array(rows: _*)).as("r"))
      .select(col("r.rule"), col("r.n_viol"), col("n_rows"))
  }

  /** Decile lift / precision-recall table — the model-eval census for a
    * quality or relevance SCORE against a binary label: rank the
    * population by score (descending), cut into B equal-count buckets
    * (the [[Sketches.equidepthHist]] rank rule), and per bucket report
    * positives, cumulative precision/recall in exact ppm, and the lift
    * vs the base rate in exact permille. This is how a curation score
    * gets audited before it gates a corpus: "does the top decile
    * actually concentrate the signal".
    *
    * `scoreInt` must be an integer-encoded score (e.g. quality×10⁴) —
    * integer sort keys are what keep the rank order engine-portable.
    * Ranks come from the range-partitioned [[GlobalRank]]; the only
    * window runs over the B bucket rows. The lift ratio rides
    * DECIMAL(38,0) (n_pos·n_tot·10³ overflows int64 past ~3·10⁹ rows).
    */
  /** Weight-of-evidence / information-value screen for a categorical
    * feature against a binary target — the classic credit-scoring
    * feature audit, run here as a one-pass groupBy plus a broadcast of
    * the two global totals. Per category:
    * `woe_e4 = floor(ln((good_c·B)/(bad_c·G))·10⁴)` (NULL when either
    * side is empty — WOE is undefined there) and the IV contribution
    * `contrib_e10 = (good_c·10⁶ div G − bad_c·10⁶ div B) · woe_e4`,
    * exact int64 throughout (counts·10⁶ and ppm·woe_e4 both fit). A
    * final `__iv__` row carries the totals and ΣIV. The ln() argument
    * is ONE double built from exact int64 products (< 2⁵³, so the
    * doubles are exact), spelled with the same op tree in the DuckDB
    * twin — the [[Experiment]] portability discipline.
    */
  def woeIv(df: DataFrame, category: Column, bad: Column): DataFrame = {
    val per = df.select(category.as("grp"), bad.cast("boolean").as("b"))
      .groupBy(col("grp"))
      .agg(sum(when(!col("b"), 1L).otherwise(0L)).as("n_good"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_bad"))
    val tot = broadcast(per.agg(sum(col("n_good")).as("g_tot"),
      sum(col("n_bad")).as("b_tot")))
    val woe = expr("CAST(floor(ln((CAST(n_good AS DOUBLE) * " +
      "CAST(b_tot AS DOUBLE)) / (CAST(n_bad AS DOUBLE) * " +
      "CAST(g_tot AS DOUBLE))) * 1e4) AS BIGINT)")
    val degenerate = col("n_good") === 0L || col("n_bad") === 0L
    val rows = per.crossJoin(tot).select(col("grp"),
      col("n_good"), col("n_bad"),
      when(degenerate, lit(null).cast("long")).otherwise(woe).as("woe_e4"),
      when(degenerate, lit(0L)).otherwise(
        (expr("n_good * 1000000 div g_tot") -
          expr("n_bad * 1000000 div b_tot")) * woe).as("contrib_e10"))
    rows.unionByName(rows
      .agg(sum(col("n_good")).as("n_good"), sum(col("n_bad")).as("n_bad"),
        sum(col("contrib_e10")).as("contrib_e10"))
      .select(lit("__iv__").as("grp"), col("n_good"), col("n_bad"),
        lit(null).cast("long").as("woe_e4"), col("contrib_e10")))
  }

  /** Reliability (calibration) table for a probability-like score in
    * exact ppm against a binary outcome: equal-WIDTH score bins (the
    * diagram convention — [[liftTable]] is the equal-COUNT dual), per
    * bin the mean predicted ppm, observed positive rate ppm, and the
    * signed gap; a final `bin = −1` row carries N, total positives, and
    * expected calibration error (the n-weighted mean |gap|) in its
    * gap_ppm slot. One groupBy over B+1 rows of state — the score stays
    * an int64 the whole way, so the table is engine-exact.
    */
  def calibration(df: DataFrame, scorePpm: Column, label: Column,
                  bins: Int): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val base = df.select(scorePpm.cast("long").as("p"),
      label.cast("boolean").as("y"))
    val per = base
      .select(least(lit(bins - 1L), expr(s"p * $bins div 1000000")).as("bin"),
        col("p"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("p")).as("__sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("__sp div n").as("avg_score_ppm"),
        expr("n_pos * 1000000 div n").as("pos_ppm"),
        (expr("__sp div n") - expr("n_pos * 1000000 div n")).as("gap_ppm"))
    per.unionByName(per
      .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
        sum(col("n") * abs(col("gap_ppm"))).as("__w"))
      .select(lit(-1L).as("bin"), col("n"), col("n_pos"),
        lit(null).cast("long").as("avg_score_ppm"),
        lit(null).cast("long").as("pos_ppm"),
        expr("__w div n").as("gap_ppm")))
  }

  def liftTable(df: DataFrame, scoreInt: Column, label: Column,
                tieBreak: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val base = df.select(scoreInt.cast("long").as("s"),
      label.cast("boolean").as("pos"), tieBreak.as("t"))
    val ranked = GlobalRank.globalRank(base,
      Seq(col("s").desc, col("t").asc), "grank")
    val tot = broadcast(ranked.agg(count(lit(1)).as("n_tot"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("pos_tot")))
    val dec = ranked.crossJoin(tot)
      .withColumn("bucket", expr(s"(grank - 1) * $buckets div n_tot"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        max(col("n_tot")).as("__nt"), max(col("pos_tot")).as("__pt"))
    // single-partition window is fine HERE: the frame is B bucket rows
    // (constant partition = the declared-bounded marker PlanSpec polices)
    val w = Window.partitionBy(lit(0)).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("__cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("bucket"), col("n"), col("n_pos"), col("cum_pos"),
        expr("1000000L * cum_pos div __cum_n").as("precision_ppm"),
        expr("1000000L * cum_pos div __pt").as("recall_ppm"),
        expr("cast((cast(n_pos as decimal(38,0)) * __nt * 1000) div (n * __pt) as long)")
          .as("lift_pm"))
  }
}
