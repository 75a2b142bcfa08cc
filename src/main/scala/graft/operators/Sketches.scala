package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Bounded sorted buffer of the k smallest DISTINCT long values — the
  * KMV sketch state. Same binary-insert/sorted-merge mechanics as
  * [[TopKAggregator]] but ascending and deduplicating (an equal hash
  * must not occupy a second slot, or duplicates of one value would
  * inflate the distinct estimate).
  */
class KmvAggregator(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, "KMV needs k >= 2")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.size >= k && h >= buf(buf.size - 1)) buf
    else {
      var lo = 0
      var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) < h) lo = mid + 1 else hi = mid
      }
      if (lo < buf.size && buf(lo) == h) buf // already present
      else {
        val (pre, post) = buf.splitAt(lo)
        val out = (pre :+ h) ++ post
        if (out.size > k) out.dropRight(out.size - k) else out
      }
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var n = 0
    var i = 0
    var j = 0
    var last = Long.MinValue
    var first = true
    while (n < k && (i < a.size || j < b.size)) {
      val v = if (j >= b.size || (i < a.size && a(i) <= b(j))) { val x = a(i); i += 1; x }
              else { val x = b(j); j += 1; x }
      if (first || v != last) { out += v; n += 1; last = v; first = false }
    }
    out.result()
  }

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Mergeable bounded-memory summaries: count-min frequency sketch and
  * equi-width histogram quantiles.
  *
  * Both exist for the same 100 TB reason: the exact answer (a groupBy
  * over the item universe / a global sort for percentiles) shuffles data
  * proportional to the INPUT, while the sketch shuffles data proportional
  * to the SKETCH — d×w counters or n_buckets rows — and two sketches
  * union by adding counters, so they compose incrementally across
  * batches, days, and shards.
  *
  * Everything is md5-derived integer arithmetic ([[HashFunctions]]), so
  * the DuckDB oracle replays sketch construction bit-identically.
  */
object Sketches {

  /** Build a count-min sketch over `itemCol`: `(j, h, cnt)` — depth `d`
    * hash rows × width `w` counters. Hash row j maps an item through the
    * shared md5 base hash and the j-th affine map mod `w`. One scan; the
    * explode is ×d (d is 4ish); the groupBy state is at most d·w rows —
    * partial aggregation collapses each partition to the sketch size
    * before anything shuffles.
    */
  def countMin(items: DataFrame, itemCol: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, "count-min needs positive depth and width")
    val coeffs = HashFunctions.minhashCoeffs(d)
    val base = HashFunctions.shingleHash(itemCol)
    val cells = (0 until d).map { j =>
      val (a, b) = coeffs(j)
      struct(lit(j).as("j"), pmod(HashFunctions.affineHash(base, a, b), lit(w.toLong)).as("h"))
    }
    items.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.h").as("h"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a count-min sketch for each distinct value of
    * `itemCol` in `queries`: min over the d row counters the item hashes
    * to (missing cell = 0). Estimates never undercount; overcount is
    * bounded by collisions (≈ 2N/w with probability 1-2^-d). The sketch
    * side is d·w rows — broadcast; the query side never shuffles.
    */
  def cmEstimate(sketch: DataFrame, queries: DataFrame, itemCol: Column,
                 d: Int, w: Int): DataFrame = {
    val coeffs = HashFunctions.minhashCoeffs(d)
    val base = HashFunctions.shingleHash(itemCol)
    val cells = (0 until d).map { j =>
      val (a, b) = coeffs(j)
      struct(lit(j).as("j"), pmod(HashFunctions.affineHash(base, a, b), lit(w.toLong)).as("h"))
    }
    queries.select(itemCol.as("item"), explode(array(cells: _*)).as("c"))
      .join(broadcast(sketch), col("c.j") === sketch("j") && col("c.h") === sketch("h"),
        "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** Per-group KMV (k-minimum-values) distinct-count sketch — the
    * PORTABLE approximate distinct: unlike HLL (whose register layout no
    * other engine replays), the sketch state is the k smallest DISTINCT
    * md5-derived 32-bit hashes per group, so a DuckDB oracle reproduces
    * the estimate bit-for-bit. Estimate: if a group holds fewer than k
    * distinct hashes the answer is exact (the buffer size); otherwise
    * `(k−1)·2³² div (h_k + 1)` — the classic KMV order-statistic
    * estimator (±1/√k relative error), in exact int64 arithmetic
    * (the +1 guards the measure-zero h_k = 0).
    *
    * Scale shape: the aggregation buffer is a bounded sorted Seq (like
    * [[TopKAggregator]], plus within-buffer dedup, which KMV needs and
    * top-K must not do); partial aggregation means each mapper ships at
    * most k longs per group — the input never shuffles, the sketch does.
    * Output: `(as, n_est)`.
    */
  /** The KMV order-statistic estimate from a sketch array column. */
  private[graft] def kmvEstimate(hsName: String, k: Int): Column =
    when(size(col(hsName)) < k, size(col(hsName)).cast("long"))
      .otherwise(expr(s"((${k - 1}L * 4294967296L) div (element_at($hsName, $k) + 1L))"))

  def kmvDistinct(df: DataFrame, group: Column, as: String, value: Column,
                  k: Int, salt: String): DataFrame =
    kmvSketch(df, group, as, value, k, salt)
      .select(col(as), kmvEstimate("hs", k).as("n_est"))

  /** Per-group KMV sketch STATE (the k-smallest distinct hash arrays) —
    * the materialized form a sketch table stores so later queries can
    * answer set questions without rescanning the data.
    */
  def kmvSketch(df: DataFrame, group: Column, as: String, value: Column,
                k: Int, salt: String): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val fn = udaf(new KmvAggregator(k))
    df.select(group.as(as), HashFunctions.hash32(value, salt).as("__h"))
      .groupBy(col(as)).agg(fn(col("__h")).as("hs"))
  }

  /** Sliding-window distinct estimate from per-period KMV states — the
    * bounded-state rolling-MAU shape: the fact stream reduces ONCE to
    * one sketch row per period (k longs each, map-side partials), and
    * every window estimate merges the in-range sketches with pure array
    * ops (flatten → distinct → sort → first k — the union of bottom-k
    * sets re-truncated IS the window union's exact bottom-k, same
    * argument as [[kmvUnion]]). A RANGE frame over the period value
    * keeps calendar semantics with missing periods (a ROWS frame would
    * silently stretch the window across gaps). The window is
    * unpartitioned but runs on the PERIOD-LEVEL table (one row per
    * period — series-sized, the [[TimeSeries]] contract), never the
    * facts; the exact twin at moderate scale is the ×window explode
    * (`q_sliding_distinct`), and this is what replaces it when
    * per-window distinct state stops fitting. Output:
    * (period, n_periods, window_est).
    */
  def kmvSlidingDistinct(df: DataFrame, period: Column, value: Column,
                         windowPeriods: Int, k: Int, salt: String): DataFrame = {
    require(windowPeriods >= 1, "window must be >= 1 periods")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)) // declared-bounded: period-level table
      .orderBy(col("period")).rangeBetween(-(windowPeriods - 1L), 0L)
    kmvSketch(df, period, "period", value, k, salt)
      .select(col("period"),
        count(lit(1)).over(w).as("n_periods"),
        slice(array_sort(array_distinct(flatten(collect_list(col("hs")).over(w)))),
          1, k).as("hs"))
      .select(col("period"), col("n_periods"),
        kmvEstimate("hs", k).as("window_est"))
  }

  /** KMV set algebra: merge per-group sketches into the UNION's distinct
    * estimate — without touching the base data (the point of keeping
    * sketch state). Merging re-feeds the stored hashes through the same
    * bounded aggregator; any hash in the union's true k-minimum set is
    * necessarily in its own group's k-minimum set, so the merged sketch
    * IS the union's sketch, exactly. Output: one row
    * `(n_sketches, union_est)`.
    */
  def kmvUnion(sketches: DataFrame, hsCol: String, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val fn = udaf(new KmvAggregator(k))
    val n = sketches.agg(count(lit(1)).as("n_sketches"))
    val est = sketches.select(explode(col(hsCol)).as("__h"))
      .agg(fn(col("__h")).as("hs"))
      .select(kmvEstimate("hs", k).as("union_est"))
    n.crossJoin(est)
  }

  /** Pairwise Pearson correlation matrix over integer measures in ONE
    * pass: every Σx, Σx², Σxy accumulates in DECIMAL(38,0) (exact to
    * ~10³⁸ — row counts × products of 10¹⁴ never reach it), and the
    * final corr per pair divides the exact integer moments in double
    * where every step (decimal→double cast, multiply, divide, sqrt) is
    * correctly-rounded IEEE, so engines agree bit-for-bit before the
    * round(_, 4). The n²-scaled identity (n·Σxy − Σx·Σy over
    * √((n·Σx²−(Σx)²)(n·Σy²−(Σy)²))) never forms a mean, so there is no
    * float summation anywhere — the q_stats_suite lesson applied to
    * v(v−1)/2 pairs at once.
    *
    * Scale shape: one scan, one partial-aggregated Exchange of a single
    * constant-size row (2v + v(v−1)/2 + 1 decimals), then the pair
    * explode runs on that one row. Output: `(var_a, var_b, corr)`.
    * Zero-variance measures yield NULL corr (the denominator is guarded
    * before the divide — ANSI mode turns 0/0 into an error, not NaN),
    * the conventional undefined-correlation answer.
    */
  def corrMatrix(df: DataFrame, vars: Seq[(String, Column)]): DataFrame = {
    require(vars.size >= 2, "corrMatrix needs at least two measures")
    val names = vars.map(_._1)
    require(names.distinct.size == names.size, "measure names must be unique")
    val d = df.select(vars.map { case (n, c) => c.cast("long").as(n) }: _*)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val aggs =
      names.map(n => sum(dec(col(n))).as(s"s_$n")) ++
      names.map(n => sum(dec(col(n) * col(n))).as(s"ss_$n")) ++
      pairs.map { case (a, b) => sum(dec(col(a) * col(b))).as(s"sp_${a}_$b") }
    val g = d.agg(count(lit(1)).cast("decimal(38,0)").as("n"), aggs: _*)
    def corr(a: String, b: String): Column = {
      val num = (col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")).cast("double")
      val dx = (col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")).cast("double")
      val dy = (col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")).cast("double")
      // guard BEFORE dividing: under ANSI mode x/0.0 raises rather than
      // yielding NaN, and zero variance must mean NULL, not an error
      val den = sqrt(dx * dy)
      when(den > lit(0.0), round(num / den, 4)).otherwise(lit(null).cast("double"))
    }
    g.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("var_a"), lit(b).as("var_b"), corr(a, b).as("corr"))
      }: _*)).as("p"))
      .select(col("p.var_a").as("var_a"), col("p.var_b").as("var_b"),
        col("p.corr").as("corr"))
  }

  /** KMV set algebra, completed: for every PAIR of stored sketches
    * (grp_a < grp_b), the union, intersection, and Jaccard estimates —
    * purely from sketch state, never rescanning the base data. Per
    * pair: M = the k smallest hashes of S_a ∪ S_b (which IS the union's
    * KMV sketch, exactly — see [[kmvUnion]]); c = |M ∩ S_a ∩ S_b|
    * counts M's members seen by BOTH sides; then Jaccard ≈ c/|M| (the
    * classic KMV ratio estimator) and ∩-est = c·union_est div |M|, all
    * in exact int64 (ppm for the ratio). When the union holds fewer
    * than k distinct hashes every number is EXACT — M is the whole
    * union — and the same formulas degrade to exact counts.
    *
    * The pair join is over the SKETCH table (one row per group,
    * ≤ k longs each), so its cost is groups²·k — independent of data
    * size; that is the point of sketch algebra at 100 TB: answer every
    * pairwise set question from per-partition state built in one pass.
    * Output: `(grp_a, grp_b, union_est, intersect_est, jaccard_ppm)`.
    */
  def kmvIntersect(sketches: DataFrame, as: String, hsCol: String,
                   k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val a = sketches.select(col(as).as("grp_a"), col(hsCol).as("hs_a"))
    val b = sketches.select(col(as).as("grp_b"), col(hsCol).as("hs_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("m", slice(array_sort(array_union(col("hs_a"), col("hs_b"))), 1, k))
      .withColumn("kk", size(col("m")).cast("long"))
      .withColumn("c", size(array_intersect(col("m"),
        array_intersect(col("hs_a"), col("hs_b")))).cast("long"))
      .withColumn("union_est", when(col("kk") < k, col("kk"))
        .otherwise(expr(s"((${k - 1}L * 4294967296L) div (element_at(m, $k) + 1L))")))
      .select(col("grp_a"), col("grp_b"), col("union_est"),
        expr("(c * union_est) div kk").as("intersect_est"),
        expr("(c * 1000000L) div kk").as("jaccard_ppm"))
  }

  /** KMV set algebra, final piece: the DIFFERENCE estimates. For every
    * pair of stored sketches the union's bottom-k M partitions into
    * a-only / b-only / both — every membership decision is EXACT (any
    * h ∈ M that hashes an element of A is necessarily in A's own
    * bottom-k: fewer than k union hashes sit below it, so fewer than k
    * of A's do), so the three disjoint counts scale by the union
    * estimate into `|A\B|`, `|B\A|`, `|A∩B|`. Under k everything
    * degrades to exact counts, and the three parts always sum to
    * union_est up to the two integer floors.
    *
    * Same groups²·k sketch-table join as [[kmvIntersect]] — the scan
    * that built the sketches is never repaid. Output:
    * `(grp_a, grp_b, union_est, a_only_est, b_only_est, intersect_est)`.
    */
  def kmvDiff(sketches: DataFrame, as: String, hsCol: String,
              k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val a = sketches.select(col(as).as("grp_a"), col(hsCol).as("hs_a"))
    val b = sketches.select(col(as).as("grp_b"), col(hsCol).as("hs_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("m", slice(array_sort(array_union(col("hs_a"), col("hs_b"))), 1, k))
      .withColumn("kk", size(col("m")).cast("long"))
      .withColumn("c_both", size(array_intersect(col("m"),
        array_intersect(col("hs_a"), col("hs_b")))).cast("long"))
      .withColumn("c_a", size(array_intersect(col("m"), col("hs_a"))).cast("long"))
      .withColumn("c_b", size(array_intersect(col("m"), col("hs_b"))).cast("long"))
      .withColumn("union_est", when(col("kk") < k, col("kk"))
        .otherwise(expr(s"((${k - 1}L * 4294967296L) div (element_at(m, $k) + 1L))")))
      .select(col("grp_a"), col("grp_b"), col("union_est"),
        expr("((c_a - c_both) * union_est) div kk").as("a_only_est"),
        expr("((c_b - c_both) * union_est) div kk").as("b_only_est"),
        expr("(c_both * union_est) div kk").as("intersect_est"))
  }

  /** Percentile estimates from an equi-width histogram over a LONG
    * measure: bucket counts in one scan (groupBy on the floor-div
    * bucket, sketch-sized state), then for each p in `ps` the estimate
    * is the lower edge of the first bucket whose cumulative count
    * reaches `ceil(p·N/100)`. Error is bounded by the bucket width; the
    * cumulative window runs over the tiny bucket table, never the data.
    * Output: `(p, est)`.
    *
    * Bucketing uses FLOOR division, not Spark's truncate-toward-zero
    * `div`: for negative measures `div` would collapse everything in
    * (-width, 0) into bucket 0, breaking both the ≤width error bound
    * and parity with engines whose `//` floors (e.g. DuckDB).
    * `(v - pmod(v, w)) div w` is exact int64 floor division.
    */
  def histogramQuantiles(df: DataFrame, value: Column, width: Long,
                         ps: Seq[Int]): DataFrame = {
    require(width > 0 && ps.nonEmpty, "need a positive width and at least one percentile")
    import org.apache.spark.sql.expressions.Window
    val buckets = df.select(value.cast("long").as("v"))
      .select(expr(s"(v - pmod(v, ${width}L)) div ${width}L").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    // single-partition window is fine HERE: the frame is n_buckets rows
    // (constant partition = the repo's declared-bounded marker, policed
    // by PlanSpec's global-window budget)
    val cum = buckets.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(lit(0)).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_total", sum(col("cnt")).over(Window.partitionBy(lit(0))))
    val pdf = df.sparkSession.createDataFrame(
      ps.map(p => Tuple1(p.toLong))).toDF("p")
    cum.join(broadcast(pdf),
        col("cum") * lit(100L) >= col("p") * col("n_total"))
      .groupBy(col("p"))
      .agg((min(col("b")) * lit(width)).as("est"))
  }

  /** Higher-moment statistics per group: skewness and excess kurtosis
    * about the INTEGER floor mean μ = Σx div n — the documented center
    * (the O(1/n) offset vs the exact mean is irrelevant for a shape
    * census, and an integer center is what keeps the centered power
    * sums EXACT). Two passes: the tiny (group, n, μ) table joins back
    * and the centered sums Σd², Σd³, Σd⁴ accumulate in DECIMAL(38,0)
    * (d ≤ 4·10⁷ cents ⇒ Σd⁴ ≲ 10³⁶ at SF 0.1 — inside exact range;
    * past ~10³⁸ the sums null out loudly rather than wrap).
    *
    * The final skew/kurt are ONE fixed-order double formula over those
    * exact sums, using only correctly-rounded IEEE ops (÷, ×, sqrt —
    * deliberately no pow(), whose libm last-ulp differences would break
    * cross-engine hashing), rounded to 4dp like the cosine family.
    */
  def higherMoments(df: DataFrame, group: Column, as: String,
                    value: Column): DataFrame = {
    val base = df.select(group.as(as), value.cast("long").as("__wmv"))
    val mu = base.groupBy(col(as))
      .agg(count(lit(1)).as("n"), sum(col("__wmv")).as("__s1"))
      .select(col(as), col("n"), expr("__s1 div n").as("mu"))
    base.join(mu, as)
      .withColumn("__d", col("__wmv") - col("mu"))
      .groupBy(col(as))
      .agg(max(col("n")).as("n"), max(col("mu")).as("mu"),
        sum(expr("cast(__d as decimal(38,0)) * __d")).as("__t2"),
        sum(expr("cast(__d as decimal(38,0)) * __d * __d")).as("__t3"),
        sum(expr("cast(__d as decimal(38,0)) * __d * __d * __d")).as("__t4"))
      .select(col(as), col("n"), col("mu"),
        // degenerate groups (single row, or constant value ⇒ t2 = 0)
        // have no defined shape: emit NULL explicitly — the raw formula
        // would produce 0/0 = NaN, whose rendering differs across
        // engines and would break oracle parity
        expr("case when n < 2 or __t2 = 0 then cast(null as double) else " +
          "round((cast(__t3 as double) / n) / " +
          "((cast(__t2 as double) / n) * sqrt(cast(__t2 as double) / n)), 4) end")
          .as("skewness"),
        expr("case when n < 2 or __t2 = 0 then cast(null as double) else " +
          "round((cast(__t4 as double) / n) / " +
          "((cast(__t2 as double) / n) * (cast(__t2 as double) / n)) - 3.0, 4) end")
          .as("kurtosis"))
  }

  /** Exact weighted (lower) median per group: the smallest value whose
    * cumulative weight reaches half the group's total — the
    * quantity-weighted "typical price" that a row-median misstates
    * whenever weights skew. All integer arithmetic
    * (`2·cum ≥ total` avoids any halving division).
    *
    * Scale shape: groups here are FEW and HUGE (years), so a
    * per-group ORDER BY window would put each year in one partition —
    * the trap. Instead the running weight comes from the global
    * two-pass [[GlobalRank.globalCumsum]] over (group, value, tie),
    * and per-group cumulatives are recovered by subtracting each
    * group's starting offset (a window over the GROUP-COUNT-sized
    * totals table — bounded, like histogramQuantiles' bucket window).
    * `tieBreak` must complete a total order.
    */
  def weightedMedian(df: DataFrame, group: Column, as: String, value: Column,
                     weight: Column, tieBreak: Column): DataFrame = {
    val base = df.select(group.as(as), value.cast("long").as("__wmv"),
      weight.cast("long").as("__w"), tieBreak.as("__t"))
    val cum = GlobalRank.globalCumsum(base,
      Seq(col(as).asc, col("__wmv").asc, col("__t").asc), col("__w"), "__gcum")
    val tot = base.groupBy(col(as)).agg(sum(col("__w")).as("__totw"))
      .withColumn("__off", coalesce(
        sum(col("__totw")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0)) // declared-bounded: group-count rows
          .orderBy(col(as).asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    cum.join(broadcast(tot), as)
      .where((col("__gcum") - col("__off")) * 2 >= col("__totw"))
      .groupBy(col(as))
      .agg(max(col("__totw")).as("total_weight"),
        min(col("__wmv")).as("wmedian"))
  }

  /** Equi-depth histogram: B buckets of (as near as possible) EQUAL row
    * count, each reporting its exact [lo, hi] value range — the
    * histogram an optimizer or profiler actually wants for skewed
    * measures, where [[histogramQuantiles]]' fixed-width buckets put
    * 99% of the mass in one bar. Bucket of rank r (1-based) is
    * `(r−1)·B div N`, so bucket sizes differ by at most one row,
    * exactly — no sampled boundaries.
    *
    * Ranks come from [[GlobalRank.globalRank]] (range-partition + tiny
    * per-partition offsets), NOT a global single-partition window — the
    * whole point of an equi-depth profile is that it gets run on the
    * tables too big for anything else. `tieBreak` must make the order
    * total or bucket membership at value boundaries is nondeterministic.
    * One range shuffle + one B-row aggregate.
    */
  def equidepthHist(df: DataFrame, value: Column, tieBreak: Column,
                    buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val base = df.select(value.cast("long").as("v"), tieBreak.as("t"))
    val ranked = GlobalRank.globalRank(base, Seq(col("v").asc, col("t").asc))
    val n = ranked.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket", expr(s"(grank - 1) * $buckets div n_total"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

  /** Poisson(1) CDF thresholds scaled to the affine-hash space
    * [0, MinhashP), shared verbatim by the Spark staircase and the
    * generated oracle SQL (one JVM computation, inlined into both —
    * nothing cross-engine). Truncated at k=9 (tail mass ~1e-6 collapses
    * into the last step).
    */
  private[graft] val PoissonThresholds: Seq[Long] = {
    val e = math.exp(-1.0)
    val cum = (0 to 8).scanLeft(0.0) { (acc, k) =>
      acc + e / (1 to k).foldLeft(1.0)(_ * _)
    }.drop(1)
    cum.map(c => math.floor(c * HashFunctions.MinhashP).toLong)
  }

  private def poissonWeight(h: Column): Column =
    PoissonThresholds.zipWithIndex.foldRight(lit(PoissonThresholds.length.toLong)) {
      case ((t, k), rest) => when(h < t, lit(k.toLong)).otherwise(rest)
    }

  /** Poisson bootstrap (the distributed bootstrap — Chamandy et al.):
    * replicate b reweights every row by an independent Poisson(1) draw,
    * approximating resampling-with-replacement without ever
    * materializing a resample. Draws are salted-hash lookups into the
    * Poisson CDF — deterministic, engine-portable, and independent
    * across replicates by the salt. Each replicate's mean is exact
    * int64 (`Σw·x div Σw`); the spread of the B means IS the sampling
    * distribution of the mean, read CIs off its quantiles.
    *
    * Scale: one map-side ×B explode (no shuffle grows), aggregate state
    * = B rows; ONE md5 per row — the per-replicate draws are cheap
    * affine maps over the base hash (the MinHash-family trick, which
    * also keeps the projection inside janino's codegen method limits —
    * B chained md5s did not). Returns `(rep, n_eff, mean_cents)` × B.
    */
  def poissonBootstrap(df: DataFrame, key: Column, value: Column,
                       b: Int, salt: String): DataFrame = {
    require(b >= 2)
    // explode the bare replicate index FIRST and derive the affine
    // coefficients arithmetically from it (the same formulas as
    // HashFunctions.minhashCoeffs, which the oracle inlines) — a
    // 32-struct array with a staircase per struct is ONE giant
    // expression that falls out of whole-stage codegen (measured: the
    // whole stage ran interpreted); this shape keeps every projection
    // small and codegen'd, with a single 10-branch staircase per
    // (row, replicate)
    val p = HashFunctions.MinhashP
    df.select(value.cast("long").as("__x"),
        HashFunctions.shingleHash(
          concat(lit(salt + ":"), key.cast("string"))).as("__h"))
      .select(col("__x"), col("__h"),
        explode(sequence(lit(0L), lit((b - 1).toLong))).as("rep"))
      .withColumn("__hr", pmod(
        col("__h") * pmod(lit(2654435761L) * (col("rep") + 1L) + 101L, lit(p))
          + pmod(lit(40503L) * (col("rep") + 1L) + 7919L, lit(p)), lit(p)))
      .withColumn("__w", poissonWeight(col("__hr")))
      .groupBy(col("rep"))
      .agg(sum(col("__w")).as("n_eff"),
        sum(col("__w") * col("__x")).as("__wx"))
      .select(col("rep"), col("n_eff"),
        expr("__wx div n_eff").as("mean_cents"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic, exact: the max CDF gap
    * between groups A and B over an integer-valued measure,
    * `KS = max_v |F_A(v) − F_B(v)|`, computed as pure int64
    * `|cumA·nB − cumB·nA| · 1e6 div (nA·nB)` — the standard
    * distribution-drift gate between two cohorts/batches with no
    * doubles anywhere. One per-value aggregate (both group counts in
    * one pass), one distributed [[GlobalRank.globalCumsum]]-shaped
    * two-phase cumsum over the distinct values for EACH group's counts
    * (never a single-partition window), one final max. Returns one row
    * `(n_a, n_b, ks_ppm)`. Exactness bound: the ppm scaling needs
    * `n_a·n_b < 9.2·10¹²` (≈3M×3M rows) — beyond that pre-aggregate
    * values into buckets; the statistic is distributional, so bucketing
    * at measurement resolution costs nothing.
    */
  def ksTest(df: DataFrame, group: Column, aLabel: String,
             value: Column): DataFrame = {
    // NB: globalCumsum reserves "__v" internally — keep clear of it.
    // NULL group labels belong to neither cohort: drop them EXPLICITLY
    // (they'd otherwise vanish into two false when() branches), and an
    // empty cohort raises instead of returning a null statistic.
    val perV = df.select(group.as("__g"), value.cast("long").as("__ksv"))
      .where(col("__g").isNotNull)
      .groupBy(col("__ksv"))
      .agg(sum(when(col("__g") === aLabel, 1L).otherwise(0L)).as("__na"),
        sum(when(col("__g") =!= aLabel, 1L).otherwise(0L)).as("__nb"))
    val cumA = GlobalRank.globalCumsum(perV, Seq(col("__ksv").asc), col("__na"), "cum_a")
    val cum = GlobalRank.globalCumsum(cumA, Seq(col("__ksv").asc), col("__nb"), "cum_b")
    val tot = cum.agg(sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")).as("__d"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__d")).as("__dmax"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0,
          raise_error(lit("ksTest: both cohorts must be non-empty " +
            "(after dropping NULL group labels)")))
          // __dmax ≤ n_a·n_b ~ 5e15 at sf100 cohorts — fine in int64 —
          // but ×1e6 wraps, so the scale-up rides DECIMAL(38,0)
          // (envelope audit r11; DuckDB twin is HUGEINT natively)
          .otherwise(expr("CAST(CAST(__dmax AS DECIMAL(38,0)) * 1000000 " +
            "div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")).as("ks_ppm"))
  }

  /** Mann–Whitney U / exact AUC between two groups: `U/(n_A·n_B)` is
    * P(a > b) + ½·P(a = b) — the probability a random A-row outranks a
    * random B-row, i.e. the AUC of the measure as a classifier of the
    * group label, and the standard nonparametric effect size next to
    * [[ksTest]]'s drift gate. Ties use midranks; DOUBLED ranks keep
    * everything int64 (`2·midrank = 2·start + c − 1`), so the result is
    * exact: `auc_ppm = (2·R_A − n_A(n_A+1)) · 1e6 div (2·n_A·n_B)`.
    * Same distributed shape as [[ksTest]]: one per-value aggregate, one
    * two-phase cumsum, one final sum. Returns
    * `(n_a, n_b, u2, auc_ppm)` (`u2` = 2·U_A).
    */
  def mannWhitney(df: DataFrame, group: Column, aLabel: String,
                  value: Column): DataFrame = {
    // NULL group labels dropped explicitly; empty cohort raises (same
    // contract as [[ksTest]])
    val perV = df.select(group.as("__g"), value.cast("long").as("__mwv"))
      .where(col("__g").isNotNull)
      .groupBy(col("__mwv"))
      .agg(sum(when(col("__g") === aLabel, 1L).otherwise(0L)).as("__na"),
        sum(when(col("__g") =!= aLabel, 1L).otherwise(0L)).as("__nb"))
      .withColumn("__c", col("__na") + col("__nb"))
    val cum = GlobalRank.globalCumsum(perV, Seq(col("__mwv").asc), col("__c"), "cum_c")
    // ranks of the c tied rows at v start at cum_c − c + 1; doubled
    // midrank = 2·start + c − 1 = 2·cum_c − c + 1
    val tot = cum.agg(sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"))
    cum.select((col("__na") * (lit(2L) * col("cum_c") - col("__c") + 1L)).as("__r2"))
      .agg(sum(col("__r2")).as("r2a"))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        (col("r2a") - col("n_a") * (col("n_a") + 1L)).as("u2"))
      .select(col("n_a"), col("n_b"), col("u2"),
        when(col("n_a") === 0 || col("n_b") === 0,
          raise_error(lit("mannWhitney: both cohorts must be non-empty " +
            "(after dropping NULL group labels)")))
          // u2 ≤ 2·n_a·n_b fits int64 at sf100; u2×1e6 does not —
          // DECIMAL(38,0) scale-up (envelope audit r11)
          .otherwise(expr("CAST(CAST(u2 AS DECIMAL(38,0)) * 1000000 " +
            "div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")).as("auc_ppm"))
  }

  /** Two-sample chi-squared drift statistic between a reference and a
    * current snapshot over a shared bucketing, exact-rational: with
    * per-bucket counts (O_r, O_c) and totals (T_r, T_c), the pooled
    * two-sample statistic is
    * `χ² = Σ_b (T_c·O_r − T_r·O_c)² / ((O_r+O_c)·T_r·T_c)` — the
    * algebraic form of the textbook Σ(O−E)²/E over both snapshots with
    * the √(T_c/T_r) scaling multiplied through, so every intermediate
    * is an integer and the only division is the final ppm floor
    * (DECIMAL(38,0) for the square: (T_c·O_r)² overflows int64 past
    * ~3M×3M rows; exact to ~10¹⁹×10¹⁹ in decimal). The standard
    * schema-level drift gate next to [[ksTest]] (which needs an
    * ordered measure; χ² works on any bucketing, categorical
    * included). Callers pass the bucket EXPRESSION — `v div width`
    * for fixed-width numeric bucketing, the column itself for
    * categorical drift. Distributed shape: two per-bucket partial
    * aggregates (bucket-count rows only — never the payload), one
    * full-outer bucket join, one broadcast of the two totals. Buckets
    * absent from one snapshot count 0 there (maximal drift
    * contribution), so new/vanished categories are flagged, not
    * dropped. Returns one row per bucket
    * `(bucket, n_ref, n_cur, contrib_ppm)`; `Σ contrib_ppm / 1e6` is
    * the χ² statistic (df = buckets − 1). Both snapshots must be
    * non-empty (raises otherwise).
    */
  def chi2Drift(ref: DataFrame, cur: DataFrame, bucket: Column): DataFrame = {
    // bucket keeps its own type — a cast("long") here would ANSI-throw
    // on categorical (string) bucketing, which this gate explicitly
    // supports (caught by the streaming-guard spec)
    val r = ref.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_cur"))
    val j = r.join(c, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = j.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    j.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        when(col("t_ref") === 0 || col("t_cur") === 0,
          raise_error(lit("chi2Drift: both snapshots must be non-empty")))
          .otherwise(expr(
            "CAST(t_cur*n_ref - t_ref*n_cur AS DECIMAL(38,0)) " +
              "* CAST(t_cur*n_ref - t_ref*n_cur AS DECIMAL(38,0)) " +
              "* 1000000 div (CAST((n_ref + n_cur) AS DECIMAL(38,0)) " +
              "* t_ref * t_cur)").cast("long"))
          .as("contrib_ppm"))
  }

  /** Jensen–Shannon divergence drift gate between two snapshots over a
    * shared (categorical or bucketed) measure — the bounded, symmetric
    * companion to [[chi2Drift]] and the statistic LLM-corpus mix
    * monitoring actually tracks (JSD of the source/domain distribution
    * between two crawl snapshots). With per-bucket counts (a, b) and
    * totals (A, B): P=a/A, Q=b/B, M=(P+Q)/2 and
    * `JSD = ½·KL(P‖M) + ½·KL(Q‖M)`, where each per-bucket log ratio
    * reduces to an INTEGER ratio: P/M = 2aB/(aB+bA), Q/M = 2bA/(aB+bA).
    *
    * Engine-portable fixed point, the [[TextOps.pmi]] discipline: the
    * float surfaces ONLY inside `round(ln(int-ratio)·10⁴)` — everything
    * before (count products) and after (weighted sums, the final ppm
    * floors) is exact integer arithmetic, and every division has a
    * non-negative numerator (KL ≥ 0; sums are clamped at 0 because a
    * sub-rounding-resolution drift, < 0.5·10⁻⁴ nats, may round
    * fractionally negative). Buckets absent from one snapshot
    * contribute their full mass to the OTHER side's KL term via M —
    * JSD never divides by zero, the reason it's the right gate for
    * vanishing/appearing categories.
    *
    * Distributed shape: identical to chi2Drift — two per-bucket partial
    * aggregates, one full-outer bucket join, one 2-column broadcast of
    * the totals, then a single global reduce. Returns ONE row:
    * (n_buckets, t_ref, t_cur, kl_pm_e10, kl_qm_e10, jsd_e10) — nats
    * ×10¹⁰; jsd_e10/10¹⁰ ∈ [0, ln 2]. Int64-safe to ~10¹²-row
    * snapshots (|Σ a·ln_e4| ≤ A·14·10⁴; the ×10⁶ ppm step runs in
    * DECIMAL(38,0)).
    */
  def jsdDrift(ref: DataFrame, cur: DataFrame, bucket: Column): DataFrame = {
    val r = ref.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_cur"))
    val j = r.join(c, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = j.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val terms = j.crossJoin(broadcast(tot))
      .select(col("t_ref"), col("t_cur"),
        when(col("t_ref") === 0 || col("t_cur") === 0,
          raise_error(lit("jsdDrift: both snapshots must be non-empty")))
          .otherwise(when(col("n_ref") > 0, expr(
            "n_ref * CAST(round(ln(CAST(2*n_ref*t_cur AS DOUBLE) " +
              "/ CAST(n_ref*t_cur + n_cur*t_ref AS DOUBLE)) * 10000) AS BIGINT)"))
            .otherwise(lit(0L))).as("p_term"),
        when(col("n_cur") > 0, expr(
          "n_cur * CAST(round(ln(CAST(2*n_cur*t_ref AS DOUBLE) " +
            "/ CAST(n_ref*t_cur + n_cur*t_ref AS DOUBLE)) * 10000) AS BIGINT)"))
          .otherwise(lit(0L)).as("q_term"))
    terms
      .groupBy(col("t_ref"), col("t_cur"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("p_term")).as("sp"), sum(col("q_term")).as("sq"))
      .select(col("n_buckets"), col("t_ref"), col("t_cur"),
        expr("CAST(CAST(greatest(0L, sp) AS DECIMAL(38,0)) * 1000000 " +
          "div t_ref AS BIGINT)").as("kl_pm_e10"),
        expr("CAST(CAST(greatest(0L, sq) AS DECIMAL(38,0)) * 1000000 " +
          "div t_cur AS BIGINT)").as("kl_qm_e10"),
        expr("(CAST(CAST(greatest(0L, sp) AS DECIMAL(38,0)) * 1000000 " +
          "div t_ref AS BIGINT) " +
          "+ CAST(CAST(greatest(0L, sq) AS DECIMAL(38,0)) * 1000000 " +
          "div t_cur AS BIGINT)) div 2").as("jsd_e10"))
  }

  /** Gini concentration coefficient over a per-key measure, exact:
    * G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with xᵢ ascending — the
    * inequality KPI for spend/traffic/token-count concentration.
    * Ranks come from the distributed [[GlobalRank]] (range partition +
    * offsets, never a single-partition window); ties carry equal x so
    * any tie order yields the same sums. All sums are int64; the single
    * final division is IEEE and identical in both engines, floored to
    * ppm. Returns one row: (n, total, gini_ppm).
    */
  def gini(df: DataFrame, key: Column, value: Column): DataFrame = {
    val ranked = GlobalRank.globalRank(
      df.select(key.as("__k"), value.cast("long").as("__x")),
      Seq(col("__x").asc, col("__k").asc))
    // DECIMAL(38,0) moments: Σ rank·x reaches n·total ≈ 5.6e18 at sf1
    // and wraps int64 at sf10 (as does the n·total denominator) — the
    // decimal sums stay exact and the ONE double divide at the end is
    // value-identical wherever the long path fit (r10 envelope audit)
    ranked.agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        sum(col("grank").cast("decimal(38,0)") * col("__x")).as("__s1"))
      .select(col("n"), col("total"),
        floor(lit(1000000.0) *
          ((lit(2L) * col("__s1") - (col("n") + 1) * col("total").cast("decimal(38,0)")).cast("double")
            / (col("n") * col("total").cast("decimal(38,0)")).cast("double")))
          .cast("long").as("gini_ppm"))
  }

  /** Per-group Shannon entropy of a categorical column, exact-portable:
    * H = Σ_c n_c·round(ln(N/n_c)·10⁴) div N — each class's log term is
    * rounded to integer e4 AT THE CLASS (IEEE ln of a rational of two
    * int64s, identical in any engine), then the weighted sum is pure
    * integer arithmetic — partition-order free. Evenness normalizes by
    * the uniform bound ln(k): 10⁶ ppm = perfectly mixed, small = one
    * class dominates; single-class groups emit evenness 0. The
    * diversity gate for corpus mix monitoring (language share per
    * source, event mix per cohort) — Gini's categorical sibling.
    * Two stacked partial aggregates, nothing bigger than (group×class).
    */
  def entropy(df: DataFrame, group: Column, category: Column): DataFrame = {
    val per = df.select(group.as("grp"), category.as("c"))
      .groupBy(col("grp"), col("c")).agg(count(lit(1)).as("n_c"))
      // class-count window per group: (group×class)-sized input only
      .withColumn("N", sum(col("n_c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))))
    per.groupBy(col("grp")).agg(count(lit(1)).as("n_classes"),
        max(col("N")).as("n"),
        sum(col("n_c") *
          expr("cast(round(ln(cast(N as double) / cast(n_c as double)) " +
            "* 1e4, 0) as long)")).as("h_num"))
      .select(col("grp"), col("n"), col("n_classes"),
        expr("h_num div n").as("entropy_e4"),
        when(col("n_classes") > 1,
          expr("(h_num div n) * 1000000L div " +
            "cast(round(ln(cast(n_classes as double)) * 1e4, 0) as long)"))
          .otherwise(0L).as("evenness_ppm"))
  }

  /** Cramér's V — the [0, 1]-normalized association strength companion
    * to [[mutualInfo]]. Uses the zero-cell-free identity
    * `χ² = N·(Σ_observed n_xy²/(n_x·n_y) − 1)` so no (x × y) grid is
    * ever materialized (absent cells contribute nothing to the sum):
    * per-cell terms are exact truncating e12 integers riding
    * DECIMAL(38,0), χ² lands in exact e6, and only the final
    * `V = √(χ²/(N·(min(r,c)−1)))` is IEEE (one shared expression,
    * floor-ppm). Degenerate tables (single row/col class) emit V = 0.
    */
  def cramersV(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.select(x.as("x"), y.as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
    val nx = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val ny = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val s = cells.join(broadcast(nx), "x").join(broadcast(ny), "y")
      .agg(sum(expr("cast(cast(n_xy as decimal(38,0)) * n_xy * " +
        "1000000000000 div (cast(n_x as decimal(38,0)) * n_y) " +
        "as decimal(38,0))")).as("s_e12"))
    val shape = cells.agg(sum(col("n_xy")).as("n"),
      count_distinct(col("x")).as("r"), count_distinct(col("y")).as("c"))
    shape.crossJoin(broadcast(s))
      .select(col("n"), col("r"), col("c"),
        expr("cast(cast(n as decimal(38,0)) * (s_e12 - 1000000000000) " +
          "div 1000000 as bigint)").as("chi2_e6"))
      .select(col("n"), col("r"), col("c"), col("chi2_e6"),
        when(col("chi2_e6") <= 0L || least(col("r"), col("c")) <= 1L, lit(0L))
          .otherwise(expr("cast(floor(sqrt((cast(chi2_e6 as double) / 1e6)" +
            " / (cast(n as double) * (least(r, c) - 1))) * 1e6) as bigint)"))
          .as("v_ppm"))
  }

  /** Wald–Wolfowitz runs test over a BOUNDED ordered binary series —
    * the randomness audit that catches serial correlation neither
    * Benford nor SRM can see (a metronome alternation and a long block
    * both have balanced counts; their RUN counts give them away).
    * Exact integers for (n, n1, n0, runs); z floor-scaled e6 from one
    * IEEE expression over those integers, spelled identically in the
    * twin; degenerate series (single-class or n < 2) yield NULL. The
    * lag window runs on the PERIOD series (bounded by contract — the
    * caller aggregates facts to periods first), carried on the
    * declared-bounded `partitionBy(lit(0))` marker.
    */
  def runsTest(series: DataFrame, key: Column, flag: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)) // declared bounded: one row per period
      .orderBy(col("__k").asc)
    series.select(key.as("__k"), flag.cast("boolean").as("__b"))
      .withColumn("__p", lag(col("__b"), 1).over(w))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("__b"), 1L).otherwise(0L)).as("n0"),
        sum(when(col("__p").isNull || col("__p") =!= col("__b"), 1L)
          .otherwise(0L)).as("runs"))
      .select(col("n"), col("n1"), col("n0"), col("runs"),
        expr("case when n1 = 0 or n0 = 0 or n < 2 then cast(null as bigint)" +
          " else cast(floor((cast(runs as double) - " +
          "(cast(2 * n1 * n0 as double) / n + 1)) / " +
          "sqrt(cast(2 * n1 * n0 as double) * (2 * n1 * n0 - n) / " +
          "(cast(n as double) * n * (n - 1))) * 1e6) as bigint) end")
          .as("z_e6"))
  }

  /** Population stability index between a reference and current
    * snapshot over a shared integer bucketing — the credit-risk drift
    * gate (PSI < 0.1 stable, > 0.2 action), completing the drift family
    * (χ² = q_drift_chi2, JSD = q_jsd_drift, KS = q_ks_test). Laplace
    * +1 smoothing makes one-sided buckets finite. Per bucket:
    * `term_e10 = (p_ppm − q_ppm) · round(ln((nᵣ+1)(N_c+B) /
    * (n_c+1)(N_r+B))·10⁴)` — exact smoothed-ppm shares, ONE double per
    * ln from exact int64 products; a `__psi__` summary row carries the
    * totals and ΣPSI. Shape: two bucket aggregates + one broadcast
    * combine — the bucket table is the only exchanged state.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, bucket: Column): DataFrame = {
    def cnt(df: DataFrame, as: String) =
      df.select(bucket.cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val per = cnt(ref, "n_ref").join(cnt(cur, "n_cur"), Seq("bucket"), "full")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = broadcast(per.agg(sum(col("n_ref")).as("nr"),
      sum(col("n_cur")).as("nc"), count(lit(1)).as("b")))
    val rows = per.crossJoin(tot).select(col("bucket"), col("n_ref"),
      col("n_cur"),
      (expr("(n_ref + 1) * 1000000 div (nr + b)") -
        expr("(n_cur + 1) * 1000000 div (nc + b)")).as("__d"),
      expr("cast(round(ln(cast((n_ref + 1) * (nc + b) as double) / " +
        "cast((n_cur + 1) * (nr + b) as double)) * 1e4, 0) as long)").as("__l"))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        (col("__d") * col("__l")).as("term_e10"))
    rows.unionByName(rows
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"),
        sum(col("term_e10")).as("term_e10"))
      .select(lit(-1L).as("bucket"), col("n_ref"), col("n_cur"),
        col("term_e10")))
  }

  /** Mutual information between two categorical columns — the
    * association screen behind feature selection and leakage hunts
    * (`MI ≈ 0` ⇒ independent; `MI ≈ min(H_x, H_y)` ⇒ one determines the
    * other). Same integer discipline as [[entropy]]: each cell
    * contributes `n_xy · round(ln((n_xy·N)/(n_x·n_y))·10⁴)` — one
    * double from exact int64 products (< 2⁵³), so the total is an exact
    * integer sum; the final `div n` truncates toward zero identically
    * in both engines (verified on negatives, which near-zero MI can
    * produce through rounding). Output one row:
    * `(n, n_cells, h_x_e4, h_y_e4, mi_e4, nmi_ppm)` with
    * `nmi_ppm = mi·10⁶ div min(H_x, H_y)` (0 when a marginal is
    * constant). Shape: one (x, y) aggregate, two marginal re-aggregates
    * of the CELL table (never the data), one broadcast combine.
    */
  def mutualInfo(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.select(x.as("x"), y.as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
    val nx = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val ny = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val n = cells.agg(sum(col("n_xy")).as("n"),
      count(lit(1)).as("n_cells"))
    def hNum(marg: DataFrame, c: String): DataFrame =
      marg.crossJoin(broadcast(n.select(col("n"))))
        .agg(sum(col(s"n_$c") *
          expr(s"cast(round(ln(cast(n as double) / cast(n_$c as double))" +
            " * 1e4, 0) as long)")).as(s"h${c}_num"))
    val mi = cells.join(broadcast(nx), "x").join(broadcast(ny), "y")
      .crossJoin(broadcast(n.select(col("n"))))
      .agg(sum(col("n_xy") *
        expr("cast(round(ln(cast(n_xy * n as double) / " +
          "cast(n_x * n_y as double)) * 1e4, 0) as long)")).as("mi_num"))
    n.crossJoin(broadcast(hNum(nx, "x"))).crossJoin(broadcast(hNum(ny, "y")))
      .crossJoin(broadcast(mi))
      .select(col("n"), col("n_cells"),
        expr("hx_num div n").as("h_x_e4"), expr("hy_num div n").as("h_y_e4"),
        expr("mi_num div n").as("mi_e4"),
        when(least(expr("hx_num div n"), expr("hy_num div n")) > 0L,
          expr("(mi_num div n) * 1000000L div " +
            "least(hx_num div n, hy_num div n)"))
          .otherwise(0L).as("nmi_ppm"))
  }
}
