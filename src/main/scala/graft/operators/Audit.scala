package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-level audit primitives for validating copies and sizing joins
  * BEFORE paying for them — the operational layer a 100 TB pipeline
  * needs around every migration, backfill, and join.
  */
object Audit {

  /** 2^60 — the signature modulus. Signatures are 60-bit (15 md5 hex
    * chars), so sums reduced mod 2^60 and xors stay in [0, 2^60) and
    * never touch the long sign bit in any engine.
    */
  val SigModulus: Long = 1L << 60

  /** Portable 60-bit row signature: md5 over a `|`-joined canonical
    * rendering of the given columns, each cast to string with NULL
    * mapped to a `^` sentinel (a bare concat_ws SKIPS nulls, which
    * would make `("a", null, "b")` collide with `("a", "b", null)`).
    * Callers pick columns whose string rendering is engine-portable —
    * integers, dates, strings; money goes through exact cents first
    * (doubles/decimals render differently across engines).
    */
  def rowSignature(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|",
        cols.map(c => coalesce(c.cast("string"), lit("^"))): _*)), 1, 15),
      16, 10).cast("long")

  /** Order-invariant dataset fingerprint, per group + grand total
    * (rollup): row count, XOR and mod-2^60 SUM of the row signatures,
    * min/max signature. Any row lost, duplicated, or altered flips the
    * fingerprint; any reordering or repartitioning leaves it unchanged
    * (every combiner is commutative) — so two sides of a 100 TB copy
    * can each compute it independently and compare five numbers.
    *
    * Scale shape: one narrow map pass (md5 per row) + one partial-agg
    * shuffle of constant-size state per group. The sum rides
    * DECIMAL(38,0) before the final mod, so it is exact to ~10^19 rows.
    * XOR alone would let any value appearing an even number of times
    * cancel out; count + sum + min/max close that hole.
    */
  def datasetFingerprint(df: DataFrame, groupCol: String,
                         cols: Seq[Column]): DataFrame =
    df.select(col(groupCol).as("grp"), rowSignature(cols).as("sig"))
      .rollup(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(sig)").as("xor_sig"),
        (sum(col("sig").cast("decimal(38,0)")) % lit(SigModulus))
          .cast("long").as("sum_sig"),
        min(col("sig")).as("min_sig"),
        max(col("sig")).as("max_sig"))

  /** Exact merge of two [[datasetFingerprint]] outputs: the fingerprint
    * of A ∪ B from the fingerprints of A and B alone — every combiner
    * is commutative AND associative (n adds, xor xors, sum adds mod
    * 2^60, min/max fold), so fingerprints are mergeable state like the
    * KMV/quantile sketches. That makes incremental copy-validation one
    * tiny merge per batch instead of a full rescan: fingerprint each
    * day's increment, fold it into the standing fingerprint, compare
    * against the other side's.
    *
    * Groups join null-safely (the rollup total row has a NULL grp and
    * must merge with its twin); a group present on one side only passes
    * through with the other side's identities (0, 0, 0, null, null).
    */
  def mergeFingerprints(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("grp").as("grp_a"), col("n_rows").as("n_a"),
      col("xor_sig").as("x_a"), col("sum_sig").as("s_a"),
      col("min_sig").as("mn_a"), col("max_sig").as("mx_a"))
    val r = b.select(col("grp").as("grp_b"), col("n_rows").as("n_b"),
      col("xor_sig").as("x_b"), col("sum_sig").as("s_b"),
      col("min_sig").as("mn_b"), col("max_sig").as("mx_b"))
    l.join(r, col("grp_a") <=> col("grp_b"), "full_outer")
      .select(coalesce(col("grp_a"), col("grp_b")).as("grp"),
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n_rows"),
        expr("coalesce(x_a, 0L) ^ coalesce(x_b, 0L)").as("xor_sig"),
        pmod(coalesce(col("s_a"), lit(0L)) + coalesce(col("s_b"), lit(0L)),
          lit(SigModulus)).as("sum_sig"),
        least(col("mn_a"), col("mn_b")).as("min_sig"),
        greatest(col("mx_a"), col("mx_b")).as("max_sig"))
  }

  /** Exact join-output cardinality and skew profile WITHOUT running the
    * join: per-key counts on both sides, one tiny count⋈count join,
    * out_rows = left_rows · right_rows per key. Returns the `topK`
    * heaviest keys (by output contribution, ties → smallest key) plus a
    * grand-total row (join_key NULL) summing all matched keys.
    *
    * This is the candidate-census shape from the prefix-filter probe as
    * a first-class operator: at 100 TB the audit shuffles two count
    * tables (distinct keys × 24 bytes) instead of the full payload, and
    * tells you whether the real join is runnable — and which keys need
    * salting — before you pay for it. Products and totals are exact
    * while per-key count products stay under 2^63 (i.e. both sides
    * under ~3·10^9 rows PER KEY — beyond that the join output itself
    * would be over 9·10^18 rows, which no one runs); the grand total
    * additionally requires the summed output under 2^63, the same
    * documented int64 contract as hits/associationRules.
    */
  def joinSizeAudit(left: DataFrame, keyL: String,
                    right: DataFrame, keyR: String, topK: Int): DataFrame = {
    require(topK > 0, "joinSizeAudit: topK must be positive")
    val la = left.groupBy(col(keyL).cast("long").as("join_key"))
      .agg(count(lit(1)).as("left_rows"))
    val ra = right.groupBy(col(keyR).cast("long").as("join_key"))
      .agg(count(lit(1)).as("right_rows"))
    val per = la.join(ra, Seq("join_key"))
      .withColumn("out_rows", col("left_rows") * col("right_rows"))
    val top = per
      .orderBy(col("out_rows").desc, col("join_key"))
      .limit(topK)
    val total = per.agg(
      lit(null).cast("long").as("join_key"),
      sum(col("left_rows")).as("left_rows"),
      sum(col("right_rows")).as("right_rows"),
      sum(col("out_rows")).as("out_rows"))
    top.unionByName(total)
  }

  /** Sampled join-size estimate — [[joinSizeAudit]]'s exact per-key
    * count tables are themselves huge when the key is high-cardinality;
    * this estimates the same output size from a deterministic KEY
    * sample: keep only keys whose salted hash clears `ratePpm`, compute
    * exact per-key products for those, scale by the inverse rate. The
    * key filter is map-side on BOTH inputs before any aggregation, so
    * the whole probe costs ~rate × the exact audit — the classic
    * sketch-for-planning trade. Sampling KEYS (not rows) is what keeps
    * the estimator unbiased for joins: a row sample would need
    * rate² correction per key and explode the variance on hot keys.
    *
    * Deterministic md5 draw = replayable estimate (same inputs, same
    * number, any engine). The scaled sum rides DECIMAL(38,0) — a hot
    * sampled key can already hold ~10⁹×10⁹ products. Emits
    * (n_keys_sampled, sampled_rows, est_rows).
    */
  def joinSizeEst(left: DataFrame, keyL: String, right: DataFrame,
                  keyR: String, ratePpm: Long, salt: String): DataFrame = {
    require(ratePpm > 0 && ratePpm <= 1000000L, "rate must be in (0, 1e6] ppm")
    val thr = ratePpm * 4294967296L / 1000000L
    // hash the RAW key (hash32 string-casts internally, matching the
    // oracle's CAST(k AS VARCHAR)) — a numeric cast here would null out
    // non-numeric keys and silently return est 0 for string-keyed joins
    def sampledCounts(df: DataFrame, k: String) =
      df.select(col(k).as("join_key"))
        .where(graft.functions.HashFunctions.hash32(col("join_key"), salt) < thr)
        .groupBy(col("join_key")).agg(count(lit(1)).as("n"))
    val per = sampledCounts(left, keyL)
      .join(sampledCounts(right, keyR).withColumnRenamed("n", "m"), "join_key")
      .select(col("join_key"), (col("n") * col("m")).as("out_rows"))
    per.agg(count(lit(1)).as("n_keys_sampled"),
        coalesce(sum(col("out_rows")), lit(0L)).as("sampled_rows"))
      .select(col("n_keys_sampled"), col("sampled_rows"),
        expr(s"cast(floor((cast(sampled_rows as decimal(38,0)) * 4294967296) / $thr) as long)")
          .as("est_rows"))
  }

  /** Referential-integrity census: for each named (child, childKey,
    * parent, parentKey) relation, the child row count, orphan count
    * (child keys with no parent — a LEFT ANTI against the parent's
    * distinct keys) and orphan rate in exact ppm — the FK conformance
    * gate a star schema runs after every load. Null child keys count
    * as orphans (they reference nothing). Each relation is one
    * anti-join; the parent key list is distinct-ed first so the join
    * ships keys, not payloads. Emits one row per relation.
    */
  def fkAudit(relations: Seq[(String, DataFrame, Column, DataFrame, Column)]): DataFrame = {
    require(relations.nonEmpty)
    relations.map { case (name, child, ck, parent, pk) =>
      // join on the RAW key columns (Spark coerces mixed numeric widths
      // in the equality itself) — a numeric cast here would null out
      // string keys and report every child row as an orphan
      val c = child.select(ck.as("k"))
      val orphans = c.join(parent.select(pk.as("k"))
        .where(col("k").isNotNull).distinct(), Seq("k"), "left_anti")
      c.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphan")))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphan"),
          expr("1000000L * n_orphan div n_child").as("orphan_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Expected Benford first-digit shares, ppm: round(10⁶·log10(1+1/d)).
    * The nine roundings sum to exactly 1 000 000, so obs−exp deviations
    * are comparable digit-by-digit with no residual drift.
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit conformity audit — the classic fabricated-data
    * screen for naturally-occurring amounts (payments, populations,
    * file sizes): organically generated magnitudes follow
    * P(d) = log10(1+1/d); hand-entered or synthesized ones usually
    * don't. Emits one row per (group, digit 1..9): observed count,
    * observed ppm (`10⁶·n_d div n` — exact), the expected Benford ppm,
    * and the group's mean absolute deviation over the nine digits
    * (MAD, the standard conformity statistic — ≲ 15 000 ppm is "close
    * conformity" in the audit literature).
    *
    * Digits the group never produced still get a row (n=0) — an absent
    * digit is the strongest possible deviation and must count in the
    * MAD, so the 9-digit frame comes from the bounded group list, not
    * from the data.
    *
    * Scale shape: one (group, digit)-keyed partial aggregate — at most
    * 9·G rows ever shuffle; the per-row work is one string head char.
    * Zero/negative values are excluded (Benford is defined on positive
    * magnitudes); callers audit signed ledgers as abs() upstream.
    */
  def benford(df: DataFrame, group: Column, value: Column): DataFrame = {
    val digits = df
      .select(group.as("grp"), value.cast("long").as("__v"))
      .filter(col("__v") > 0)
      .withColumn("digit", substring(col("__v").cast("string"), 1, 1).cast("long"))
    val counts = digits.groupBy(col("grp"), col("digit"))
      .agg(count(lit(1)).as("n"))
    val frame = counts.groupBy(col("grp")).agg(sum(col("n")).as("n_total"))
      .select(col("grp"), col("n_total"),
        explode(sequence(lit(1L), lit(9L))).as("digit"))
    val expPpm = BenfordPpm.foldRight(lit(null).cast("long")) {
      case ((d, ppm), rest) => when(col("digit") === d, lit(ppm)).otherwise(rest)
    }
    val scored = frame.join(counts, Seq("grp", "digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("exp_ppm", expPpm)
      .withColumn("obs_ppm", expr("1000000 * n div n_total"))
    // the MAD window sees exactly 9 rows per group — bounded by
    // construction, never by data volume
    scored
      .withColumn("mad_ppm",
        (sum(abs(col("obs_ppm") - col("exp_ppm")))
          .over(Window.partitionBy(col("grp"))) / lit(9)).cast("long"))
      .select(col("grp"), col("digit"), col("n"), col("obs_ppm"),
        col("exp_ppm"), col("mad_ppm"))
  }

  /** Join-key skew diagnosis: the pre-flight audit that decides whether
    * a shuffle key needs salting BEFORE a 100 TB join hangs on one
    * straggler. For the top-k hottest keys it reports the key's row
    * count, its share of the table in ppm, and `salt_factor` — how many
    * AVERAGE shuffle partitions (at `numPartitions`) that single key's
    * rows would fill, i.e. the replication factor
    * [[Joins.saltedJoin]]-style salting needs to level it
    * (`ceil(cnt · P / total)`, floored at 1). A salt_factor of 1 means
    * the key fits inside one average partition — no salting needed; 8
    * means the hottest reducer gets 8× the average and the join should
    * salt ≥ 8 ways.
    *
    * Scale shape: one partial-agg count per key (map-side combine), then
    * a global top-k which Spark executes as TakeOrderedAndProject —
    * per-partition heaps merged on the driver, never a full sort. The
    * grand total rides the same aggregate re-read, broadcast as a
    * 1-row cross join.
    */
  def keySkewAudit(df: DataFrame, key: Column, topK: Int,
                   numPartitions: Int): DataFrame = {
    require(topK > 0 && numPartitions > 0)
    val counts = df.select(key.as("key")).groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // two consumers: total + top-k
    val total = counts.agg(sum(col("cnt")).as("n_total"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"), col("n_total"), col("n_keys"),
        expr("cnt * 1000000L div n_total").as("share_ppm"),
        // ceil(cnt·P / total) spelled add-then-truncate: `div` truncates
        // toward zero in both engines, so the negate trick would floor
        greatest(lit(1L),
          expr(s"(cnt * $numPartitions + n_total - 1) div n_total"))
          .as("salt_factor"))
  }
}
