package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A table sorted on ONE key prunes scans on that key only; queries
  * filtering on a second dimension read everything. Interleaving the
  * bits of both keys into one Z-value and range-sorting the files on it
  * gives every file a small bounding box in BOTH dimensions, so parquet
  * row-group min/max stats prune scans filtered on either key (the
  * technique behind Delta/Iceberg Z-ORDER clustering, here as a plain
  * column expression + write discipline).
  *
  * The Z-value is pure integer bit arithmetic — engine-portable and
  * oracle-checkable, like every other derived value in this library.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    * 2·bits ≤ 62 keeps the result in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** Hilbert-curve index of two non-negative int columns on a
    * 2^bits × 2^bits grid — the locality-better alternative to
    * [[zValue]] (every unit step of the curve is a unit grid move, so
    * per-file bounding boxes stay tighter than Morton's Z jumps; same
    * write discipline applies).
    *
    * Implementation is the standard top-down quadrant walk (Wikipedia's
    * `xy2d`) with one portability twist: coordinates are masked to the
    * bits BELOW the current scale before the rotate/flip (equivalent —
    * bit i of the working coords is consumed at scale 2^i and never
    * re-read; property-tested against the unmasked reference), which
    * keeps them non-negative so the whole loop runs as ONE higher-order
    * `aggregate` fold over the scale list with a packed
    * `d·2³² + x·2¹⁶ + y` int64 accumulator — pure codegen'd integer
    * arithmetic, replayed token-for-token by the DuckDB twin's
    * `list_reduce`. bits ≤ 15 keeps the packed value < 2⁶².
    */
  def hilbertValue(x: Column, y: Column, bits: Int = 15): Column = {
    require(bits > 0 && bits <= 15, "bits must be in [1, 15]")
    val scales = array((bits - 1 to 0 by -1).map(i => lit(1L << i)): _*)
    val packed = aggregate(
      scales,
      x.cast("long") * lit(65536L) + y.cast("long"),
      (a, s) => {
        // field extraction via shift/mask — exact int64 (a `/` here
        // would be IEEE division and corrupt packed values past 2^53)
        val ax = shiftright(a, 16).bitwiseAND(lit(65535L))
        val ay = a.bitwiseAND(lit(65535L))
        val ad = shiftright(a, 32)
        val rx = when(ax.bitwiseAND(s) > 0L, lit(1L)).otherwise(lit(0L))
        val ry = when(ay.bitwiseAND(s) > 0L, lit(1L)).otherwise(lit(0L))
        val mx = ax.bitwiseAND(s - 1L)
        val my = ay.bitwiseAND(s - 1L)
        val nx = when(ry === 1L, mx)
          .otherwise(when(rx === 1L, s - 1L - my).otherwise(my))
        val ny = when(ry === 1L, my)
          .otherwise(when(rx === 1L, s - 1L - mx).otherwise(mx))
        (ad + s * s * (rx * 3L).bitwiseXOR(ry)) * lit(4294967296L) +
          nx * lit(65536L) + ny
      })
    shiftright(packed, 32)
  }

  /** Data-skipping audit — the measured PAYOFF of [[zValue]] layout: for
    * each of two layouts of the same rows (`zorder` on the Morton value,
    * `linear` sorted by x alone), assign rows to `files` equal-size
    * files in layout order, collect per-file min/max stats on y, and
    * report how many files a y-band predicate `[yLo, yHi]` can skip on
    * stats alone, plus the rows the surviving files must scan.
    *
    * This is the secondary-dimension query that motivates Z-order: a
    * linear-on-x layout leaves every file spanning the full y range
    * (zero skips), while the Morton layout fixes the top y bits within
    * each contiguous Z-range, so ~(1 − band/2^t) of files prune. File
    * assignment uses [[GlobalRank.globalRank]] (range-partition +
    * per-partition offsets — never a single-partition window) with
    * `keyCol` as the unique tiebreak so the assignment is total-order
    * deterministic and engine-replayable. `matched_in_skipped` is the
    * audit's own correctness witness: rows matching the predicate
    * inside skipped files — MUST be 0 by construction of min/max
    * pruning (spec-pinned).
    *
    * Output: one row per layout `(layout, n_files, files_skipped,
    * rows_scanned, rows_matched, matched_in_skipped)`.
    */
  def skippingAudit(df: DataFrame, xCol: Column, yCol: Column, keyCol: Column,
                    files: Int, bits: Int, yLo: Long, yHi: Long): DataFrame =
    auditLayouts(df, xCol, yCol, keyCol, files, yLo, yHi,
      Seq("zorder" -> (b => zValue(col("x"), col("y"), b)),
        "linear" -> (_ => col("x"))), bits)

  /** Three-way layout shoot-out on a 2^bits grid: [[hilbertValue]] vs
    * [[zValue]] vs linear-on-x, same rows, same per-file min/max prune
    * on the same y band — the measured evidence for choosing a curve.
    * Same audit mechanics as [[skippingAudit]] (GlobalRank file
    * assignment, `matched_in_skipped` must be 0); one row per layout.
    */
  def hilbertAudit(df: DataFrame, xCol: Column, yCol: Column, keyCol: Column,
                   files: Int, bits: Int, yLo: Long, yHi: Long): DataFrame =
    auditLayouts(df, xCol, yCol, keyCol, files, yLo, yHi,
      Seq("hilbert" -> (b => hilbertValue(col("x"), col("y"), b)),
        "zorder" -> (b => zValue(col("x"), col("y"), b)),
        "linear" -> (_ => col("x"))), bits)

  private def auditLayouts(df: DataFrame, xCol: Column, yCol: Column,
                           keyCol: Column, files: Int, yLo: Long, yHi: Long,
                           layouts: Seq[(String, Int => Column)],
                           bits: Int): DataFrame = {
    require(files > 0 && yLo <= yHi && layouts.nonEmpty)
    // width-floor BEFORE the per-layout curve expressions: the input
    // lands as one split at bench scale and the hilbert fold (15
    // case-when rounds per row) would otherwise run single-task in the
    // scan stage (measured r15: two 1.5 s one-task stages were 60% of
    // q_hilbert_audit). The identical repartition subtree feeds every
    // layout, so one exchange is shared via ReusedExchange; identity on
    // already-wide production scans.
    val base = CpuStage.fanOut(df.select(xCol.cast("long").as("x"),
      yCol.cast("long").as("y"), keyCol.cast("long").as("k")))
    // one bounded scalar: file boundaries need the total row count (the
    // same O(1) driver-side action globalRank itself performs)
    val n = base.count()
    require(n > 0, "skippingAudit: empty input")
    val matched = (c: Column) => c >= yLo && c <= yHi
    def audit(name: String, ord: Column): DataFrame =
      GlobalRank.globalRank(base.withColumn("__ord", ord),
          Seq(col("__ord").asc, col("k").asc))
        .withColumn("file_id", expr(s"((grank - 1) * $files) div ${n}L"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"), min(col("y")).as("min_y"),
          max(col("y")).as("max_y"),
          sum(when(matched(col("y")), 1L).otherwise(0L)).as("n_match"))
        .withColumn("skipped", col("max_y") < yLo || col("min_y") > yHi)
        .agg(lit(name).as("layout"),
          count(lit(1)).as("n_files"),
          sum(when(col("skipped"), 1L).otherwise(0L)).as("files_skipped"),
          sum(when(!col("skipped"), col("n_rows")).otherwise(0L)).as("rows_scanned"),
          sum(col("n_match")).as("rows_matched"),
          sum(when(col("skipped"), col("n_match")).otherwise(0L)).as("matched_in_skipped"))
    layouts.map { case (name, ord) => audit(name, ord(bits)) }
      .reduce(_.unionByName(_))
  }

  /** Rewrite `df` Z-ordered on (xCol, yCol): range-partition by the
    * Z-value (each output file owns a contiguous Z-range = a small 2-D
    * bounding box) and sort within partitions so row-group stats are
    * tight. The Z column itself is dropped — it exists only to place
    * rows.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: Column, yCol: Column,
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(xCol, yCol, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compaction bin-packing plan: assign each chunk (a partition's
    * monthly slice, a small file's row count — any (group, key, size)
    * manifest) to a target-sized write bucket by streaming chunks in
    * key order and cutting a new bucket whenever the running size
    * BEFORE the chunk crosses a multiple of `targetSize`:
    * `bucket = cum_before div targetSize`. The small-file killer's
    * planning half — [[graft.SparkEntry]]'s `sink_compact` is the
    * execution half; at 100 TB you PLAN the file groups from the
    * manifest (cheap metadata) and hand each bucket to one writer
    * task, instead of rewriting whole partitions blind.
    *
    * Emits (grp, key, sz, bucket) — deterministic, exact integers.
    * Scale shape: one window per group over the manifest (metadata
    * rows, not data rows); a first chunk larger than `targetSize`
    * still gets its own bucket (streaming FFD semantics).
    */
  def compactionPlan(manifest: DataFrame, group: Column, key: Column,
                     size: Column, targetSize: Long): DataFrame = {
    require(targetSize > 0)
    manifest.select(group.as("grp"), key.as("key"), size.cast("long").as("sz"))
      .withColumn("cum_before", coalesce(
        sum(col("sz")).over(Window.partitionBy(col("grp"))
          .orderBy(col("key").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("grp"), col("key"), col("sz"),
        expr(s"cum_before div ${targetSize}L").as("bucket"))
  }
}
