package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Bounded sorted multiset of the k smallest (hash, value) pairs — the
  * quantile-sketch state. Same binary-insert/sorted-merge mechanics as
  * [[TopKAggregator]] but ascending on the (h, v) pair and KEEPING
  * duplicates: the sketch samples ROWS (a value occurring twice must
  * carry double weight in the quantile estimate), unlike
  * [[KmvAggregator]] which dedups because it samples the distinct SET.
  */
class BottomKSampleAggregator(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 2, "quantile sketch needs k >= 2")

  private val ord = implicitly[Ordering[(Long, Long)]]

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size >= k && ord.lteq(buf(buf.size - 1), in)) buf
    else {
      var lo = 0
      var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lteq(buf(mid), in)) lo = mid + 1 else hi = mid
      }
      val (pre, post) = buf.splitAt(lo)
      val out = (pre :+ in) ++ post
      if (out.size > k) out.dropRight(out.size - k) else out
    }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var n = 0
    var i = 0
    var j = 0
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && ord.lteq(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Mergeable bounded-state quantile sketch with exact union algebra —
  * the KLL-class primitive a 100 TB profile actually ships: exact
  * per-group quartiles ([[graft.SparkEntry]] `q_quartiles`) pay a full
  * sort-shuffle of every group, and the equi-width histogram
  * ([[Sketches.histogramQuantiles]]) needs the value range up front;
  * this sketch needs neither — state is k (hash, value) pairs per
  * group, built in one partial-agg pass, and two sketches union into
  * the union's sketch EXACTLY.
  *
  * Compactor choice, documented deliberately: classic KLL compaction
  * (Karnin–Lang–Liberty, FOCS'16) flips coins while collapsing levels,
  * so its state depends on encounter ORDER — no cross-engine oracle can
  * replay it, and even two Spark runs of the same data disagree. This
  * sketch instead keeps the k rows with the smallest salted md5 row
  * hashes — a deterministic, ORDER-INDEPENDENT uniform row sample (the
  * hash order is a random permutation of the rows, fixed by the salt; a
  * bottom-k draw from it is a simple random sample without
  * replacement). That trades KLL's O(1/k) rank error for the sample's
  * O(1/√k), and buys the two properties the engine actually gates on:
  * bit-identical DuckDB replay (rank the hashes, keep k, take order
  * statistics) and EXACT mergeability — any pair among the union's k
  * smallest is among its own group's k smallest, so merged state ==
  * the union's state, the same algebra as [[KmvAggregator]]'s KMV.
  *
  * Scale shape: the aggregation buffer is a bounded sorted Vector;
  * partial aggregation ships at most k pairs per (group, mapper) — the
  * input never shuffles, the sketch does. Union replays stored state
  * through the same aggregator: sketch-sized input, one job, no base
  * scan. Estimates are nearest-rank order statistics over the ≤k
  * sampled values — array ops on state, exact integer arithmetic.
  */
object QuantileSketch {

  /** Per-group sketch STATE: `(as, qs)` where `qs` is the sorted
    * array<struct<h,v>> of the k smallest (salted row-hash, value)
    * pairs. `key` must uniquely identify a row (its hash is the
    * sampling draw; a repeated key would under-weight its rows).
    */
  def sketch(df: DataFrame, group: Column, as: String, key: Column,
             value: Column, k: Int, salt: String): DataFrame = {
    require(k >= 2, "quantile sketch needs k >= 2")
    val fn = udaf(new BottomKSampleAggregator(k))
    df.select(group.as(as), HashFunctions.hash32(key, salt).as("__h"),
        value.cast("long").as("__v"))
      .groupBy(col(as))
      .agg(fn(col("__h"), col("__v")).cast("array<struct<h:bigint,v:bigint>>").as("qs"))
  }

  /** Nearest-rank percentile estimates from sketch state: for each
    * requested integer percent p, the value at rank max(1, ⌈p·n/100⌉)
    * of the sampled values — all integer arithmetic
    * (`(p·n + 99) div 100`), so any engine replays it exactly. Keeps
    * every non-state column of `sketches` (the group key), adds
    * `n_sample` and one `p<NN>` column per requested percentile.
    */
  def estimate(sketches: DataFrame, stateCol: String, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100))
    val keep = sketches.columns.filterNot(_ == stateCol).map(col).toSeq
    val withVals = sketches.withColumn("__vals",
      array_sort(expr(s"transform($stateCol, x -> x.v)")))
    val est = ps.map(p => expr(
      s"element_at(__vals, greatest(1, cast((($p * size(__vals) + 99) div 100) as int)))")
      .as(s"p$p"))
    withVals.select(keep ++ (size(col("__vals")).cast("long").as("n_sample") +: est): _*)
  }

  /** Sliding-window quantiles from per-period sketch state — the
    * rolling p50/p99 ops metric in bounded state: the facts reduce ONCE
    * to k (hash, value) pairs per period, and each window's sample is
    * recovered with pure array ops (flatten the in-range states → sort
    * by (h, v) — the aggregator's exact ordering — → first k: every
    * pair among the window's k smallest lives in its own period's
    * bottom-k, so the merged sample IS the window's sample, the same
    * exact algebra as [[union]]). RANGE frame for calendar semantics
    * across gaps, unpartitioned but period-level (the
    * [[Sketches.kmvSlidingDistinct]] contract — one row per period,
    * never facts). Output: (period, n_periods, n_sample, p…).
    */
  def slidingQuantiles(df: DataFrame, period: Column, key: Column,
                       value: Column, windowPeriods: Int, k: Int,
                       salt: String, ps: Seq[Int]): DataFrame = {
    require(windowPeriods >= 1, "window must be >= 1 periods")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)) // declared-bounded: period-level table
      .orderBy(col("period")).rangeBetween(-(windowPeriods - 1L), 0L)
    estimate(
      sketch(df, period, "period", key, value, k, salt)
        .select(col("period"),
          count(lit(1)).over(w).as("n_periods"),
          slice(array_sort(flatten(collect_list(col("qs")).over(w))), 1, k)
            .as("qs")),
      "qs", ps)
  }

  /** Sketch union algebra: merge per-group sketch state into the global
    * sketch — without touching the base data. Re-feeding stored (h, v)
    * pairs through the same bounded aggregator yields EXACTLY the
    * union's sketch (any of the union's k smallest pairs survives in
    * its own group's state). Output: one row
    * `(n_sketches, n_sample, p…)` for the requested percentiles.
    */
  def union(sketches: DataFrame, stateCol: String, k: Int, ps: Seq[Int]): DataFrame = {
    require(k >= 2, "quantile sketch needs k >= 2")
    val fn = udaf(new BottomKSampleAggregator(k))
    // two consumers (sketch count + merge): materialize the tiny state
    // once so a freshly-built sketch never re-scans its base table
    val st = sketches.localCheckpoint(false)
    val n = st.agg(count(lit(1)).as("n_sketches"))
    val merged = st.select(explode(col(stateCol)).as("p"))
      .select(col("p.h").as("__h"), col("p.v").as("__v"))
      .agg(fn(col("__h"), col("__v")).cast("array<struct<h:bigint,v:bigint>>").as("qs"))
    n.crossJoin(estimate(merged, "qs", ps))
  }
}
