package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.operators.BottomKSampleAggregator

/** Streaming quantiles in bounded state: the batch bottom-k
  * order-statistic sketch ([[graft.operators.QuantileSketch]]) run as a
  * streaming aggregation — the live p50/p99 gauge over an unbounded
  * feed.
  *
  * This works BECAUSE the sketch's merge is exact and
  * order-independent: micro-batch partials fold into the running state
  * through the same reduce/merge the batch aggregator uses, so after
  * any prefix of the stream the state is bit-identical to the batch
  * sketch of that prefix — replayed, re-ordered, or re-partitioned
  * input cannot change it (spec-pinned against the batch twin).
  * Per-group state is ≤ k (hash, value) pairs — no watermark needed,
  * state never grows with the feed; a classic KLL compactor's
  * coin-flips would make every restart emit different estimates.
  */
object QuantileStream {

  /** Streaming per-group sketch state, same layout as
    * [[graft.operators.QuantileSketch.sketch]] — feed to
    * [[graft.operators.QuantileSketch.estimate]] on the sink side for
    * percentile columns. Run in `complete`/`update` output mode (it is
    * an unwatermarked aggregation); `key` must uniquely identify a row
    * (the salted hash of it is the sampling draw).
    */
  def sketchStream(stream: DataFrame, group: Column, as: String, key: Column,
                   value: Column, k: Int, salt: String): DataFrame = {
    require(k >= 2, "quantile sketch needs k >= 2")
    val fn = udaf(new BottomKSampleAggregator(k))
    stream.select(group.as(as), HashFunctions.hash32(key, salt).as("__h"),
        value.cast("long").as("__v"))
      .groupBy(col(as))
      .agg(fn(col("__h"), col("__v")).cast("array<struct<h:bigint,v:bigint>>").as("qs"))
  }
}
