package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.operators.{KmvAggregator, Sketches}

/** Streaming distinct counting in bounded state: the KMV bottom-k
  * sketch ([[Sketches.kmvSketch]]) as a streaming aggregation — live
  * per-group cardinality over an unbounded feed with ≤ k longs of
  * state per group, the companion to [[QuantileStream]] (values) and
  * [[FrequencyStream]] (frequencies) that completes the streaming
  * sketch set.
  *
  * Exactly-mergeable state is again the whole trick: any of the union's
  * k smallest distinct hashes is in its own batch's bottom-k, so after
  * any stream prefix the state is bit-identical to the batch sketch of
  * that prefix — restarts, replays and re-orderings cannot change the
  * estimate (spec-pinned against the batch twin).
  */
object SketchStream {

  /** Per-group KMV state + the order-statistic estimate, same layout
    * and estimator expression as the batch [[Sketches.kmvDistinct]].
    * Run in `complete`/`update` output mode (unwatermarked aggregation).
    */
  def kmvDistinctStream(stream: DataFrame, group: Column, as: String,
                        value: Column, k: Int, salt: String): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val fn = udaf(new KmvAggregator(k))
    stream.select(group.as(as), HashFunctions.hash32(value, salt).as("__h"))
      .groupBy(col(as)).agg(fn(col("__h")).as("hs"))
      .select(col(as), col("hs"), Sketches.kmvEstimate("hs", k).as("n_est"))
  }
}
