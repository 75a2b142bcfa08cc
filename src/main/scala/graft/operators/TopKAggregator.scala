package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-K as a real aggregate instead of a window sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v)` (the reference's mart
  * pattern, etl_imdb.py:210) must SORT every group's full row set after
  * the shuffle. This Aggregator keeps only a K-element sorted buffer per
  * group and — because Spark aggregates do map-side partial aggregation —
  * the shuffle carries at most K rows per (group, mapper) instead of the
  * whole group. At 100 TB with hot groups that is the difference between
  * a spilling sort and a bounded merge.
  *
  * Generic over any (value, id) pair with Orderings + Encoders; ordering
  * is total — (value DESC, id ASC) — identical results to
  * [[graft.etl.Marts.topNPerGroup]], so they share one oracle. The buffer
  * stays sorted: each input binary-searches its insertion point (no
  * per-row re-sort), and partial buffers merge like sorted runs.
  */
class TopKAggregator[V: TypeTag: Ordering, I: TypeTag: Ordering](k: Int)
    extends Aggregator[(V, I), Seq[(V, I)], Seq[(V, I)]] {
  require(k > 0, "k must be positive")

  /** Descending value, ascending id — the same total order everywhere. */
  private val ord: Ordering[(V, I)] =
    Ordering.by[(V, I), V](_._1)(implicitly[Ordering[V]].reverse).orElseBy(_._2)

  override def zero: Seq[(V, I)] = Vector.empty

  override def reduce(buf: Seq[(V, I)], in: (V, I)): Seq[(V, I)] =
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

  /** Sorted-run merge of two partial buffers, truncated at K. */
  override def merge(a: Seq[(V, I)], b: Seq[(V, I)]): Seq[(V, I)] = {
    val out = Vector.newBuilder[(V, I)]
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

  override def finish(r: Seq[(V, I)]): Seq[(V, I)] = r

  override def bufferEncoder: Encoder[Seq[(V, I)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(V, I)]] = ExpressionEncoder()
}

object TopKAggregate {

  /** groupBy(group) → top-K (value, id) pairs → exploded back to the
    * (group, id, value, rk) row shape of the window formulation.
    */
  def topK[V: TypeTag: Ordering, I: TypeTag: Ordering](
      df: DataFrame, group: Column, groupAs: String,
      value: Column, id: Column, k: Int,
      idAs: String, valueAs: String): DataFrame = {
    val fn = udaf(new TopKAggregator[V, I](k))
    df.groupBy(group.as(groupAs))
      .agg(fn(value, id).as("top"))
      .select(col(groupAs), posexplode(col("top")).as(Seq("pos", "pair")))
      .select(col(groupAs), col("pair._2").as(idAs), col("pair._1").as(valueAs),
        (col("pos") + 1).cast("long").as("rk"))
  }
}
