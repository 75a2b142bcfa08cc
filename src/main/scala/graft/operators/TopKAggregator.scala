package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-K as a real aggregate instead of a window sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v)` (the reference's mart
  * pattern, etl_imdb.py:210) must SORT every group's full row set after
  * the shuffle. This Aggregator keeps only a K-element buffer per group
  * and — because Spark aggregates do map-side partial aggregation — the
  * shuffle carries at most K rows per (group, mapper) instead of the
  * whole group. At 100 TB with hot groups that is the difference between
  * a spilling sort and a bounded merge.
  *
  * Ordering is total: (value DESC, id ASC) — identical results to
  * [[graft.etl.Marts.topNPerGroup]], so they share one oracle.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  /** Descending value, ascending id — the same total order everywhere. */
  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size >= k && lt(buf.last, in)) buf
    else (buf :+ in).sortWith(lt).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

object TopKAggregate {

  /** groupBy(group) → top-K (value, id) pairs → exploded back to the
    * (group, id, value, rk) row shape of the window formulation.
    */
  def topK(df: DataFrame, group: Column, groupAs: String,
           value: Column, id: Column, k: Int,
           idAs: String, valueAs: String): DataFrame = {
    val fn = udaf(new TopKAggregator(k))
    df.groupBy(group.as(groupAs))
      .agg(fn(value, id).as("top"))
      .select(col(groupAs), posexplode(col("top")).as(Seq("pos", "pair")))
      .select(col(groupAs), col("pair._2").as(idAs), col("pair._1").as(valueAs),
        (col("pos") + 1).cast("long").as("rk"))
  }
}
