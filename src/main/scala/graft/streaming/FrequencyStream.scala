package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Frequency

/** Streaming heavy hitters with state BOUNDED BY CONSTRUCTION.
  *
  * The batch twin ([[Frequency.heavyHitters]]) runs Misra–Gries per
  * partition then verifies exactly; on an unbounded stream the analogous
  * exact second pass would need a rescan, so the streaming side maintains
  * the standing CANDIDATE summary instead: items are hash-sharded, each
  * shard's `GroupState` is one MG counter map (≤ k entries — the state
  * bound is `nShards · k` counters no matter how many distinct items the
  * stream carries, unlike a streaming groupBy(item).count whose state is
  * the item universe). MG summaries compose by continuing the fold, so
  * cross-batch state is exactly the counter map — no decay, no rebuild.
  *
  * Guarantee (same averaging argument as the batch sketch, applied per
  * shard): every item of a shard lands wholly in that shard, so an item
  * whose true total count exceeds `n_shard/(k+1)` — in particular any
  * item above `N/(k+1)` globally — is ALWAYS among its shard's surviving
  * counters; `mg_count` is a lower bound on its true count (within
  * `n_shard/(k+1)` of exact). Each micro-batch re-emits the updated
  * shards' candidate sets (Update mode); a periodic batch
  * `heavyHitters` pass over cold storage is the exact-verification
  * companion, the standard sketch-then-verify split.
  */
object FrequencyStream {

  /** One sharded input item. */
  case class ShardedItem(shard: Int, item: String)

  /** Shard state: the MG counter map plus the shard's exact row count. */
  case class MgState(counters: Map[String, Long], n: Long)

  /** One surviving candidate of one shard as of the latest update. */
  case class MgCandidate(shard: Int, item: String, mg_count: Long, n_shard: Long)

  /** Standing heavy-hitter candidates over a streaming DataFrame.
    * `nShards` spreads state and work (one group = one MG map); `k`
    * sets the per-shard counter budget and the `n_shard/(k+1)`
    * detection threshold. Null items are dropped (same contract as the
    * batch sketch). Run with `outputMode("update")`.
    */
  def heavyHittersStream(items: DataFrame, itemCol: Column,
                         nShards: Int, k: Int): Dataset[MgCandidate] = {
    require(nShards >= 1 && k >= 1)
    import items.sparkSession.implicits._
    items.select(itemCol.cast("string").as("item"))
      .where(col("item").isNotNull)
      .select(pmod(hash(col("item")), lit(nShards)).cast("int").as("shard"),
        col("item"))
      .as[ShardedItem]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[MgState, MgCandidate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[ShardedItem], state) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          prev.counters.foreach { case (item, c) => counters(item) = c }
          var n = prev.n
          // mgUpdate drains the iterator, so n is final when it returns
          Frequency.mgUpdate(counters, rows.map { r => n += 1; r.item }, k)
          state.update(MgState(counters.toMap, n))
          counters.iterator.map { case (item, c) => MgCandidate(shard, item, c, n) }
      }
  }
}
