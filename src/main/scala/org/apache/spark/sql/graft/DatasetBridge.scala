package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Bridge into Spark's `private[sql]` Dataset internals — same pattern
  * as [[ColumnBridge]], for plan-level surgery no public API offers.
  */
object DatasetBridge {

  /** Rebuild `df` as a bare `LogicalRDD` leaf with DEFAULT statistics,
    * dropping the statistics the plan would otherwise carry.
    *
    * Why this exists: `Dataset.checkpoint`/`localCheckpoint` build their
    * result via `LogicalRDD.fromDataset`, which CARRIES the origin
    * plan's estimated `sizeInBytes` into the new leaf (good for
    * broadcast decisions in straight-line plans). But size estimation
    * multiplies child sizes at each join, so in an iterated
    * checkpoint-then-self-join loop the carried estimate COMPOUNDS:
    * path-halving CC squares it per round and a batched pointer-doubling
    * loop multiplies it 8-fold per batch — after k steps the estimate is
    * a BigInt with ~2^k (or 8^k) BITS, and Catalyst's stats visitor
    * spends minutes in BigInteger multiplication before any task runs
    * (measured: 85 bits → 2.75M bits in 6 batches; q_msf 23 s → 1235 s).
    * Re-leafing through `internalCreateDataFrame` resets the leaf to
    * `defaultSizeInBytes`; AQE recovers broadcast opportunities at
    * runtime from ACTUAL shuffle sizes, so nothing is lost on the plans
    * that loop. Zero-copy: the returned frame wraps the same
    * InternalRow RDD (the checkpointed blocks), no Row conversion.
    */
  def freshLeaf(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }

  /** The estimated sizeInBytes bit-length of `df`'s optimized plan —
    * the observable the stats-compounding regression test pins.
    */
  def statsBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bigInteger.bitLength()
}
