package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global sequential rank over a TOTAL order — without the
  * single-partition window trap.
  *
  * `row_number().over(Window.orderBy(...))` moves the whole dataset to
  * ONE partition (Spark even warns); at 100 TB that is not slow, it is
  * dead. The scalable form is the classic two-pass: range-partition by
  * the sort key, count each partition (tiny driver-side result, one
  * value per partition — the same extra job `RDD.zipWithIndex` runs),
  * then global rank = partition offset + local row_number, computed
  * with a PER-PARTITION window that needs no further shuffle.
  *
  * The output is independent of where the range boundaries fall: as
  * long as `order` is a total order (callers include a unique
  * tie-break), offsets + local ranks compose to the same global rank
  * for any partitioning — which is what makes the result reproducible
  * and oracle-checkable even though range boundaries are sampled.
  *
  * Storage contract: the input is persisted for the counts pass (the
  * offsets must describe the SAME partitioning the rank pass reads),
  * and the result is returned through an eager `localCheckpoint` so
  * the cache can be dropped before returning — no caller-owned
  * lifecycle, blocks are freed by the ContextCleaner when the result
  * is GC'd. On a cluster where executor loss during the caller's
  * consumption must be survivable, swap for a reliable checkpoint/
  * table write at the call site.
  */
object GlobalRank {

  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String = "grank",
                 numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty)
    val parted =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, order: _*)
       else df.repartitionByRange(order: _*))
        .withColumn("__pid", spark_partition_id())
    // pass 1: per-partition counts — O(numPartitions) rows to the driver,
    // the bounded action this pattern is allowed (zipWithIndex does the
    // same); cache so pass 2 reuses the shuffle instead of re-sorting
    val cached = parted.persist()
    try {
      val counts = cached.groupBy(col("__pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val pids = counts.keys.toSeq.sorted
      val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + counts(p)).dropRight(1)).toMap
      val offsetExpr = pids.foldRight(lit(0L): Column) { (p, rest) =>
        when(col("__pid") === p, lit(offsets(p))).otherwise(rest)
      }
      val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      val out = cached
        .withColumn(rankCol, (offsetExpr + row_number().over(w)).cast("long"))
        .drop("__pid")
      // materialize before unpersist so the caller's plan reads computed data
      out.localCheckpoint(true)
    } finally cached.unpersist()
  }

  /** Global INCLUSIVE running sum of `value` over a total order — the
    * same two-pass shape as [[globalRank]] (range partition → tiny
    * per-partition sums to the driver → offset + per-partition window),
    * so no single-partition window anywhere. `value` must be non-null
    * int64; `order` must be total (unique tie-break included).
    * Same storage contract as [[globalRank]].
    */
  def globalCumsum(df: DataFrame, order: Seq[Column], value: Column,
                   cumCol: String = "gcum", numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty)
    val parted =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, order: _*)
       else df.repartitionByRange(order: _*))
        .withColumn("__pid", spark_partition_id())
        .withColumn("__v", value.cast("long"))
    val cached = parted.persist()
    try {
      val sums = cached.groupBy(col("__pid")).agg(sum(col("__v")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val pids = sums.keys.toSeq.sorted
      val offsets = pids.zip(pids.scanLeft(0L)((a, p) => a + sums(p)).dropRight(1)).toMap
      val offsetExpr = pids.foldRight(lit(0L): Column) { (p, rest) =>
        when(col("__pid") === p, lit(offsets(p))).otherwise(rest)
      }
      val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val out = cached
        .withColumn(cumCol, (offsetExpr + sum(col("__v")).over(w)).cast("long"))
        .drop("__pid", "__v")
      out.localCheckpoint(true)
    } finally cached.unpersist()
  }
}
