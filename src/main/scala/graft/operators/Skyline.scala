package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier): the rows not dominated on
  * (minimize `minCol`, maximize `maxCol`) — multi-objective shortlist
  * queries ("no part is both cheaper and larger"). Dominance is the
  * standard one-strict-inequality form, so exact duplicates on both
  * dimensions survive together.
  *
  * Scale shape — the [[GlobalRank]] offset pattern applied to dominance:
  * range-partition on the MINIMIZED dimension (equal values co-locate,
  * so every earlier partition is strictly cheaper than every row here),
  * then a row is dominated iff
  *  - the max of `maxCol` over EARLIER partitions reaches it (an
  *    O(numPartitions) driver fold baked in as a when-chain, like
  *    GlobalRank's offsets), or
  *  - a strictly-cheaper row in its OWN partition reaches it
  *    (partition-local integer RANGE frame — local sort only), or
  *  - an equal-`minCol` row strictly exceeds it (same local sort).
  * No global single-partition window anywhere; the only wide move is the
  * range partition itself. `minCol`/`maxCol` must be int64 (exact range
  * frames) — use cents/epoch-ms like every other exact operator here.
  * Same storage contract as [[GlobalRank.globalRank]] (eager local
  * checkpoint; the two-pass cache is released before returning).
  */
object Skyline {
  def skyline2D(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val parted = df.repartitionByRange(col(minCol))
      .withColumn("__pid", spark_partition_id())
    val cached = parted.persist()
    try {
      // bounded driver action: one (pid, max) row per partition
      val pm = cached.groupBy(col("__pid")).agg(max(col(maxCol)).as("__m"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      // prevMax(pid) = best maxCol over partitions strictly before pid
      val prevMax = pm.zip(pm.scanLeft(Long.MinValue) { case (acc, (_, m)) =>
        math.max(acc, m)
      }).map { case ((pid, _), before) => pid -> before }.toMap
      val prevExpr = pm.map(_._1).foldRight(lit(Long.MinValue): Column) { (p, rest) =>
        when(col("__pid") === p, lit(prevMax(p))).otherwise(rest)
      }
      val wCheaper = Window.partitionBy(col("__pid")).orderBy(col(minCol))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy(col("__pid"), col(minCol))
      val out = cached
        .withColumn("__prevMax", prevExpr)
        .withColumn("__localCheaper", max(col(maxCol)).over(wCheaper))
        .withColumn("__sameMax", max(col(maxCol)).over(wSame))
        .where(!(col("__prevMax") >= col(maxCol)) &&
          !coalesce(col("__localCheaper") >= col(maxCol), lit(false)) &&
          !(col("__sameMax") > col(maxCol)))
        .drop("__pid", "__prevMax", "__localCheaper", "__sameMax")
      out.localCheckpoint(true)
    } finally cached.unpersist()
  }
}
