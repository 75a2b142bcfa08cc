package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval set algebra per group — the sweep-line family behind
  * "how much was actually covered": machine-uptime from overlapping
  * maintenance windows, user listening-time from overlapping play
  * spans, supplier commitment days from overlapping fulfillment
  * intervals. Overlaps must merge first — summing raw lengths
  * double-counts every overlap, the classic coverage bug.
  */
object Intervals {

  /** Merged-interval coverage per group over half-open intervals
    * [start, end), both int64 on any shared axis (epoch days/seconds).
    * The textbook sweep, expressed declaratively so it scales: within
    * each group order intervals by start; an interval opens a NEW
    * island iff its start clears the running max of all previous ends
    * (`max(end) OVER (... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`);
    * island ids are the running sum of those open-flags; each island
    * then collapses to `max(end) − min(start)` covered units.
    *
    * Emits one row per group: interval count, merged-island count,
    * covered units, span (last end − first start) and utilization ppm
    * (covered ÷ span) — all exact integers.
    *
    * Scale shape: ONE hash-partitioned sort per group feeds both
    * windows (same partition key and ordering ⇒ one Exchange + one
    * Sort in the physical plan), then two partial aggregates. No
    * global window, no self-join — the O(n²) overlap-join formulation
    * this replaces is the thing that dies at 100 TB.
    */
  def coverage(df: DataFrame, group: Column, start: Column,
               end: Column): DataFrame = {
    val base = df.select(group.as("grp"), start.cast("long").as("s"),
      end.cast("long").as("e"))
    val ord = Window.partitionBy(col("grp"))
      .orderBy(col("s").asc, col("e").asc)
    val prevMax = max(col("e")).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val islands = base
      .withColumn("opens",
        when(prevMax.isNull || (col("s") > prevMax), 1L).otherwise(0L))
      .withColumn("island", sum(col("opens")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("grp"), col("island"))
      .agg(count(lit(1)).as("n_iv"), min(col("s")).as("is"),
        max(col("e")).as("ie"))
    islands.groupBy(col("grp"))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("ie") - col("is")).as("covered"),
        (max(col("ie")) - min(col("is"))).as("span"))
      .select(col("grp"), col("n_intervals"), col("n_islands"),
        col("covered"), col("span"),
        expr("covered * 1000000L div span").as("util_ppm"))
  }
}
