package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Sketches

/** Streaming ingestion drift guard: every micro-batch is scored against
  * a STATIC reference distribution with the exact-rational chi-squared
  * gate ([[Sketches.chi2Drift]]) — the "alert when today's feed stops
  * looking like the training corpus" pattern at the ingestion edge.
  *
  * Shape: `foreachBatch` — the per-batch comparison is a BATCH job on
  * the micro-batch DataFrame, so the whole batch operator library
  * applies unchanged (no stateful-operator rewrite, no watermark
  * interplay; the reference never updates mid-stream, which is exactly
  * what a drift REFERENCE must not do). The reference is aggregated
  * once up front to its per-bucket counts; each batch pays one tiny
  * count aggregate + the broadcast compare. Batches are scored
  * independently — cumulative drift is the batch layer's job
  * ([[graft.SparkEntry]] `q_drift_chi2` over cold storage).
  */
object DriftStream {

  /** Start the guard on a streaming DataFrame. `bucket` buckets both
    * sides identically (categorical column or `v div width`);
    * `onBatch(batchId, chi2_ppm, nBuckets, nRows)` receives each
    * micro-batch's pooled statistic (Σ contrib_ppm — χ²·1e6). Empty
    * micro-batches are skipped (no cohort to compare — chi2Drift would
    * raise, and an empty batch is a scheduling artifact, not drift).
    */
  def chi2Guard(stream: DataFrame, reference: DataFrame, bucket: Column,
                onBatch: (Long, Long, Long, Long) => Unit): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val d = Sketches.chi2Drift(reference, batch, bucket)
          .agg(sum(col("contrib_ppm")).as("chi2_ppm"),
            count(lit(1)).as("n_buckets"),
            sum(col("n_cur")).as("n_rows"))
          .collect().head
        onBatch(id, d.getLong(0), d.getLong(1), d.getLong(2))
      }
    }.start()
}
