package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor ahead of CPU-bound per-row stages.
  *
  * Scan parallelism is split-bound: a table that lands as one parquet
  * row group arrives as ONE partition, and everything fused into that
  * scan stage — tokenize, shingle, hash, explode — runs on one thread
  * no matter how many cores the session has (measured on
  * `text_rrf_fuse`: a 3.2 s single-task tokenize stage was 65% of the
  * query at sf0.1). When the incoming partition count is below the
  * session's shuffle parallelism, one round-robin exchange of the raw
  * rows (bytes ≈ the scan itself, one pass) buys full-width execution
  * of the expensive per-row stage.
  *
  * When the input is already at least that wide — the normal case on a
  * production corpus with thousands of splits — this is the IDENTITY:
  * no exchange is added, so the 100 TB plan shape is untouched.
  */
object CpuStage {
  def fanOut(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df
  }
}
