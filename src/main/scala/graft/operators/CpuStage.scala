package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project, SubqueryAlias}

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
  /** Width-floor `df` for a CPU-bound per-row stage.
    *
    * The partition count is consulted via `df.rdd`, which under AQE
    * forces the final physical plan — on a shuffle-fed input that would
    * eagerly EXECUTE the upstream stages and the real query would then
    * recompute them (ADVICE r9). So the probe is gated on the plan
    * being NARROW-ONLY (leaf scans under project/filter/alias): there
    * `.rdd` builds lineage without running anything, and that is also
    * exactly the case the floor exists for. Any plan containing a
    * shuffle, union, or join already runs at session width downstream
    * of its exchange, so the floor is correctly the identity — returned
    * without ever touching `.rdd`.
    */
  def fanOut(df: DataFrame): DataFrame = {
    // narrow NODES only — and no subquery EXPRESSIONS either: a
    // Project/Filter carrying a scalar subquery over a join/shuffle
    // would pass the node walk yet make `.rdd` eagerly execute that
    // subquery, the exact eager-execution problem this gate avoids
    val analyzed = df.queryExecution.analyzed
    val narrowOnly = analyzed.collectFirst {
      case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
        !p.isInstanceOf[SubqueryAlias] && !p.isInstanceOf[LeafNode] => p
    }.isEmpty && !analyzed.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]])))
    if (!narrowOnly) df
    else {
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      if (df.rdd.getNumPartitions < n) df.repartition(n) else df
    }
  }
}
