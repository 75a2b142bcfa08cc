package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.DatasetBridge

/** Checkpoint barriers for ITERATED plans — every loop that
  * checkpoints per round and feeds the result back into a join must
  * barrier through here, not through raw `checkpoint`/`localCheckpoint`.
  *
  * Raw checkpoints carry the origin plan's estimated `sizeInBytes`
  * into the new leaf; a loop that self-joins the checkpointed table
  * (path-halving CC, pointer doubling) then COMPOUNDS the estimate
  * geometrically — after k rounds it is a BigInt with ~2^k bits and
  * the driver stalls inside Catalyst's stats arithmetic (see
  * [[DatasetBridge.freshLeaf]] for the measured pathology). These
  * wrappers re-leaf the checkpointed frame with default statistics;
  * AQE re-derives broadcast decisions from actual runtime sizes.
  */
object Barrier {

  /** Local (executor-cached) checkpoint + stats reset. `eager = false`
    * materializes on first downstream action — right for per-round
    * frontiers consumed exactly once downstream; `eager = true`
    * materializes NOW — right when the caller immediately probes the
    * result (fixpoint checks).
    */
  def local(df: DataFrame, eager: Boolean = false): DataFrame =
    DatasetBridge.freshLeaf(df.localCheckpoint(eager))

  /** Reliable (checkpoint-dir-backed) checkpoint + stats reset — the
    * executor-loss-tolerant form for corpus-scale CC loops.
    *
    * Deliberately NOT persisted across the checkpoint: an eager
    * `checkpoint()` runs two jobs (materializing count, then the
    * checkpoint-file write) and the second recomputes the round plan —
    * but every caller's round plan is one join+agg over an already
    * persisted/checkpointed input, and a persist-before-checkpoint was
    * MEASURED r15 a net loss (q_dbscan_cluster 7.6 -> 11.2 s,
    * dedup_semantic +1.1 s, er_resolve +0.7 s at sf0.1: the per-round
    * cache write costs more than the recompute it saves).
    */
  def reliable(df: DataFrame): DataFrame =
    DatasetBridge.freshLeaf(df.checkpoint())

  // A parquet write + read-back variant of `reliable` (one compute job
  // instead of checkpoint()'s count + recomputing write) was tried r16
  // and MEASURED A LOSS: the FileOutputCommitter job/task-commit
  // machinery plus read-back listing costs ~0.2-0.4 s extra per small
  // round and ~2.5 s extra on the doubling rounds (6-query CC family
  // 24.9 -> 43.8 s). The eager RDD checkpoint, double compute and all,
  // is the cheapest durable barrier of the three tested forms.
}
