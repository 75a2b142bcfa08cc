package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Louvain-style greedy modularity moves — the agglomerative
  * counterpart to [[LabelProp]]'s majority rule: a node joins the
  * neighbor whose community yields the largest POSITIVE modularity
  * gain, so merges are driven by the same objective
  * [[Modularity.partitionModularity]] audits, not by vote counts.
  */
object Louvain {

  /** One synchronous local-move round from the singleton partition
    * (the first Louvain half-pass, made deterministic): every node i
    * evaluates joining each neighbor j's community and takes the best
    * strictly-positive gain. From singletons the gain of i→{j} is
    * ΔQ ∝ 2m·n_ij − k_i·k_j — kept as that EXACT integer
    * cross-multiplication (`gain_x`; the 1/2m² normalization is
    * positive and common to all candidates, so argmax and the >0 test
    * are unaffected) — no floats, engine-identical. Ties break to the
    * smallest neighbor id; no positive gain keeps the node in its own
    * community. Synchronous = all decisions read the same snapshot
    * (the distributed-determinism trade every sequential-Louvain port
    * makes; [[LabelProp]] documents the same contract).
    *
    * `edges` must be symmetrized (both directions), self-loop-free,
    * long (src, dst); multi-edges act as integer weights. Emits one
    * row per node: (node, new_label, gain_x — 0 when staying).
    *
    * Scale shape: one degree aggregate, one 1-row total (broadcast
    * scalar inject), one edge-multiplicity aggregate + two keyed
    * degree joins, one (node)-keyed max-struct argmax — every shuffle
    * on node ids, nothing quadratic. The merged partition feeds
    * [[Modularity.partitionModularity]] for the before/after audit and
    * [[Dedup.clusters]] when chained rounds need a canonical label.
    */
  def localMove(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false) // three consumers: degrees, m2, pair counts
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("k"))
    val m2 = e.agg(count(lit(1)).as("m2"))
    val pairs = e.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n_ij"))
    val gains = pairs
      .join(deg.select(col("node").as("src"), col("k").as("k_i")), "src")
      .join(deg.select(col("node").as("dst"), col("k").as("k_j")), "dst")
      .crossJoin(broadcast(m2))
      .select(col("src"), col("dst"),
        (col("m2") * col("n_ij") - col("k_i") * col("k_j")).as("gain_x"))
    gains.groupBy(col("src").as("node"))
      // argmax with smallest-neighbor tie-break: max of (gain, −dst)
      .agg(max(struct(col("gain_x"), (-col("dst")).as("neg"))).as("best"))
      .select(col("node"),
        when(col("best.gain_x") > 0, -col("best.neg")).otherwise(col("node"))
          .as("new_label"),
        greatest(col("best.gain_x"), lit(0L)).as("gain_x"))
  }
}
