package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategies for shapes the planner can't always save by itself. */
object Joins {

  /** Salt-replicate equi-join for a skewed big ⋈ small join: the big
    * side gets a row-local salt (`monotonically_increasing_id % n` —
    * any within-key-varying value works; result is salt-independent),
    * the small side replicates once per salt value, and the join keys
    * become (keys, salt) — a hot key's rows now spread over `saltFactor`
    * partitions instead of melting one executor.
    *
    * This is the MANUAL skew-kill: AQE's skew-join only splits
    * sort-merge partitions after a shuffle materializes, can't help a
    * broadcast-ineligible aggregation-feeding join mid-stage, and is
    * unavailable on some pipelines (e.g. streaming). Result is exactly
    * the plain inner join: each big row matches precisely the replica
    * carrying its salt. Cost: small side ×saltFactor (keep it small).
    *
    * `saltBy` defaults to `monotonically_increasing_id()` — fine for
    * batch, but REJECTED by Structured Streaming plans; streaming
    * callers pass any within-key-varying column (e.g. the event id:
    * `xxhash64($"event_id")`).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int,
                 saltBy: org.apache.spark.sql.Column = monotonically_increasing_id()): DataFrame = {
    require(saltFactor >= 1)
    val b = big.withColumn("__salt",
      pmod(saltBy, lit(saltFactor.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
