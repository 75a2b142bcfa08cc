package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-round bench noise canary (VERDICT r13 task #4: two rounds
  * running, cross-round walls were declared incomparable on "session
  * conditions" — an unfalsifiable explanation without a reference).
  *
  * A FIXED CPU+shuffle workload, independent of every operator and of
  * the testdata tables (`spark.range` synthesizes its input), run at
  * the START and END of every full bench capture. Cross-round deltas
  * on real queries are then read AGAINST the canary ratio: if the
  * canary moved +20% too, the shift is session conditions; if the
  * canary held and a query moved, the query regressed. Two stamps per
  * capture also expose WITHIN-capture drift (thermal, competing load
  * arriving mid-run).
  *
  * ==== FROZEN — NEVER EDIT THIS WORKLOAD ====
  * The canary's value is that its code is identical in every round.
  * Any change (constants included) invalidates every cross-round
  * normalization that uses it; if a different reference is ever
  * needed, ADD canary2 and keep this one.
  *
  * Shape: 8M md5 hashes (codegen CPU), a 65 536-key groupBy (one real
  * shuffle with partial aggregation), a self-equi-join on the group
  * digests (hash join + second shuffle), and a final 1-row aggregate.
  * ~3–6 s at local[32] idle; deterministic output (checked — a wrong
  * checksum means the canary itself is broken, so its time is void).
  */
object Canary {
  def run(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    val base = spark.range(8000000L)
      .select(col("id"), md5(concat(lit("graft-canary:"), col("id"))).as("h"))
      .withColumn("k", substring(col("h"), 1, 4))
    val grouped = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("mx"))
    val out = grouped.as("a")
      .join(grouped.select(col("k").as("k2"), col("n").as("n2")),
        col("a.k") === col("k2"))
      .agg(sum(col("n") * col("n2")).as("s"), count(lit(1)).as("c"))
      .head()
    val elapsed = (System.nanoTime() - t0) / 1e9
    require(out.getLong(1) == 65536L,
      s"canary output drifted (${out.getLong(1)} groups) — time is void")
    elapsed
  }
}
