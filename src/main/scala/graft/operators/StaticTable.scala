package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Width pin for LOOP-STATIC tables that feed CPU-DENSE per-round
  * joins: one explicit full-width repartition on the round-join key,
  * then a lazy local checkpoint. The checkpointed blocks land 32-wide
  * (session parallelism) instead of whatever AQE's byte-based
  * coalescing left on the upstream exchange, so each round's scan +
  * shuffle-write of the static side runs at full width (measured r15:
  * the q_harmonic per-seed expansion join ran 8 tasks wide on 32
  * cores, 11.5 CPU-s inside one 3.9 s stage; pinned, q_harmonic
  * −0.4/−1.4 s and q_eccentricity −0.4/−1.3 s in two A/Bs).
  *
  * What this deliberately does NOT claim: exchange elimination. Under
  * AQE, a checkpointed leaf does not advertise its hash partitioning
  * (the adaptive plan's outputPartitioning is unknown at
  * LogicalRDD-creation time — verified r15 on Spark 4.1: per-round
  * joins re-exchange both lazy and eager checkpoints), so rounds still
  * shuffle this side; the lever is purely map-side width. For that
  * reason the pin belongs ONLY where the downstream join is CPU-dense
  * per byte: the same pin on the rank-propagation loops (pagerank /
  * label_prop / sssp / walks) was MEASURED A NET LOSS r15 (+0.3 to
  * +1.4 s each — their per-round joins are cheap per row, and the
  * up-front exchange never pays back).
  *
  * Scale posture: identity-shaped — at production width the
  * repartition moves the same bytes one extra time once, and the width
  * is the session's shuffle parallelism, not a constant.
  */
object StaticTable {

  def pinned(df: DataFrame, keys: Column*): DataFrame = {
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(nPart, keys: _*)
      .localCheckpoint(false)
  }
}
