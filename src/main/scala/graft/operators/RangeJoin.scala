package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the nested-loop trap.
  *
  * Spark plans a raw `p.v >= i.lo AND p.v < i.hi` theta join as a
  * broadcast-nested-loop (or cartesian) — quadratic work the moment the
  * interval side stops fitting in memory. This operator turns it into an
  * EQUI-join: chop the value domain into fixed-width buckets, explode
  * each interval onto every bucket it overlaps, map each point to its
  * bucket, hash-join on the bucket id, then apply the exact containment
  * predicate. The shuffle is keyed on the bucket id; per-bucket work is
  * points(bucket) × intervals(bucket), bounded by choosing `bucketWidth`
  * near the typical interval length (≈1–3 buckets per interval).
  */
object RangeJoin {

  /** FLOOR-division grid cell id for an integer coordinate column —
    * `floor(col / r)` in exact int64 arithmetic (`pmod` keeps the
    * remainder non-negative, so the subtraction lands on an exact
    * multiple of r and `div` never rounds). Truncating `div` alone is
    * WRONG here for negative coordinates: it merges cells −0 and +0
    * into one cell of width 2r−1, which silently breaks the
    * "same-cell ⇒ within Chebyshev r" invariant the sparsified-CC
    * consumers ([[graft.operators.Spatial.dbscanCluster]]) rely on —
    * for r ≥ 3 two same-cell points could be 2(r−1) > r apart. With
    * floor division every cell spans exactly r, any coordinate sign.
    */
  private[operators] def cell(colName: String, r: Long): Column =
    expr(s"($colName - pmod($colName, ${r}L)) div ${r}L")

  /** Join each point row to every interval row whose [lo, hi) contains
    * its value. Columns are referenced by name; both inputs keep all
    * their columns in the output.
    */
  /** Bucket ids an interval [lo, hi) overlaps, with the loud-failure
    * span guard. A bucketWidth far below the interval length would
    * silently explode each interval into millions of rows — fail loudly
    * instead; the guard lives INSIDE the sequence bound so column
    * pruning can't eliminate it. Inverted intervals (hi < lo) are empty
    * by the [lo, hi) contract and must yield zero buckets — Spark's
    * sequence(a, b) with b < a counts DOWN, which would explode |span|
    * rows of garbage. hi is exclusive but floor(hi/w) is included
    * anyway: the extra boundary bucket only ever ADDS candidates the
    * exact predicate drops.
    */
  private def bucketsFor(lo: Column, hi: Column, w: Column,
                         maxBucketsPerInterval: Int): Column = {
    val lob = floor(lo / w).cast("long")
    val hib = floor(hi / w).cast("long")
    val hibGuarded = when(hib - lob >= maxBucketsPerInterval,
      raise_error(concat(lit(s"range-join interval spans >= $maxBucketsPerInterval buckets; " +
        "raise bucketWidth or maxBucketsPerInterval — interval lo="), lo.cast("string")))
        .cast("long"))
      .otherwise(hib)
    when(hib < lob, array().cast("array<long>")).otherwise(sequence(lob, hibGuarded))
  }

  /** Join each point row to every interval row whose [lo, hi) contains
    * its value. Columns are referenced by name; both inputs keep all
    * their columns in the output. `equiKeys` names columns present on
    * BOTH sides that join as additional equi conditions (the keyed
    * range join — e.g. a point-in-time dimension lookup per business
    * key): they become part of the hash-join key alongside the bucket
    * id, so per-bucket fan-out divides by key cardinality.
    */
  def pointInInterval(points: DataFrame, pointVal: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double, maxBucketsPerInterval: Int = 4096,
                      equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0)
    val w = lit(bucketWidth)
    val pw = points.withColumn("__b", floor(col(pointVal) / w).cast("long"))
    val iw = intervals.withColumn("__b",
      explode(bucketsFor(col(loCol), col(hiCol), w, maxBucketsPerInterval)))
    pw.join(iw, "__b" +: equiKeys)
      .where(col(pointVal) >= col(loCol) && col(pointVal) < col(hiCol))
      .drop("__b")
  }

  /** Interval×interval overlap join — the other half of the standard
    * range-join pair: left [lLo, lHi) joins right [rLo, rHi) when the
    * two half-open intervals overlap. Same bucket scheme as
    * [[pointInInterval]]: both sides explode onto the buckets they span,
    * hash-join on the bucket id, exact overlap predicate after. A pair
    * overlapping across several shared buckets is emitted exactly ONCE
    * without a distinct shuffle: the match is attributed to the single
    * bucket containing the overlap's start, `floor(max(lLo, rLo)/w)` —
    * every overlapping pair shares that bucket by construction, so no
    * candidates are lost either. Column names must not collide across
    * the two inputs (alias before calling).
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Double, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0)
    val w = lit(bucketWidth)
    val lw = left.withColumn("__b",
      explode(bucketsFor(col(lLo), col(lHi), w, maxBucketsPerInterval)))
    val rw = right.withColumn("__b",
      explode(bucketsFor(col(rLo), col(rHi), w, maxBucketsPerInterval)))
    lw.join(rw, "__b")
      // the strict-inequality pair only means "overlap" for NON-empty
      // intervals: [5,5) vs [3,7) passes lLo<rHi && rLo<lHi but contains
      // no points — empty (lo >= hi) intervals must match nothing
      .where(col(lLo) < col(lHi) && col(rLo) < col(rHi) &&
        col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__b") === floor(greatest(col(lLo), col(rLo)) / w).cast("long"))
      .drop("__b")
  }

  /** Spatial self-join: all point pairs within Chebyshev (L∞) radius
    * `r` on an integer grid — the proximity join behind co-location
    * analytics and spatial dedup, as a GRID-BUCKETED equi-join (the 2-D
    * sibling of the interval buckets above, and the same
    * bucket-don't-theta philosophy as every join in this file).
    *
    * Cell size = r: a point's neighbors within r live in its 3×3 cell
    * block, so ONE side replicates ×9 to its block and the other keys
    * on its own cell — each candidate pair meets exactly once (the
    * right side's cell is unique), then the exact |dx|,|dy| filter
    * decides. Work is bounded by points-per-cell density, never a
    * cartesian; a hot cell is ordinary equi-join skew (AQE). Cell ids
    * are exact-integer FLOOR division ([[cell]]), so coordinates of
    * any sign are safe. Emits (id_a, id_b, dx, dy), id_a < id_b.
    */
  /** Pin a fan-out join input's partitioning at the session's configured
    * shuffle parallelism. AQE's partition coalescing sizes partitions by
    * INPUT bytes, but a grid join's output fans out ~density× its input
    * — measured r12 at sf10: the 18 M-row probe side coalesced to 4
    * tasks carrying a 10.9 B-row output, pinning a 32-thread machine at
    * load 4 for the whole join. An explicit fixed-N repartition on the
    * join key is the documented opt-out: the join sees both sides
    * already distributed (no extra exchange) and AQE leaves the count
    * alone. N is the session's shuffle.partitions — the knob the
    * cluster owner already sizes to the hardware.
    */
  private def pinned(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      keys: _*)

  def gridNeighborJoin(pts: DataFrame, idCol: String, xCol: String,
                       yCol: String, r: Long): DataFrame = {
    require(r >= 1)
    val p = pts.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val right = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      cell("x", r).as("cx"), cell("y", r).as("cy"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("ox"), lit(dy.toLong).as("oy"))
    val left = p.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        cell("x", r).as("bx"), cell("y", r).as("by"),
        explode(array(offsets: _*)).as("o"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("bx") + col("o.ox")).as("cx"), (col("by") + col("o.oy")).as("cy"))
    pinned(left, col("cx"), col("cy"))
      .join(pinned(right, col("cx"), col("cy")).hint("shuffle_hash"),
        Seq("cx", "cy"))
      .where(col("id_a") < col("id_b") &&
        abs(col("xa") - col("xb")) <= r && abs(col("ya") - col("yb")) <= r)
      .select(col("id_a"), col("id_b"),
        (col("xb") - col("xa")).as("dx"), (col("yb") - col("ya")).as("dy"))
  }

  /** Asymmetric grid neighbor join: every (a ∈ ptsA, b ∈ ptsB, a ≠ b)
    * pair within Chebyshev radius `r`, each ordered pair exactly once
    * (B keys on its own cell, A replicates ×9 to its block — the same
    * meet-once argument as [[gridNeighborJoin]] without the id order
    * constraint). This is the probe/index split the density-capped
    * DBSCAN needs: A = every point, B = the bounded sample, so the
    * pair volume is |A|·(sampled density) — LINEAR in |A| at a fixed
    * density target, however dense the raw space grows.
    */
  def gridNeighborJoinAB(ptsA: DataFrame, ptsB: DataFrame, idCol: String,
                         xCol: String, yCol: String, r: Long): DataFrame = {
    require(r >= 1)
    val b = ptsB.select(col(idCol).cast("long").as("id_b"),
      col(xCol).cast("long").as("xb"), col(yCol).cast("long").as("yb"))
      .withColumn("cx", cell("xb", r))
      .withColumn("cy", cell("yb", r))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("ox"), lit(dy.toLong).as("oy"))
    val a = ptsA.select(col(idCol).cast("long").as("id_a"),
        col(xCol).cast("long").as("xa"), col(yCol).cast("long").as("ya"),
        explode(array(offsets: _*)).as("o"))
      .select(col("id_a"), col("xa"), col("ya"),
        (cell("xa", r) + col("o.ox")).as("cx"),
        (cell("ya", r) + col("o.oy")).as("cy"))
    pinned(a, col("cx"), col("cy"))
      .join(pinned(b, col("cx"), col("cy")).hint("shuffle_hash"),
        Seq("cx", "cy"))
      .where(col("id_a") =!= col("id_b") &&
        abs(col("xa") - col("xb")) <= r && abs(col("ya") - col("yb")) <= r)
      .select(col("id_a"), col("id_b"))
  }

  /** [[gridNeighborJoin]] variant that also emits both endpoints' cell
    * ids — the input to connectivity-preserving edge sparsification
    * (same-cell points are mutually in-radius at cell width r, so CC
    * consumers can collapse in-cell cliques to stars and cross-cell
    * edge bundles to one witness per cell pair; see
    * [[graft.operators.Spatial.dbscanCluster]]).
    */
  def gridNeighborJoinWithCells(pts: DataFrame, idCol: String, xCol: String,
                                yCol: String, r: Long): DataFrame = {
    require(r >= 1)
    val p = pts.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val right = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      cell("x", r).as("cx"), cell("y", r).as("cy"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("ox"), lit(dy.toLong).as("oy"))
    val left = p.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        cell("x", r).as("bx"), cell("y", r).as("by"),
        explode(array(offsets: _*)).as("o"))
      .select(col("id_a"), col("xa"), col("ya"), col("bx"), col("by"),
        (col("bx") + col("o.ox")).as("cx"), (col("by") + col("o.oy")).as("cy"))
    pinned(left, col("cx"), col("cy"))
      .join(pinned(right, col("cx"), col("cy")).hint("shuffle_hash"),
        Seq("cx", "cy"))
      .where(col("id_a") < col("id_b") &&
        abs(col("xa") - col("xb")) <= r && abs(col("ya") - col("yb")) <= r)
      .select(col("id_a"), col("id_b"),
        col("bx").as("cax"), col("by").as("cay"),
        col("cx").as("cbx"), col("cy").as("cby"))
  }
}
