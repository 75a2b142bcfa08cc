package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Spatial

/** Pins the round-10 density toolkit: the sparsified-CC dbscanCluster
  * must remain EXACT DBSCAN (components are provably identical — this
  * spec checks it against a brute-force union-find on a multi-blob
  * fixture), the probe's integer bounds must match hand math, and the
  * capped variant must degrade to the exact labeler when the rate
  * saturates.
  */
class SpatialDensitySpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random dense point set: 300 points folded into
  // a 23×19 space — multi-cell blobs, cross-cell components, noise
  private val ptsSeq: Seq[(Long, Long, Long)] =
    (1L to 300L).map(i => (i, (i * 37) % 23, (i * 59) % 19))
  private val r = 2L
  private val minPts = 6

  private def bruteDbscan(): (Map[Long, Long], Map[Long, String]) = {
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._1 != b._1 && math.abs(a._2 - b._2) <= r && math.abs(a._3 - b._3) <= r
    val nb = ptsSeq.map(p => p._1 -> ptsSeq.filter(q => near(p, q)).map(_._1)).toMap
    val core = ptsSeq.map(_._1).filter(id => nb(id).size >= minPts).toSet
    // union-find over core-core in-radius edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val rt = find(parent(x)); parent(x) = rt; rt }
    for (c <- core; d <- nb(c) if core(d)) {
      val (rc, rd) = (find(c), find(d))
      if (rc != rd) parent(math.max(rc, rd)) = math.min(rc, rd)
    }
    val cluster = core.map(c => c -> core.filter(d => find(d) == find(c)).min).toMap
    val border = ptsSeq.map(_._1)
      .filter(id => !core(id) && nb(id).exists(core))
      .map(id => id -> nb(id).filter(core).map(cluster).min).toMap
    val roles = core.map(_ -> "core").toMap ++ border.keys.map(_ -> "border")
    (cluster ++ border, roles)
  }

  test("sparsified dbscanCluster == brute-force DBSCAN on a multi-blob fixture") {
    val (wantCluster, wantRole) = bruteDbscan()
    val got = Spatial.dbscanCluster(ptsSeq.toDF("id", "x", "y"),
        "id", "x", "y", r, minPts)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getString(2)))
    assert(got.map(_._1).toSet === wantRole.keySet)
    got.foreach { case (id, cl, role) =>
      assert(cl === wantCluster(id), s"cluster for $id")
      assert(role === wantRole(id), s"role for $id")
    }
    // the fixture must actually exercise sparsification: some component
    // must span multiple cells (else the witness path pinned nothing)
    val cells = ptsSeq.map(p => (p._1, (p._2 / r, p._3 / r))).toMap
    val multi = wantCluster.groupBy(_._2).values
      .exists(m => m.keys.map(cells).toSet.size > 1)
    assert(multi, "fixture degenerated to single-cell components")
  }

  test("negative coordinates: floor-div cells keep distant clusters apart (r=3)") {
    // Regression for the truncating-div cell bug: trunc(x/3) maps both
    // x=-2 and x=2 to cell 0 (a merged ±0 cell of width 2r-1), so the
    // intra-cell star would union these two clusters even though their
    // Chebyshev distance is 4 > r. Floor division puts them in cells
    // -1 and 0 with no in-radius cross pair → two components.
    val pts = Seq((1L, -2L, 0L), (2L, -2L, 1L), (3L, -2L, 2L),
      (4L, 2L, 0L), (5L, 2L, 1L), (6L, 2L, 2L)).toDF("id", "x", "y")
    val got = Spatial.dbscanCluster(pts, "id", "x", "y", r = 3L, minPts = 2)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(t => t._1 -> t._2).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
    assert(got.forall(_._3 == "core"))
  }

  test("negative coordinates: dbscanCluster == brute force on the shifted fixture") {
    // Chebyshev distance is translation-invariant, so shifting every
    // point by a negative offset must reproduce the unshifted result
    // exactly (same ids, same min-id cluster labels, same roles).
    val (wantCluster, wantRole) = bruteDbscan()
    val shifted = ptsSeq.map { case (i, x, y) => (i, x - 11L, y - 9L) }
    val got = Spatial.dbscanCluster(shifted.toDF("id", "x", "y"),
        "id", "x", "y", r, minPts)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getString(2)))
    assert(got.map(_._1).toSet === wantRole.keySet)
    got.foreach { case (id, cl, role) =>
      assert(cl === wantCluster(id), s"cluster for $id")
      assert(role === wantRole(id), s"role for $id")
    }
    // and the capped labeler with a saturating target still degrades to
    // the exact labeler on negative coordinates
    val capped = Spatial.dbscanCapped(shifted.toDF("id", "x", "y"),
        "id", "x", "y", r, minPts, targetMeanNb = 1000000L, salt = "t")
      .select("id", "n_nb", "label").as[(Long, Long, String)].collect().toSet
    val exact = Spatial.dbscanLabel(shifted.toDF("id", "x", "y"),
        "id", "x", "y", r, minPts)
      .as[(Long, Long, String)].collect().toSet
    assert(capped === exact)
  }

  test("densityProbe: exact integer bounds, rates, and the recommendation rule") {
    // 4 points in one r=2 cell + 1 far point: at r=2, cells {(0,0):4, (5,5):1};
    // no adjacent occupied cells → block9 = own cell.
    // nb_bound_sum = 4·3 + 1·0 = 12; mean_nb_ub = 12 div 5 = 2
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
      (5L, 10L, 10L)).toDF("id", "x", "y")
    val got = Spatial.densityProbe(pts, "id", "x", "y", Seq(2L), 4L)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2),
        rw.getLong(3), rw.getLong(4), rw.getLong(5), rw.getLong(6), rw.getBoolean(7)))
    assert(got.toSeq === Seq((2L, 5L, 2L, 4L, 12L, 2L, 1000000L, true)))
    // under-resolved space: target below every candidate's bound →
    // fall back to the smallest r, rate < 1e6
    val dense = (0L until 64L).map(i => (i, i % 8, i / 8)).toDF("id", "x", "y")
    val p2 = Spatial.densityProbe(dense, "id", "x", "y", Seq(1L, 4L), 2L)
      .collect().map(rw => (rw.getLong(0), rw.getLong(5), rw.getLong(6), rw.getBoolean(7)))
      .sortBy(_._1)
    assert(p2.forall(t => t._2 > 2L), "every bound above target")
    assert(p2.map(t => t._1 -> t._4).toMap === Map(1L -> true, 4L -> false),
      "saturation falls back to the smallest candidate")
    assert(p2.forall(t => t._3 < 1000000L))
  }

  test("probeAdvisory is BINDING by default: dense space raises, override or saturation proceeds") {
    // the r=1 dense 8x8 grid from the probe spec: every bound above a
    // target of 2 → rate < 1e6 → the default (binding) form must REFUSE
    val dense = (0L until 64L).map(i => (i, i % 8, i / 8)).toDF("id", "x", "y")
    val ex = intercept[IllegalStateException] {
      Spatial.probeAdvisory(dense, "id", "x", "y", r = 1L,
        targetMeanNb = 2L, queryTag = "spec-dense")
    }
    assert(ex.getMessage.contains("REFUSED") &&
      ex.getMessage.contains("dbscanCapped") &&
      ex.getMessage.contains("overrideDense"),
      s"refusal must name the capped twin and the override: ${ex.getMessage}")
    // explicit override: same dense space proceeds (advisory only)
    Spatial.probeAdvisory(dense, "id", "x", "y", r = 1L,
      targetMeanNb = 2L, queryTag = "spec-dense-override",
      overrideDense = true)
    // saturated rate (target >= bound): never refuses, no override needed
    Spatial.probeAdvisory(dense, "id", "x", "y", r = 1L,
      targetMeanNb = 1000000L, queryTag = "spec-saturated")
    // a laxer refuse threshold also lets a mildly-dense space through
    Spatial.probeAdvisory(dense, "id", "x", "y", r = 1L,
      targetMeanNb = 2L, queryTag = "spec-lax-threshold",
      refuseBelowPpm = 1L)
  }

  test("spatialAdvisory is BINDING by default: over-budget pair bound raises " +
    "with the forecast, override or in-budget proceeds") {
    // the r=1 dense 8x8 grid: nb_bound_sum = Σ n_c·(block9−1) with every
    // cell holding 1 point and interior blocks of 9 → pair bound ≫ 10
    val dense = (0L until 64L).map(i => (i, i % 8, i / 8)).toDF("id", "x", "y")
    val ex = intercept[IllegalStateException] {
      Spatial.spatialAdvisory(dense, "id", "x", "y", r = 1L,
        maxPairs = 10L, queryTag = "spec-pairs-dense")
    }
    assert(ex.getMessage.contains("REFUSED") &&
      ex.getMessage.contains("pairs") &&
      ex.getMessage.contains("rate_ppm=") &&
      ex.getMessage.contains("overridePairs"),
      s"refusal must carry the pair forecast, the sampled-rate " +
        s"alternative, and the override: ${ex.getMessage}")
    // the forecast in the raise is the exact closed form: interior 6x6
    // blocks see 8 neighbors, edges 5, corners 3 → Σ = 6·6·8+6·4·5+4·3
    // = 420 → 210 pairs
    assert(ex.getMessage.contains("<=210 pairs"),
      s"expected the exact 210-pair bound in: ${ex.getMessage}")
    // explicit override: same space proceeds (advisory only)
    Spatial.spatialAdvisory(dense, "id", "x", "y", r = 1L,
      maxPairs = 10L, queryTag = "spec-pairs-override", overridePairs = true)
    // within budget: proceeds with no override
    Spatial.spatialAdvisory(dense, "id", "x", "y", r = 1L,
      maxPairs = 1000L, queryTag = "spec-pairs-in-budget")
  }

  test("sampledPairs saturated budget == the full directed pair set; " +
    "engaged budget == full set restricted to sampled id_b") {
    import graft.operators.RangeJoin
    val pts = ptsSeq.toDF("id", "x", "y")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = snap(RangeJoin.gridNeighborJoinAB(pts, pts, "id", "x", "y", r))
    // budget >= pair bound: rate saturates, output IS the exact join
    val sat = Spatial.sampledPairs(pts, "id", "x", "y", r,
      maxPairs = 10000000L, salt = "spec")
    assert(sat.select("rate_ppm").distinct().as[Long].collect().toSeq
      === Seq(1000000L))
    assert(snap(sat) === full)
    // engaged budget: id_b restricted to the salted-hash sample, id_a
    // side untouched — the output is exactly the full set filtered to
    // sampled right endpoints (deterministic, oracle-replayable)
    val capped = Spatial.sampledPairs(pts, "id", "x", "y", r,
      maxPairs = 50L, salt = "spec")
    val rate = capped.select("rate_ppm").distinct().as[Long].collect()
    assert(rate.length === 1 && rate(0) < 1000000L && rate(0) > 0L)
    val thr = rate(0) * 4294967296L / 1000000L
    val sampledIds = pts.select(col("id"))
      .where(graft.functions.HashFunctions
        .hash32(col("id").cast("string"), "spec") < lit(thr))
      .as[Long].collect().toSet
    assert(snap(capped) === full.filter(p => sampledIds(p._2)))
    assert(snap(capped).nonEmpty && snap(capped).size < full.size,
      "the engaged cap must bite on the fixture")
    // overflow guard: a near-Long.Max budget must saturate, not wrap
    val big = Spatial.sampledPairs(pts, "id", "x", "y", r,
      maxPairs = Long.MaxValue / 2, salt = "spec")
    assert(big.select("rate_ppm").distinct().as[Long].collect().toSeq
      === Seq(1000000L))
  }

  test("dbscanCapped with a saturating target == dbscanLabel exactly") {
    val pts = ptsSeq.toDF("id", "x", "y")
    // target far above the fixture's mean degree → rate 1e6, every
    // point sampled, threshold unscaled
    val capped = Spatial.dbscanCapped(pts, "id", "x", "y", r, minPts,
        targetMeanNb = 1000000L, salt = "t")
      .select("id", "n_nb", "label")
      .as[(Long, Long, String)].collect().toSet
    val exact = Spatial.dbscanLabel(pts, "id", "x", "y", r, minPts)
      .as[(Long, Long, String)].collect().toSet
    assert(capped === exact)
  }

  test("dbscanCapped engaged cap: counts restricted to the hash sample, scaled threshold") {
    val pts = ptsSeq.toDF("id", "x", "y")
    val out = Spatial.dbscanCapped(pts, "id", "x", "y", r, minPts,
        targetMeanNb = 3L, salt = "t")
      .as[(Long, Boolean, Long, String)].collect()
    val sample = out.filter(_._2).map(_._1).toSet
    assert(sample.nonEmpty && sample.size < ptsSeq.size,
      s"cap must engage: sampled ${sample.size} of ${ptsSeq.size}")
    // recompute expectation brute-force given the emitted membership:
    // n_nb = sampled neighbors; threshold = minPts·rate div 1e6 (≥1);
    // the rate is re-derived from the same integer probe math
    val byId = ptsSeq.map(p => p._1 -> p).toMap
    def nbS(id: Long) = ptsSeq.filter { q =>
      val p = byId(id)
      q._1 != id && sample(q._1) &&
        math.abs(p._2 - q._2) <= r && math.abs(p._3 - q._3) <= r
    }.map(_._1)
    val cellOf = ptsSeq.map(p => p._1 -> (p._2 / r, p._3 / r)).toMap
    val cellN = ptsSeq.groupBy(p => cellOf(p._1)).view.mapValues(_.size.toLong).toMap
    val blockN = cellN.keys.map { c =>
      c -> cellN.filter(kv => math.abs(kv._1._1 - c._1) <= 1 &&
        math.abs(kv._1._2 - c._2) <= 1).values.sum
    }.toMap
    val nbBound = cellN.map { case (c, n) => n * (blockN(c) - 1) }.sum
    val meanUb = nbBound / ptsSeq.size
    val ratePpm = math.min(1000000L, 3L * 1000000L / (meanUb + 1))
    assert(ratePpm < 1000000L)
    val minPtsEff = math.max(1L, minPts * ratePpm / 1000000L)
    val cores = out.filter(o => o._2 && o._3 >= minPtsEff).map(_._1).toSet
    out.foreach { case (id, s, n, label) =>
      assert(n === nbS(id).size.toLong, s"sampled-neighbor count for $id")
      val want = if (s && n >= minPtsEff) "core"
        else if (nbS(id).exists(cores)) "border" else "noise"
      assert(label === want, s"label for $id")
    }
  }
}
