package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list, in FIXED-POINT INT64 units.
  *
  * Floating-point PageRank is summation-order-dependent: a distributed
  * sum of double contributions differs in ulps from run to run and engine
  * to engine, and iteration compounds the divergence. Ranks here are
  * integer "mass units" (`unit` = 1e12 ≈ total mass 1.0): every transfer
  * is an integer floor-division, every combine an exact int64 sum, so the
  * result is bit-identical on any partitioning, any engine, any scale —
  * the property that makes a distributed iterative computation testable
  * against an independent oracle at all. (The floor discards < 1e-10 of
  * mass per hop — far below any ranking-relevant difference.)
  *
  * Each iteration is one join (ranks ⋈ edges, both keyed on the node id)
  * + one aggregate (sum per destination) + one left join back to the node
  * set for no-inbound nodes — the same bounded-shuffle shape per round as
  * [[Dedup.clusters]]. Degrees are computed once. With damping d=85/100:
  *
  *   pr'(v) = 15·unit/(100·N) + (85·D) div (100·N)
  *          + Σ_{u→v} (pr(u)·85) div (100·deg(u))
  *
  * where D is the DANGLING mass — the summed rank of nodes with no
  * outbound edge. Standard PageRank redistributes that mass uniformly;
  * silently dropping it (what a naive edges-join does) deflates every
  * rank on any graph with sinks. D is an exact int64 sum and its
  * per-node share an integer floor-division, so determinism is
  * preserved. On a sink-free graph D = 0 and the term vanishes.
  */
object PageRank {

  val MassUnit: Long = 1000000000000L

  /** `edges` must have long columns (`src`, `dst`). Returns (node, pr)
    * after `iters` rounds from a uniform start. Node set = src ∪ dst.
    *
    * `checkpointRounds=false` skips the per-round lazy checkpoint so a
    * test can inspect the fully unrolled plan; production callers keep
    * the default (without it the doubly-referenced round aggregate makes
    * the logical plan grow 2^iters).
    */
  def pageRank(edges: DataFrame, iters: Int,
               checkpointRounds: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    // the caller's edge derivation (often a join+distinct itself) feeds
    // FOUR consumers (node set ×2, degrees, degree-joined edges) across
    // more than one job; checkpointing it makes every consumer read the
    // materialized blocks instead of re-running the derivation
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false)
    // nodes is referenced iters+1 times and edges-with-degrees iters
    // times; lazy localCheckpoints truncate the shared lineage so the
    // edge derivation runs ONCE per action instead of once per reference
    // (on a long-running cluster job swap for reliable checkpoint() /
    // a table write — same contract as Dedup.clusters)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesWithDeg = e.join(deg, "src").localCheckpoint(false)
    // N via broadcast 1-row aggregate — the scalar reaches every task
    // without a driver round-trip, and the plan stays fully lazy
    val n = nodes.agg(count(lit(1)).as("nn"))
    // Plan-choice probe, ONE bounded job (limit-1 semantics): a
    // sink-free graph — the overwhelmingly common case for symmetric /
    // co-occurrence graphs — needs neither the dangling-mass scalar nor
    // the per-round checkpoint, and skipping both keeps the whole
    // iteration a single pipelined job. The probe's inputs are exactly
    // the checkpointed node/degree tables every round reuses, so its
    // work is pre-materialization, not waste.
    val hasSinks = !nodes
      .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
      .isEmpty
    var ranks = nodes.join(broadcast(n))
      .select(col("node"), expr(s"${MassUnit}L div nn").as("pr"))
    // With sinks present, dangling mass is collected in the SAME pass as
    // the contribution join: ranks LEFT JOIN edges — matched rows emit
    // the per-edge transfer, unmatched rows (no outbound edge) emit
    // their whole rank into a sentinel group. One scan of ranks, one
    // join, one aggregate per round; no second pass for the sinks. Node
    // ids must not equal Long.MinValue (the sentinel) — impossible for
    // the non-negative ids real graphs use.
    val Sentinel = Long.MinValue
    for (_ <- 1 to iters) {
      if (!hasSinks) {
        val contribs = edgesWithDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), expr("(pr * 85L) div (100L * deg)").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("inbound"))
        ranks = nodes.join(broadcast(n))
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (expr(s"(15L * ${MassUnit}L) div (100L * nn)")
              + coalesce(col("inbound"), lit(0L))).as("pr"))
      } else {
        // the round's aggregate is consumed twice (dangling scalar +
        // assembly join); the lazy checkpoint makes both consumers share
        // one computation and keeps the iterated plan from nesting (same
        // contract as the nodes/edges checkpoints above)
        val agg0 = ranks
          .join(edgesWithDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(coalesce(col("dst"), lit(Sentinel)).as("gnode"),
            when(col("dst").isNull, col("pr"))
              .otherwise(expr("(pr * 85L) div (100L * deg)")).as("c"))
          .groupBy(col("gnode").as("node")).agg(sum(col("c")).as("inbound"))
        val cagg = if (checkpointRounds) agg0.localCheckpoint(false) else agg0
        // 1-row broadcast scalar, same pattern as `n` — no driver action
        val dmass = cagg.where(col("node") === Sentinel)
          .agg(coalesce(sum(col("inbound")), lit(0L)).as("dm"))
        ranks = nodes.join(broadcast(n)).join(broadcast(dmass))
          .join(cagg.where(col("node") =!= Sentinel), Seq("node"), "left")
          .select(col("node"),
            (expr(s"(15L * ${MassUnit}L) div (100L * nn)")
              + expr("(85L * dm) div (100L * nn)")
              + coalesce(col("inbound"), lit(0L))).as("pr"))
      }
    }
    ranks
  }

  /** Edge-WEIGHTED PageRank: transition probability ∝ edge weight
    * instead of 1/degree — the variant for trading volumes, link
    * frequencies, co-occurrence counts. `edges` must have long columns
    * (`src`, `dst`, `w`) with strictly positive weights; each round's
    * per-edge transfer is `(pr·85·w) div (100·Σw_src)` — the weighted
    * share of the damped rank, exact int64 under the documented bound
    * `max_w · MassUnit · 85 < 2⁶³` (max_w ≤ ~10⁵; weights are relative
    * per source, so pre-dividing heavy weight columns by a constant
    * loses nothing). Same distributed shape, checkpoint discipline,
    * sink handling (single-pass sentinel-group dangling collection) and
    * determinism contract as [[pageRank]]; parallel edges are legal and
    * contribute additively.
    */
  def pageRankWeighted(edges: DataFrame, iters: Int,
                       checkpointRounds: Boolean = true): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val wdeg = e.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val edgesWithW = e.join(wdeg, "src").localCheckpoint(false)
    val n = nodes.agg(count(lit(1)).as("nn"))
    val hasSinks = !nodes
      .join(wdeg.select(col("src").as("node")), Seq("node"), "left_anti")
      .isEmpty
    var ranks = nodes.join(broadcast(n))
      .select(col("node"), expr(s"${MassUnit}L div nn").as("pr"))
    val Sentinel = Long.MinValue
    for (_ <- 1 to iters) {
      if (!hasSinks) {
        val contribs = edgesWithW
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            expr("(pr * 85L * w) div (100L * wsum)").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("inbound"))
        ranks = nodes.join(broadcast(n))
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (expr(s"(15L * ${MassUnit}L) div (100L * nn)")
              + coalesce(col("inbound"), lit(0L))).as("pr"))
      } else {
        val agg0 = ranks
          .join(edgesWithW.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(coalesce(col("dst"), lit(Sentinel)).as("gnode"),
            when(col("dst").isNull, col("pr"))
              .otherwise(expr("(pr * 85L * w) div (100L * wsum)")).as("c"))
          .groupBy(col("gnode").as("node")).agg(sum(col("c")).as("inbound"))
        val cagg = if (checkpointRounds) agg0.localCheckpoint(false) else agg0
        val dmass = cagg.where(col("node") === Sentinel)
          .agg(coalesce(sum(col("inbound")), lit(0L)).as("dm"))
        ranks = nodes.join(broadcast(n)).join(broadcast(dmass))
          .join(cagg.where(col("node") =!= Sentinel), Seq("node"), "left")
          .select(col("node"),
            (expr(s"(15L * ${MassUnit}L) div (100L * nn)")
              + expr("(85L * dm) div (100L * nn)")
              + coalesce(col("inbound"), lit(0L))).as("pr"))
      }
    }
    ranks
  }

  /** k-core peeling, fixed rounds: repeatedly drop nodes whose degree in
    * the SURVIVING subgraph is below k — round r's survivors are a sound
    * over-approximation of the k-core that tightens monotonically, and on
    * real graphs a handful of rounds reaches the fixed point (run to
    * convergence by checking the survivor count between rounds when
    * exactness matters; fixed rounds keep the plan static and
    * oracle-replayable). Undirected: pass both arc directions. One
    * degree aggregate + one semi-join per round, edges checkpointed
    * once. Returns surviving (node, deg) after `rounds`.
    */
  def kCorePeel(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false)
    var deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      val keep = deg.where(col("deg") >= k).select(col("node"))
        .localCheckpoint(false)
      e = e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(false)
      deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    }
    deg.where(col("deg") >= k)
  }

  /** HITS hubs & authorities, UNNORMALIZED fixed-iteration form: with
    * hub₀ = 1, each round sets auth(v) = Σ_{u→v} hub(u) then
    * hub(u) = Σ_{u→v} auth(v) — pure int64 sums, engine-identical (the
    * usual per-round L2 normalization is what forces floats; rankings
    * are normalization-invariant, so the integer form preserves exactly
    * the information HITS exists for). Growth bound: values multiply by
    * ≤ maxdeg² per round — keep `2·iters·log₂(maxdeg) < 63` (3 rounds
    * on a ≤2000-degree graph peaks ~10¹³). Two keyed join+aggregate
    * passes per round over the same checkpointed edge table.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    var hub = nodes.select(col("node"), lit(1L).as("hub"))
    var auth = nodes.select(col("node"), lit(0L).as("auth"))
    for (_ <- 1 to iters) {
      auth = nodes.join(
          e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("a")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0L)).as("auth"))
        .localCheckpoint(false)
      hub = nodes.join(
          e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node")).agg(sum(col("auth")).as("h")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0L)).as("hub"))
        .localCheckpoint(false)
    }
    hub.join(auth, "node")
  }

  /** Personalized PageRank: teleport (and dangling mass) go to the SEED
    * set instead of uniformly everywhere — proximity-to-seeds scoring,
    * the recommendation/expansion primitive ("rank everything by
    * closeness to these accounts/documents"). Same fixed-point int64
    * arithmetic, same one-join-one-aggregate round shape as [[pageRank]];
    * the only changes are the start vector (uniform over seeds) and the
    * teleport term (seeds only):
    *
    *   pr'(v) = [v∈S]·(15·unit + 85·D) div (100·|S|) + Σ_{u→v} transfer
    *
    * Seeds outside the graph's node set are ignored (they could never
    * receive mass anyway); `seeds`' first column is the node id. The
    * surviving seed set must be NON-EMPTY — an empty (or fully
    * out-of-graph) seed set would make every `div ns` null and return
    * all-null ranks, so it fails fast with one cheap isEmpty probe
    * (which doubles as the materializer of the seed checkpoint every
    * later round reuses).
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                           checkpointRounds: Boolean = true): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesWithDeg = e.join(deg, "src").localCheckpoint(false)
    val sd = seeds.select(col(seeds.columns.head).cast("long").as("node")).distinct()
      .join(nodes, "node").withColumn("__seed", lit(1L))
      .localCheckpoint(false)
    require(!sd.isEmpty,
      "personalizedPageRank: seed set is empty after intersecting with the " +
        "graph's nodes — every rank would be null; pass at least one in-graph seed")
    val ns = sd.agg(count(lit(1)).as("ns"))
    val hasSinks = !nodes
      .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
      .isEmpty
    val Sentinel = Long.MinValue
    var ranks = nodes.join(sd, Seq("node"), "left").join(broadcast(ns))
      .select(col("node"),
        when(col("__seed").isNotNull, expr(s"${MassUnit}L div ns"))
          .otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iters) {
      if (!hasSinks) {
        val contribs = edgesWithDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), expr("(pr * 85L) div (100L * deg)").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("inbound"))
        ranks = nodes.join(sd, Seq("node"), "left").join(broadcast(ns))
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (when(col("__seed").isNotNull,
              expr(s"(15L * ${MassUnit}L) div (100L * ns)")).otherwise(lit(0L))
              + coalesce(col("inbound"), lit(0L))).as("pr"))
      } else {
        val agg0 = ranks
          .join(edgesWithDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(coalesce(col("dst"), lit(Sentinel)).as("gnode"),
            when(col("dst").isNull, col("pr"))
              .otherwise(expr("(pr * 85L) div (100L * deg)")).as("c"))
          .groupBy(col("gnode").as("node")).agg(sum(col("c")).as("inbound"))
        val cagg = if (checkpointRounds) agg0.localCheckpoint(false) else agg0
        val dmass = cagg.where(col("node") === Sentinel)
          .agg(coalesce(sum(col("inbound")), lit(0L)).as("dm"))
        ranks = nodes.join(sd, Seq("node"), "left").join(broadcast(ns))
          .join(broadcast(dmass))
          .join(cagg.where(col("node") =!= Sentinel), Seq("node"), "left")
          .select(col("node"),
            (when(col("__seed").isNotNull,
              expr(s"(15L * ${MassUnit}L) div (100L * ns)")
                + expr("(85L * dm) div (100L * ns)")).otherwise(lit(0L))
              + coalesce(col("inbound"), lit(0L))).as("pr"))
      }
    }
    ranks
  }
}
