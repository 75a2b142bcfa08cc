package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density classification over a point set — the DBSCAN core/border/
  * noise split, which at corpus scale is the standard density filter
  * over an (quantized) embedding space: keep dense-region documents,
  * drop isolated outliers, or invert it to prune over-represented
  * regions before training.
  *
  * All pair discovery goes through [[RangeJoin.gridNeighborJoin]] — a
  * grid-bucketed equi-join, never a theta join — so the only shuffles
  * here are keyed on compact long ids and work stays bounded by
  * points-per-cell density however large the point set grows.
  */
object Spatial {

  /** Label every point `core` (≥ minPts neighbors within Chebyshev
    * radius `r`, self excluded), `border` (not core but adjacent to a
    * core), or `noise`, alongside its exact neighbor count.
    *
    * Three bounded stages: (1) the grid join emits each in-radius pair
    * once; (2) one aggregate on the symmetrized edge list counts
    * neighbors per point (map-side partial count, long-keyed shuffle);
    * (3) border detection is a plain equi-join of the edge list against
    * the core id set — at realistic densities the core set after
    * projection to a bare id column is small enough that AQE broadcasts
    * it. No stage ever materializes more than the edge list the radius
    * itself implies.
    */
  def dbscanLabel(pts: DataFrame, idCol: String, xCol: String,
                  yCol: String, r: Long, minPts: Int): DataFrame = {
    require(minPts >= 1)
    // lazy localCheckpoint: the pair list is read by both the neighbor
    // count and the border-detection join — one grid join, not two
    val pairs = RangeJoin.gridNeighborJoin(pts, idCol, xCol, yCol, r)
      .localCheckpoint(false)
    // each undirected pair once from the join → both directions for
    // per-point counting (cheap select+union, no extra shuffle yet)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val cnt = sym.groupBy("id").agg(count(lit(1)).as("n_nb"))
    val withCnt = pts.select(col(idCol).cast("long").as("id"))
      .join(cnt, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_nb"), lit(0L)).as("n_nb"))
    val coreIds = withCnt.where(col("n_nb") >= minPts)
      .select(col("id").as("nb"))
    val hasCoreNb = sym.join(coreIds, Seq("nb")).select("id").distinct()
      .withColumn("has_core_nb", lit(true))
    withCnt.join(hasCoreNb, Seq("id"), "left")
      .select(col("id"), col("n_nb"),
        when(col("n_nb") >= minPts, lit("core"))
          .when(col("has_core_nb"), lit("border"))
          .otherwise(lit("noise")).as("label"))
  }

  /** Full DBSCAN cluster assignment: connected components over the
    * core–core in-radius graph (cluster id = smallest core id in the
    * component, via [[Dedup.clusters]]' checkpointed min-label loop),
    * then each border point attaches to the smallest cluster id among
    * its core neighbors — the standard deterministic tie-break for the
    * inherently order-dependent border rule. Noise points are dropped.
    *
    * Emits (id, cluster, role ∈ core|border). A core with no core
    * neighbor is still its own singleton cluster (the CC loop only sees
    * nodes with edges, so singletons are coalesced back to themselves).
    */
  def dbscanCluster(pts: DataFrame, idCol: String, xCol: String,
                    yCol: String, r: Long, minPts: Int): DataFrame = {
    require(minPts >= 1)
    // lazy localCheckpoint: the pair list feeds core detection, the
    // core-core edge build AND border attachment — without a reuse
    // point the grid join would recompute per branch (same tradeoff as
    // Triangles; the CC loop inside keeps its own reliable checkpoints)
    val pairs = RangeJoin.gridNeighborJoin(pts, idCol, xCol, yCol, r)
      .localCheckpoint(false)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val coreIds = sym.groupBy("id").agg(count(lit(1)).as("n_nb"))
      .where(col("n_nb") >= minPts).select("id")
      .localCheckpoint(false)
    // pair graph restricted to core×core: two long-keyed equi-joins
    val corePairs = pairs
      .join(coreIds.select(col("id").as("id_a")), Seq("id_a"))
      .join(coreIds.select(col("id").as("id_b")), Seq("id_b"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    // doubling: a grid graph's core-core component diameter grows with
    // the grid, so one-hop propagation (diameter rounds) is the wrong
    // loop here — path halving converges in O(log diameter) rounds
    val cc = Dedup.clusters(corePairs, doubling = true)
      .select(col("doc_id").as("id"), col("cluster_id").as("cluster"))
    val coreClusters = coreIds.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val borderClusters = sym
      .join(coreClusters.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .join(coreIds, Seq("id"), "left_anti")
      .groupBy("id").agg(min(col("cluster")).as("cluster"))
    coreClusters.withColumn("role", lit("core"))
      .unionByName(borderClusters.withColumn("role", lit("border")))
  }
}
