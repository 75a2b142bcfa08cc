package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over a bipartite affiliation graph: score entity
  * pairs by how many wedge-centers they share (common-neighbor count)
  * and by exact Jaccard over their center sets — "suppliers that sell
  * the same parts", "documents citing the same sources", the classic
  * candidate generator for recommendations and entity resolution.
  *
  * The wedge enumeration is the one quadratic step (a center of degree
  * d emits d·(d−1)/2 pairs), so hub centers are dropped FIRST by a
  * degree cap — exactly what production link prediction does, because a
  * center shared by everyone carries no signal while dominating the
  * fan-out. With the cap, per-center work is ≤ maxDeg², the self-join
  * is a plain equi-join on the center key (never a theta join), and the
  * pair aggregate is a long-pair-keyed shuffle with map-side partial
  * counts. All scores are exact integers (ppm), so results are
  * bit-identical on any engine or partitioning.
  */
object LinkPredict {

  /** Score all entity pairs sharing ≥ minCommon centers of degree ≤
    * maxDeg. Input `edges` = (entity `u`, center `w`) affiliation
    * pairs (duplicates fine — de-duplicated here). Degrees and Jaccard
    * are computed on the hub-filtered graph, so the score is the plain
    * Jaccard of the filtered center sets: jaccard_ppm = n_common·10⁶
    * div (d_a + d_b − n_common). Emits (u_a < u_b, n_common,
    * jaccard_ppm).
    */
  def scores(edges: DataFrame, maxDeg: Int, minCommon: Long): DataFrame = {
    require(maxDeg >= 2 && minCommon >= 1)
    val e = edges.select(col("u").cast("long").as("u"),
      col("w").cast("long").as("w")).distinct()
    val keptCenters = e.groupBy("w").agg(count(lit(1)).as("cd"))
      .where(col("cd") <= maxDeg).select("w")
    // lazy localCheckpoint: the filtered edge list is read three times
    // (degrees + both wedge-join sides) — dedup + hub filter run once
    val k = e.join(keptCenters, Seq("w")).localCheckpoint(false)
    val deg = k.groupBy("u").agg(count(lit(1)).as("d"))
    val cn = k.as("a").join(k.as("b"),
        col("a.w") === col("b.w") && col("a.u") < col("b.u"))
      .groupBy(col("a.u").as("u_a"), col("b.u").as("u_b"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
    cn.join(deg.select(col("u").as("u_a"), col("d").as("d_a")), Seq("u_a"))
      .join(deg.select(col("u").as("u_b"), col("d").as("d_b")), Seq("u_b"))
      .select(col("u_a"), col("u_b"), col("n_common"),
        expr("n_common * 1000000L div (d_a + d_b - n_common)")
          .as("jaccard_ppm"))
  }
}
