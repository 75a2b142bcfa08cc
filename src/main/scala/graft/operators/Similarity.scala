package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H, VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForceTopK` is the exact kernel: queries × corpus with a top-k
  * window. It is intended for a *bounded* query set (or as the in-bucket
  * scorer); the scale path is [[lshTopK]], which restricts each query's
  * candidates to vectors sharing a hyperplane-LSH band, so the join fans
  * out per-bucket instead of per-corpus.
  */
object Similarity {

  /** Per-row LSH band values: `planes` sign-bits of hyperplane dots,
    * packed into `bands` integers of planes/bands bits each. The planes
    * are md5-derived constants ([[H.hyperplaneWeights]]) baked into the
    * plan as literals — fully codegen'd, zero joins, reproducible in SQL.
    */
  def hyperplaneBands(emb: DataFrame, idCol: String, vecCol: String,
                      planes: Int, bands: Int, dims: Int): DataFrame = {
    val rows = planes / bands
    val ws = H.hyperplaneWeights(planes, dims)
    // one codegen'd DotProduct loop per plane against a literal weight
    // array — all sign bits evaluated inside a single codegen stage
    val bits: Seq[Column] =
      ws.map(w => when(V.dotConst(col(vecCol), w) >= 0, lit(1L)).otherwise(lit(0L)))
    val bandvals = (0 until bands).map { b =>
      (0 until rows).map(r => bits(b * rows + r) * lit(1L << r)).reduce(_ + _)
    }
    emb.select(col(idCol), col(vecCol), array(bandvals: _*).as("bandvals"))
  }

  /** Exact cosine top-k for each query row against the whole corpus.
    * Rank order is total — (cosine desc, neighbor id asc) — so results are
    * reproducible across engines. Self-matches are excluded.
    *
    * This is deliberately a queries × corpus product, so the query side
    * MUST be bounded: `maxQueries` is enforced INSIDE the plan — a 1-row
    * guard (count over a limit-probe reading at most maxQueries+1 rows,
    * `raise_error` past the bound) broadcast-joined into the product — so
    * passing the whole corpus as queries fails loudly at execution, while
    * merely composing/explaining the query stays lazy and launches no job.
    * The query side is broadcast so the corpus never shuffles.
    * Corpus-scale query sets belong on [[lshTopK]].
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int, maxQueries: Int = 100000): DataFrame = {
    require(k > 0, "k must be positive")
    val guard = broadcast(queries.limit(maxQueries + 1).groupBy().count()
      .select(when(col("count") > maxQueries, raise_error(concat(
          lit(s"bruteForceTopK query side exceeds maxQueries=$maxQueries rows — " +
            "this kernel is for bounded query sets; use lshTopK for corpus-scale queries"))))
        .otherwise(lit(1)).as("__guard_ok")))
    // norms are computed once per row map-side; per-pair work is a single
    // dot fold (bit-identical to folding the norm per pair, 3x cheaper)
    // the filter keeps __guard_ok referenced so column pruning can never
    // drop the raise_error; the predicate is attribute-bound, not foldable
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      V.norm(col(vecCol)).as("qn")).crossJoin(guard)
      .where(col("__guard_ok") === lit(1)).drop("__guard_ok"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      V.norm(col(vecCol)).as("nn"))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(V.dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long")).where(col("rnk") <= k)
  }

  /** IVF cell id: argmax over centroid dot products (deterministic
    * tie-break: lowest centroid index wins). The centroids are plan
    * literals — assignment is a map-side codegen'd expression, no join.
    */
  def ivfCell(vecCol: Column, cents: Int, dims: Int): Column = {
    val ws = H.centroidWeights(cents, dims)
    val dots = ws.map(w => V.dotConst(vecCol, w))
    val m = greatest(dots: _*)
    dots.zipWithIndex.foldRight(lit(cents - 1)) { case ((d, i), rest) =>
      when(d === m, lit(i)).otherwise(rest)
    }
  }

  /** IVF-style ANN: corpus is coarse-quantized into `cents` cells; each
    * query searches only its own cell (nprobe=1). Exact cosine + total-
    * order rank within the cell. Cells are the unit of data placement at
    * scale: partition/bucket the corpus by cell and each query touches
    * one partition instead of the corpus — the classic inverted-file
    * layout, expressed as one equi-join on the cell id.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, cents: Int = 8, dims: Int = 64): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      V.norm(col(vecCol)).as("qn"), ivfCell(col(vecCol), cents, dims).as("cell"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      V.norm(col(vecCol)).as("nn"), ivfCell(col(vecCol), cents, dims).as("cell"))
    val scored = q.join(c, "cell")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(V.dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long")).where(col("rnk") <= k)
  }

  /** LSH-restricted top-k: candidates = corpus rows sharing at least one
    * band with the query; exact cosine + total-order rank within the
    * candidate set. Approximate (recall < 1) but each query touches only
    * its buckets — this is the 100 TB path.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 32, bands: Int = 8, dims: Int = 64): DataFrame = {
    val qb = hyperplaneBands(queries, idCol, vecCol, planes, bands, dims)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        V.norm(col(vecCol)).as("qn"),
        posexplode(col("bandvals")).as(Seq("band_id", "bv")))
    val cb = hyperplaneBands(corpus, idCol, vecCol, planes, bands, dims)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
        V.norm(col(vecCol)).as("nn"),
        posexplode(col("bandvals")).as(Seq("band_id", "bv")))
    val cand = qb.join(cb, Seq("band_id", "bv"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(V.dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rnk", row_number().over(w).cast("long")).where(col("rnk") <= k)
  }
}
