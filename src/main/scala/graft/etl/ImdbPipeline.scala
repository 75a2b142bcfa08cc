package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end re-expression of the reference pipeline
  * (/root/reference/src/etl_imdb.py:258–314 `main`): Raw → Staging →
  * DW core (dims + fact) → BI marts, for any input shaped like the IMDb
  * `title.basics` / `title.ratings` tables.
  *
  * Differences from the reference, on purpose:
  *  - ratings joins are declared `broadcast`-eligible when small; Catalyst
  *    + AQE pick the physical join.
  *  - the genre bridge skips the reference's redundant dim self-join
  *    (see [[Star.explodeBridge]]).
  *  - top-N marts rank under a total order (tie-break on the key) so
  *    output is deterministic; the reference's `row_number` over
  *    `desc(num_votes)` alone (etl_imdb.py:210) is not.
  */
object ImdbPipeline {

  case class Outputs(
      dimYear: DataFrame, dimTitle: DataFrame, dimGenre: DataFrame,
      bridgeTitleGenre: DataFrame, factRatings: DataFrame,
      martYearKpi: DataFrame, martTopGenreYear: DataFrame,
      martTopYearByRating: DataFrame, martRatingDistribution: DataFrame)

  /** titles: tconst, titleType, primaryTitle, originalTitle, isAdult,
    * startYear, runtimeMinutes, genres (comma-separated, "\N" markers);
    * ratings: tconst, averageRating, numVotes.
    */
  def run(titlesRaw: DataFrame, ratingsRaw: DataFrame,
          minVotes: Int = 1000, topN: Int = 10): Outputs = {

    // staging (etl_imdb.py:129–149)
    val titlesStg = Staging.dedupByKeyKeepFirst(
      Staging.castColumns(
        Staging.nullMarkers(titlesRaw,
          Seq("startYear", "runtimeMinutes", "genres", "primaryTitle", "originalTitle", "titleType"),
          "\\N"),
        Map("startYear" -> "int", "runtimeMinutes" -> "int", "isAdult" -> "int"))
        .filter(col("titleType") === "movie"),
      // secondary sort col makes the "keep first" pick deterministic among
      // duplicate keys (the reference's dropDuplicates is arbitrary there)
      Seq("tconst"), Seq(col("tconst"), col("primaryTitle")))
    val ratingsStg = Staging.dedupByKeyKeepFirst(
      Staging.castColumns(
        Staging.nullMarkers(ratingsRaw, Seq("averageRating", "numVotes"), "\\N"),
        Map("averageRating" -> "double", "numVotes" -> "int")),
      Seq("tconst"), Seq(col("tconst"), col("averageRating")))

    // DW core (etl_imdb.py:152–193)
    val dimYear = Star.dimFromColumn(titlesStg, col("startYear"), "year")
    val dimTitle = titlesStg.select(col("tconst").as("titlekey"),
      col("primaryTitle"), col("originalTitle"), col("titleType"),
      col("startYear"), col("runtimeMinutes"), col("isAdult"))
    val (dimGenre, bridge) = Star.explodeBridge(
      titlesStg.where(col("genres").isNotNull),
      col("tconst"), col("genres"), ",", "titlekey", "genrekey")
    val fact = Star.fact(titlesStg, ratingsStg, Seq("tconst"), Seq(
      col("tconst").as("titlekey"), col("startYear").as("yearkey"),
      col("averageRating").as("avg_rating"), col("numVotes").as("num_votes"),
      col("runtimeMinutes").as("runtime_min")))

    // marts (etl_imdb.py:196–235)
    val kpi = Marts.kpiByGroup(fact, col("yearkey"), "yearkey", Seq(
      count(lit(1)).as("n_movies"), avg(col("avg_rating")).as("mean_rating"),
      sum(col("num_votes")).as("total_votes")))
    val topGenre = Marts.topNPerGroup(
        fact.join(bridge, "titlekey"),
        Seq(col("yearkey"), col("genrekey")),
        Seq(col("num_votes").desc, col("titlekey").asc), topN,
        Some(col("num_votes") >= minVotes))
      .select(col("yearkey"), col("genrekey"), col("titlekey"),
        col("avg_rating"), col("num_votes"), col("rk"))
    val topYear = Marts.topNPerGroup(fact, Seq(col("yearkey")),
        Seq(col("avg_rating").desc, col("titlekey").asc), topN,
        Some(col("num_votes") >= minVotes))
      .select(col("yearkey"), col("titlekey"), col("avg_rating"), col("num_votes"), col("rk"))
    // reference layout (etl_imdb.py:230): rating_bucket carries the
    // half-point lower bound floor(rating*2)/2, not the integer index —
    // index * width recovers it exactly (0.5 is a binary fraction)
    val dist = Marts.histogram(fact, Seq(col("yearkey")), col("avg_rating"), 0.5)
      .select(col("yearkey"), (col("bucket") * lit(0.5)).as("rating_bucket"),
        col("n").as("count"))

    Outputs(dimYear, dimTitle, dimGenre, bridge, fact, kpi, topGenre, topYear, dist)
  }

  /** Parquet export matching the reference layout (etl_imdb.py:299–311):
    * overwrite mode, fact partitioned by yearkey.
    */
  def write(out: Outputs, dwDir: String, martsDir: String): Unit = {
    out.dimYear.write.mode("overwrite").parquet(s"$dwDir/dim_year")
    out.dimTitle.write.mode("overwrite").parquet(s"$dwDir/dim_title")
    out.dimGenre.write.mode("overwrite").parquet(s"$dwDir/dim_genre")
    out.bridgeTitleGenre.write.mode("overwrite").parquet(s"$dwDir/bridge_title_genre")
    out.factRatings.write.mode("overwrite").partitionBy("yearkey").parquet(s"$dwDir/fact_ratings")
    out.martYearKpi.write.mode("overwrite").parquet(s"$martsDir/mart_year_kpi")
    out.martTopGenreYear.write.mode("overwrite").parquet(s"$martsDir/mart_top_genre_year")
    out.martTopYearByRating.write.mode("overwrite").parquet(s"$martsDir/mart_top_year_by_rating")
    out.martRatingDistribution.write.mode("overwrite").parquet(s"$martsDir/mart_rating_distribution")
  }
}
