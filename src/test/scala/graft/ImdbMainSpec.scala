package graft

import java.nio.file.Files

/** Drives the CLI twin end-to-end: writes IMDb-format TSV.gz fixtures,
  * runs [[ImdbMain.run]] with reference-equivalent flags, and checks the
  * produced dw/ + marts/ parquet layout.
  */
class ImdbMainSpec extends SparkSpec {

  private def writeTsvGz(path: String, header: String, rows: Seq[String]): Unit = {
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(path))
    out.write(((header +: rows).mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
  }

  test("reference CLI contract: tsv.gz in, dw+marts parquet out") {
    val tmp = Files.createTempDirectory("graft_imdb_cli").toString
    new java.io.File(s"$tmp/raw").mkdirs()
    writeTsvGz(s"$tmp/raw/title.basics.tsv.gz",
      "tconst\ttitleType\tprimaryTitle\toriginalTitle\tisAdult\tstartYear\tendYear\truntimeMinutes\tgenres",
      Seq(
        "tt1\tmovie\tAlpha\tAlpha\t0\t1994\t\\N\t120\tDrama,Crime",
        "tt2\tmovie\tBeta\tBeta\t0\t1994\t\\N\t90\tdrama",
        "tt3\tshort\tGamma\tGamma\t0\t1994\t\\N\t10\tComedy",
        "tt4\tmovie\tDelta\tDelta\t0\t\\N\t\\N\t\\N\t\\N"))
    writeTsvGz(s"$tmp/raw/title.ratings.tsv.gz",
      "tconst\taverageRating\tnumVotes",
      Seq("tt1\t9.3\t2800000", "tt2\t7.1\t5000", "tt3\t8.0\t100"))

    ImdbMain.run(spark, ImdbMain.Opts(
      rawDir = s"$tmp/raw", dwDir = s"$tmp/dw", martsDir = s"$tmp/marts",
      minVotes = 1000, topN = 10, showCounts = false))

    val fact = spark.read.parquet(s"$tmp/dw/fact_ratings")
    assert(fact.count() === 2) // tt1, tt2 (tt3 not movie, tt4 unrated)
    val kpi = spark.read.parquet(s"$tmp/marts/mart_year_kpi").collect()
    assert(kpi.length === 1 && kpi.head.getAs[Long]("n_movies") === 2)
    val genres = spark.read.parquet(s"$tmp/dw/dim_genre")
      .collect().map(_.getString(0)).sorted
    assert(genres.toSeq === Seq("crime", "drama"))
    val top = spark.read.parquet(s"$tmp/marts/mart_top_genre_year")
    assert(top.filter(top("titlekey") === "tt1").count() === 2) // drama + crime rows
  }

  test("flag parsing matches the reference CLI") {
    val o = ImdbMain.parseArgs(Array(
      "--raw-dir", "r", "--dw-dir", "d", "--marts-dir", "m",
      "--min-votes", "2000", "--top-n", "15", "--show-counts"))
    assert(o === ImdbMain.Opts("r", "d", "m", 2000, 15, true))
    intercept[IllegalArgumentException](ImdbMain.parseArgs(Array("--bogus")))
  }
}
