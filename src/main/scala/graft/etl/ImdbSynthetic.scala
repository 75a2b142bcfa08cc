package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic IMDb-shaped raw inputs derived from the synthetic `part`
  * table, so the FULL reference pipeline composition ([[ImdbPipeline]],
  * reference etl_imdb.py:258–314) can run under the driver's DuckDB
  * oracle gate — not just its individually-checked stages.
  *
  * Every column is a STRING with `\N` null markers, exactly the raw shape
  * the reference reads from `title.basics.tsv` / `title.ratings.tsv`
  * (etl_imdb.py:121), and every value is a pure function of `p_partkey` /
  * `p_name` so the DuckDB oracle re-derives identical inputs inline.
  */
object ImdbSynthetic {

  /** title.basics-shaped rows: ~80% movies, multi-valued genres from the
    * part name's words, ~6%/9% null startYear/genres.
    */
  def titlesFromPart(part: DataFrame): DataFrame =
    part.select(
      concat(lit("t"), col("p_partkey")).as("tconst"),
      when(col("p_partkey") % 10 < 8, lit("movie")).otherwise(lit("short")).as("titleType"),
      col("p_name").as("primaryTitle"),
      col("p_name").as("originalTitle"),
      (col("p_partkey") % 2).cast("string").as("isAdult"),
      when(col("p_partkey") % 17 === 0, lit("\\N"))
        .otherwise((lit(1980) + col("p_partkey") % 40).cast("string")).as("startYear"),
      when(col("p_partkey") % 13 === 0, lit("\\N"))
        .otherwise((lit(60) + col("p_partkey") % 120).cast("string")).as("runtimeMinutes"),
      when(col("p_partkey") % 11 === 0, lit("\\N"))
        .otherwise(regexp_replace(col("p_name"), " ", ",")).as("genres"))

  /** title.ratings-shaped rows for ~2/3 of the titles. The rating string
    * is built from integer digits ("4.7") so both engines parse the exact
    * same double.
    */
  def ratingsFromPart(part: DataFrame): DataFrame =
    part.filter(col("p_partkey") % 3 =!= 0).select(
      concat(lit("t"), col("p_partkey")).as("tconst"),
      expr("CAST((10 + p_partkey % 80) DIV 10 AS STRING) || '.' || " +
        "CAST((10 + p_partkey % 80) % 10 AS STRING)").as("averageRating"),
      ((col("p_partkey") * 37) % 200000).cast("string").as("numVotes"))
}
