package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers mirroring the reference's I/O surface
  * (reference: etl_imdb.py:121 `read_tsv_gz`, etl_imdb.py:238
  * `write_parquet`): header'd delimited text (tab for the IMDb dumps,
  * .gz handled transparently by Spark's codec detection) and
  * overwrite-mode parquet with optional partitioning.
  */
object Sources {

  /** Delimited text with header. With `schema=None` Spark reads all
    * columns as string — matching the reference, which casts in staging.
    * At scale, always pass an explicit schema: schema inference is a
    * full extra pass over the data.
    */
  def readDelimited(spark: SparkSession, path: String, sep: String = "\t",
                    header: Boolean = true, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("sep", sep).option("header", header.toString)
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  /** JSON-lines source — the de-facto interchange format for LLM training
    * corpora. An explicit schema is REQUIRED: at 100 TB, schema inference
    * is a full extra pass, and a drifting inferred schema silently
    * corrupts downstream casts.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines sink (one JSON object per line, optionally compressed). */
  def writeJsonl(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Overwrite-mode parquet write with optional partition columns
    * (reference: etl_imdb.py:238). Partitioning on a low-cardinality key
    * (yearkey) gives partition pruning to every downstream reader.
    */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }
}
