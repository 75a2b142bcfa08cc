package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H}

/** Deterministic, engine-portable sampling for corpus curation.
  *
  * `rand()`-based sampling is irreproducible (different rows every run,
  * every retry, every engine) — poison for training-data lineage. Both
  * operators here key off a salted md5 of a row key instead: the same
  * corpus + salt always yields the same sample, any engine can re-derive
  * it, and changing the salt draws an independent sample.
  */
object Sampling {

  /** Bernoulli(rate) sample: keep rows whose salted 32-bit key hash falls
    * below rate·2³². Map-side only — no shuffle, composes with pushdown.
    */
  def bernoulli(df: DataFrame, key: Column, rate: Double, salt: String): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    val thr = math.floor(rate * 4294967296.0).toLong
    df.where(H.hash32(key, salt) < thr)
  }

  /** Fixed-size per-stratum sample: the k rows with the smallest salted
    * key hash in each stratum — reservoir-sampling semantics, but
    * deterministic. One shuffle on the stratum key; with map-side
    * pre-ranking cost concerns, swap the window for [[TopKAggregate]].
    */
  def stratifiedK(df: DataFrame, strata: Seq[Column], key: Column, k: Int,
                  salt: String): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(H.hash32(key, salt), key)
    df.withColumn("__srn", row_number().over(w)).filter(col("__srn") <= k).drop("__srn")
  }
}
