package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable hashing kernels for dedup / LSH.
  *
  * Everything derives from `md5(string)` so any engine with a standard md5
  * (Spark, DuckDB, Trino, ...) computes bit-identical signatures — that is
  * what lets the DuckDB oracle replay these operators exactly.
  *
  * Scale notes: signatures are computed map-side per row (HOFs over the
  * token array, no explode, no shuffle); the only shuffle any LSH consumer
  * needs is the band→bucket exchange keyed on a 16-byte digest.
  */
object HashFunctions {

  /** MinHash signature of a string-array column: element i is the
    * lexicographic min of `md5(token + ":" + i)` over the array. Min of a
    * fixed-width hex digest is min of the hash value, so this is a valid
    * k-min-hash family. NULL (from an empty array) propagates and never
    * joins, which drops degenerate docs from candidate generation.
    */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleArr, t => md5(concat(t, lit(":" + i)))))
    }: _*)

  /** LSH band digests: md5 of the concatenation of each band's rows.
    * Equal band digest ⇒ the whole band of minhashes agrees.
    */
  def bandDigests(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat((0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** 32-bit hash of a token from the first 8 hex chars of its md5 —
    * the per-feature hash for SimHash.
    */
  def token32(t: Column): Column = conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** Deterministic md5-derived hex digit value (0..15) computed in Scala —
    * must stay in lockstep with the SQL form
    * `instr('0123456789abcdef', substr(md5(s),1,1)) - 1`.
    */
  def md5HexDigit(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 1), 16)
  }

  /** Random-hyperplane weights for cosine LSH: plane p, dim i gets weight
    * `(md5HexDigit("hp:p:i") - 7.5) / 8.0` — reproducible in SQL, so the
    * oracle can re-derive the identical planes inline.
    */
  def hyperplaneWeights(planes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dims).map(i => (md5HexDigit(s"hp:$p:$i") - 7.5) / 8.0)
    }
}
