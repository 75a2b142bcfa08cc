package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A table sorted on ONE key prunes scans on that key only; queries
  * filtering on a second dimension read everything. Interleaving the
  * bits of both keys into one Z-value and range-sorting the files on it
  * gives every file a small bounding box in BOTH dimensions, so parquet
  * row-group min/max stats prune scans filtered on either key (the
  * technique behind Delta/Iceberg Z-ORDER clustering, here as a plain
  * column expression + write discipline).
  *
  * The Z-value is pure integer bit arithmetic — engine-portable and
  * oracle-checkable, like every other derived value in this library.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    * 2·bits ≤ 62 keeps the result in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** Rewrite `df` Z-ordered on (xCol, yCol): range-partition by the
    * Z-value (each output file owns a contiguous Z-range = a small 2-D
    * bounding box) and sort within partitions so row-group stats are
    * tight. The Z column itself is dropped — it exists only to place
    * rows.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: Column, yCol: Column,
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(xCol, yCol, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
