package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) mining at corpus scale.
  *
  * The naive plan — groupBy(item).count over everything, then filter —
  * shuffles ONE ROW PER DISTINCT ITEM; on a 100 TB token stream that is
  * billions of groups for a result of a few hundred. The scalable shape is
  * candidate generation + exact verification:
  *
  *   1. Per-partition Misra–Gries with k counters (pure map-side, bounded
  *      O(k) state per task, NO shuffle). MG's guarantee: any item whose
  *      in-partition frequency exceeds n_p/(k+1) is among that partition's
  *      surviving counters. A global heavy hitter (freq ≥ N/d for a
  *      threshold denominator d ≤ k+1... strictly: freq·(k+1) > N) must
  *      exceed n_p/(k+1) in at least one partition (averaging argument),
  *      so the union of partition candidates is a SUPERSET of the true
  *      heavy hitters.
  *   2. Exact second pass: broadcast the (tiny) candidate set, count only
  *      matching rows, keep items with exact count · d > N. The output is
  *      therefore EXACT — the sketch only prunes the candidate space —
  *      which is what makes the result oracle-checkable.
  *
  * Total cost: two narrow passes (sketch+total, then candidate counts) +
  * one shuffle whose key space is the candidate set, not the item
  * universe.
  */
object Frequency {

  /** Per-partition Misra–Gries candidate generation. `k` counters give
    * the superset guarantee for thresholds above n/(k+1).
    */
  private[graft] def misraGries(items: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach { it =>
      if (counters.contains(it)) counters(it) += 1L
      else if (counters.size < k) counters(it) = 1L
      else {
        // decrement-all: drop zeroed counters; amortized O(1) per item
        val dead = List.newBuilder[String]
        counters.mapValuesInPlace((_, v) => v - 1L)
        counters.foreach { case (key, v) => if (v <= 0L) dead += key }
        dead.result().foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Exact heavy hitters: items whose count · `thresholdDenom` strictly
    * exceeds the total row count N (i.e. frequency > N/thresholdDenom).
    * `mgK` must be ≥ thresholdDenom for the superset guarantee; the
    * default gives a 4× margin, shrinking the candidate set's false
    * positives at 4 longs per counter.
    *
    * Exactly TWO source passes: the sketch pass also counts each
    * partition's rows (emitted as a null-item sentinel per partition),
    * so the corpus total N needs no scan of its own; the second pass
    * counts only candidate-matching rows. The tiny sketch output (one
    * sentinel + ≤k candidates per partition) is shared by its two
    * consumers through a lazy localCheckpoint.
    *
    * The threshold compare is pure int64 arithmetic — no float fraction —
    * so results are engine-portable and scale-independent.
    */
  def heavyHitters(items: DataFrame, itemCol: Column,
                   thresholdDenom: Long, mgK: Int): DataFrame = {
    require(mgK >= thresholdDenom, s"mgK=$mgK must be >= thresholdDenom=$thresholdDenom")
    val spark = items.sparkSession
    import spark.implicits._
    val flat = items.select(itemCol.cast("string").as("item")).where(col("item").isNotNull)
    val sketch = flat.as[String].mapPartitions { part =>
      var n = 0L
      val counted = part.map { it => n += 1; it }
      // misraGries drains `counted`, so n is final when it returns
      val cands = misraGries(counted, mgK).map(c => (c, 0L)).toList
      ((null.asInstanceOf[String], n) :: cands).iterator
    }.toDF("item", "pn").localCheckpoint(false)
    val candidates = sketch.where(col("item").isNotNull).select(col("item")).distinct()
    val total = sketch.where(col("item").isNull).agg(sum(col("pn")).as("n_total"))
    flat.join(broadcast(candidates), "item")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(total))
      .where(col("n") * lit(thresholdDenom) > col("n_total"))
      .select(col("item"), col("n"), col("n_total"))
  }
}
