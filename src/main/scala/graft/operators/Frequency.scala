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

  /** Misra–Gries update folding `items` into an EXISTING counter map —
    * the state-carrying core shared by the per-partition batch sketch
    * below and the streaming shard state
    * ([[graft.streaming.FrequencyStream]]): MG summaries compose by
    * continuing the same fold, so cross-batch state is just the counter
    * map. Decrement-all keeps the map at ≤ k entries; the drain is
    * amortized O(1) per item.
    */
  private[graft] def mgUpdate(counters: scala.collection.mutable.HashMap[String, Long],
                              items: Iterator[String], k: Int): Unit =
    items.foreach { it =>
      if (counters.contains(it)) counters(it) += 1L
      else if (counters.size < k) counters(it) = 1L
      else {
        val dead = List.newBuilder[String]
        counters.mapValuesInPlace((_, v) => v - 1L)
        counters.foreach { case (key, v) => if (v <= 0L) dead += key }
        dead.result().foreach(counters.remove)
      }
    }

  /** Per-partition Misra–Gries candidate generation. `k` counters give
    * the superset guarantee for thresholds above n/(k+1).
    */
  private[graft] def misraGries(items: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    mgUpdate(counters, items, k)
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

  /** Market-basket association rules for item PAIRS: support, directed
    * confidence, and lift, all exact integer ppm —
    * `lift > 1e6` ⇔ the items co-occur more than independence predicts.
    * The standard retail/affinity shape (Apriori's k=2 tier, which is
    * where real-world basket analysis overwhelmingly lives).
    *
    * Pairs form per basket via the same ordered self-join as the
    * triangle counter's wedge step — fan-out bounded by basket size,
    * and `minPairCount` prunes the long tail right at the pair
    * aggregate. One basket-keyed join + two keyed aggregates; item
    * counts join back onto the (filtered, small) pair table.
    * Overflow bound: `n_ab·N·1e6 < 2^63` — n_ab ≤ N means N below ~3M
    * baskets for the worst pair; pre-aggregate or sample beyond (lift
    * is a ratio estimate; it converges long before that).
    */
  def associationRules(baskets: DataFrame, basketCol: String, itemCol: String,
                       minPairCount: Long): DataFrame = {
    require(minPairCount >= 1)
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
      .localCheckpoint(false) // three consumers: N, item counts, pair join
    val nB = bi.agg(count_distinct(col("b")).as("n_baskets"))
    val itemN = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.join(bi.select(col("b"), col("i").as("j")), "b")
      .where(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    // item counts join KEYED (an item catalog is not broadcastable at
    // 100 TB); AQE turns them into broadcasts when they do fit
    pairs
      .join(itemN.select(col("i"), col("n_i").as("n_a")), "i")
      .join(itemN.select(col("i").as("j"), col("n_i").as("n_b")), "j")
      .crossJoin(broadcast(nB))
      .select(col("i").as("item_a"), col("j").as("item_b"),
        col("n_ab"),
        expr("n_ab * 1000000L div n_baskets").as("supp_ppm"),
        expr("n_ab * 1000000L div n_a").as("conf_ab_ppm"),
        expr("n_ab * 1000000L div n_b").as("conf_ba_ppm"),
        // n_ab·n_baskets ~ 2e16 at sf100 fits int64, ×1e6 wraps —
        // DECIMAL(38,0) numerator (envelope audit r11)
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * n_baskets * 1000000 " +
          "div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_ppm"))
  }
}
