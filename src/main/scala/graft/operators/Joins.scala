package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Join strategies for shapes the planner can't always save by itself. */
object Joins {

  /** Bloom filter of `c`'s values as a 1-row binary aggregate — the same
    * sketch Spark's runtime row-level filtering injects, exposed as a
    * library primitive (the expression is not SQL-registered in 4.x).
    * Mergeable across partitions (partial agg), so building it is one
    * narrow pass over the filtered side.
    */
  private[graft] def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  private[graft] def mightContain(bloom: Column, c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(xxhash64(c))))

  /** Anti join with a bloom pre-filter: rows of `big` whose `key` is NOT
    * in `small`, exactly (never loses or invents rows).
    *
    * At 100 TB the plain left-anti join shuffles EVERY big-side row on
    * the key. But a bloom "no" is definitive: those rows are keepers and
    * never enter a shuffle — only the might-contain sliver (true matches
    * + ~fpp of the rest) needs the exact anti join to evict false
    * positives. With a contamination-style workload (tiny `small`, big
    * mostly clean) the shuffled volume drops from 100% to ~fpp of rows.
    * The bloom itself ships as ONE binary scalar-subquery value
    * (`numBits/8` bytes — size it; 8 bits/item ≈ 2% fpp;
    * `might_contain` requires a constant/scalar-subquery bloom side,
    * hence `.scalar()` rather than a joined column).
    *
    * Cost: two passes over `big` (both map-side scans feeding a union);
    * at scale that is the cheap part — the shuffle is what melts.
    */
  def bloomAntiJoin(big: DataFrame, small: DataFrame, key: String,
                    expectedItems: Long, bitsPerItem: Int = 8): DataFrame = {
    require(expectedItems > 0 && bitsPerItem > 0)
    val bf = small.agg(
      bloomAgg(col(key), expectedItems, expectedItems * bitsPerItem).as("__bf")).scalar()
    // NULL-proof the routing predicate: the bloom aggregate is NULL when
    // `small` has no (non-null) keys, which would NULL `might_contain`
    // for EVERY row and silently drop the whole table (both branches
    // filter NULL as false). might-contain=false is the correct reading
    // of an absent bloom — nothing is contained in an empty set. A NULL
    // big-side key hashes to the xxhash64 seed (never NULL), routes like
    // any value, and survives the exact anti join (NULL = nothing).
    val mc = coalesce(mightContain(bf, col(key)), lit(false))
    val definiteKeep = big.where(!mc)
    val maybe = big.where(mc)
      .join(small.select(col(key)).distinct(), Seq(key), "left_anti")
    definiteKeep.unionByName(maybe)
  }

  /** Salt-replicate equi-join for a skewed big ⋈ small join: the big
    * side gets a row-local salt (`monotonically_increasing_id % n` —
    * any within-key-varying value works; result is salt-independent),
    * the small side replicates once per salt value, and the join keys
    * become (keys, salt) — a hot key's rows now spread over `saltFactor`
    * partitions instead of melting one executor.
    *
    * This is the MANUAL skew-kill: AQE's skew-join only splits
    * sort-merge partitions after a shuffle materializes, can't help a
    * broadcast-ineligible aggregation-feeding join mid-stage, and is
    * unavailable on some pipelines (e.g. streaming). Result is exactly
    * the plain inner join: each big row matches precisely the replica
    * carrying its salt. Cost: small side ×saltFactor (keep it small).
    *
    * `saltBy` defaults to `monotonically_increasing_id()` — fine for
    * batch, but REJECTED by Structured Streaming plans; streaming
    * callers pass any within-key-varying column (e.g. the event id:
    * `xxhash64($"event_id")`).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int,
                 saltBy: org.apache.spark.sql.Column = monotonically_increasing_id()): DataFrame = {
    require(saltFactor >= 1)
    val b = big.withColumn("__salt",
      pmod(saltBy, lit(saltFactor.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Fuzzy lookup (record linkage): resolve each dirty probe string to its
    * best catalog match under a Levenshtein budget. The classic
    * block-compare-rank shape:
    *
    *  - BLOCK on a cheap deterministic key (here the first
    *    whitespace-token) so candidate generation is an equi-join, never
    *    a cartesian compare — at 100 TB the block key is what keeps this
    *    feasible, and a skewed block is handled like any skewed equi-join
    *    (AQE split or [[saltedJoin]]).
    *  - PREFILTER candidates with the length-difference lower bound
    *    (|len(a)−len(b)| ≤ maxDist) — codegen'd integer compare that
    *    skips most of the DP-table evaluations in a dense block.
    *  - COMPARE with the built-in codegen'd `levenshtein` and keep pairs
    *    within `maxDist`.
    *  - RANK per probe with one struct-min aggregate (distance, then
    *    catalog value lexicographically — fully deterministic), avoiding
    *    a per-probe sort window.
    *
    * Probes that match nothing within budget are dropped (inner
    * semantics); callers wanting audit rows can left-anti the result.
    */
  def fuzzyLookup(probes: DataFrame, probeCol: String,
                  catalog: DataFrame, catCol: String,
                  maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val block = (c: Column) => substring_index(c, " ", 1)
    val p = probes.select(col(probeCol).as("probe"),
      block(col(probeCol)).as("__bk")).distinct()
    val c = catalog.select(col(catCol).as("candidate"),
      block(col(catCol)).as("__bk")).distinct()
    p.join(c, "__bk")
      .where(abs(length(col("probe")) - length(col("candidate"))) <= maxDist)
      .withColumn("__d", levenshtein(col("probe"), col("candidate")).cast("long"))
      .where(col("__d") <= maxDist)
      .groupBy(col("probe"))
      .agg(min(struct(col("__d").as("dist"), col("candidate").as("matched")))
        .as("best"))
      .select(col("probe"), col("best.matched").as("matched"),
        col("best.dist").as("dist"))
  }
}
