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

  /** Deterministic FIXED-SIZE id sample: the `budget` ids with the
    * smallest `(md5(id), id)` — a pseudo-random total order both Spark
    * and any SQL engine replay exactly (`ORDER BY md5(CAST(id AS
    * VARCHAR)), id LIMIT budget`). Unlike a rate-based draw, the sample
    * SIZE is constant under corpus growth, which is what turns a
    * quadratic query×corpus audit into a linear budget×corpus one —
    * the exact-truth halves of the recall audits key on this. Plans as
    * a distributed TakeOrderedAndProject (per-partition top-budget,
    * merged on the driver — never a global sort), and the result is
    * broadcast-sized by construction. Ids must be unique (no distinct
    * is applied) and cast losslessly to long.
    */
  def hashOrderIds(df: DataFrame, idCol: String, budget: Int,
                   outCol: String = "doc_id"): DataFrame = {
    require(budget > 0)
    df.select(col(idCol).cast("long").as(outCol))
      .orderBy(md5(col(outCol).cast("string")), col(outCol))
      .limit(budget)
  }

  /** Bernoulli(rate) sample: keep rows whose salted 32-bit key hash falls
    * below rate·2³². Map-side only — no shuffle, composes with pushdown.
    */
  def bernoulli(df: DataFrame, key: Column, rate: Double, salt: String): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    val thr = math.floor(rate * 4294967296.0).toLong
    // null keys hash to null, and `null < thr` would silently DROP those
    // rows at every rate (even 1.0) — map them to a sentinel instead.
    // Caveat: all null-key rows share one draw (kept or dropped together);
    // key on a non-null column when that matters.
    val k = coalesce(key.cast("string"), lit("\u0000<null-key>"))
    df.where(H.hash32(k, salt) < thr)
  }

  /** Weighted (importance) Bernoulli: per-row keep probability `weight`
    * (clamped to [0,1]) — e.g. quality-weighted corpus downsampling,
    * where high-quality documents survive with higher probability. Same
    * deterministic salted-hash draw as [[bernoulli]], still map-side
    * only; the weight column should itself be engine-portable (exact or
    * round(,4)) for cross-engine reproducibility.
    */
  def weighted(df: DataFrame, key: Column, weight: Column, salt: String): DataFrame = {
    val w = least(greatest(weight, lit(0.0)), lit(1.0))
    val k = coalesce(key.cast("string"), lit("\u0000<null-key>"))
    // floor to an integer threshold exactly like [[bernoulli]], so
    // weighted at a constant weight IS bernoulli at that rate (the
    // boundary row where hash == floor(w·2³²) decides identically)
    df.where(H.hash32(k, salt) < floor(w * lit(4294967296.0)).cast("long"))
  }

  /** Mixture (re-)sampling: downsample each source so the sampled corpus
    * approaches a TARGET mixture — the curation step that turns "whatever
    * the crawl found" into "the domain balance the training run wants".
    *
    * Given per-source target weights `targetsPpm` (parts-per-million of
    * the sampled corpus) and an overall budget of `budgetPct`% of the
    * total corpus `sizeCol` mass, each source's keep-rate is
    * `min(1e6, (budget × w_s) div avail_s)` ppm — capped at 1.0 because a
    * source can't yield more than it has (under-weight sources keep
    * everything; the shortfall is reported, not silently reweighted).
    * The rate table is computed from one aggregate over the corpus and
    * broadcast back; the keep decision is the same salted-hash draw as
    * [[bernoulli]] (map-side, deterministic, engine-portable). All
    * arithmetic is int64: size×ppm products need corpus mass below
    * ~9·10¹² units — feed chars at document granularity, or KB units at
    * extreme corpus scale.
    *
    * Output: the kept rows plus their source's `rate_ppm`.
    */
  def mixtureSample(df: DataFrame, sourceCol: String, key: Column, sizeCol: Column,
                    targetsPpm: Seq[(String, Long)], budgetPct: Long,
                    salt: String): DataFrame = {
    require(budgetPct > 0, "budget must be positive")
    require(targetsPpm.map(_._2).sum <= 1000000L,
      "target weights must sum to at most 1e6 ppm")
    import df.sparkSession.implicits._
    // avail feeds both the rate rows and the total; the lazy checkpoint
    // keeps the corpus-wide aggregate to ONE scan (column renames defeat
    // exchange reuse, so without it the aggregate runs twice)
    val avail = df.groupBy(col(sourceCol)).agg(sum(sizeCol.cast("long")).as("__c"))
      .localCheckpoint(false)
    val total = avail.agg(sum(col("__c")).as("__tc"))
    val tgt = targetsPpm.toDF(sourceCol, "__wppm")
    val rates = avail.join(broadcast(total))
      .join(broadcast(tgt), sourceCol)
      .select(col(sourceCol),
        least(lit(1000000L),
          expr(s"(((__tc * ${budgetPct}L) div 100L) * __wppm) div __c")).as("rate_ppm"))
    val k = coalesce(key.cast("string"), lit("\u0000<null-key>"))
    df.join(broadcast(rates), sourceCol)
      .where(H.hash32(k, salt) * lit(1000000L) < col("rate_ppm") * lit(4294967296L))
  }

  /** Temperature (α = 1/2) mixture sampling: the domain-rebalancing
    * sampler where the target mixture is COMPUTED from the corpus
    * instead of handed in — per-source target weight ∝ √(mass_s), the
    * standard temperature-sampling flattening that upweights small
    * domains/languages relative to their natural share without letting
    * any one source dominate (α=1 is the natural mixture, α→0 uniform;
    * 1/2 is the exponent whose sqrt stays exactly computable — a
    * free-exponent pow() is not even correctly-rounded). Each source's
    * √mass is FLOORED TO AN INTEGER before anything sums it:
    * `floor(sqrt(n))` equals the exact integer sqrt for n ≤ ~4·10¹⁵
    * (a correctly-rounded double sqrt of an int64 can only cross an
    * integer k when n is within ~k·2⁻⁵² of k², impossible for integer
    * n < k²), so the weight computation
    * `w_s = 1e6·isqrt_s div Σ isqrt` is pure int64 — no
    * order-dependent double summation anywhere (a double Σ√c_t would
    * wobble with partition order and flip boundary rows). Weights
    * become keep-rates exactly as [[mixtureSample]]:
    * `rate_s = min(1e6, (budget·w_s) div mass_s)` ppm, and the keep
    * decision is the same salted-hash draw as [[bernoulli]] (map-side,
    * deterministic). One per-source aggregate + two broadcasts; the
    * corpus itself never shuffles.
    *
    * Output: kept rows + their source's `w_ppm` (computed target) and
    * `rate_ppm`.
    */
  def temperatureSample(df: DataFrame, sourceCol: String, key: Column,
                        sizeCol: Column, budgetPct: Long, salt: String): DataFrame = {
    require(budgetPct > 0, "budget must be positive")
    val avail = df.groupBy(col(sourceCol)).agg(sum(sizeCol.cast("long")).as("__c"))
      .localCheckpoint(false)
    val isq = floor(sqrt(col("__c").cast("double"))).cast("long")
    val total = avail.agg(sum(col("__c")).as("__tc"), sum(isq).as("__tsq"))
    val rates = avail.join(broadcast(total))
      .select(col(sourceCol), col("__c"), col("__tc"),
        expr("(1000000L * floor(sqrt(cast(__c as double)))) div __tsq")
          .cast("long").as("w_ppm"))
      .select(col(sourceCol), col("w_ppm"),
        least(lit(1000000L),
          expr(s"(((__tc * ${budgetPct}L) div 100L) * w_ppm) div __c")).as("rate_ppm"))
    val k = coalesce(key.cast("string"), lit("\u0000<null-key>"))
    df.join(broadcast(rates), sourceCol)
      .where(H.hash32(k, salt) * lit(1000000L) < col("rate_ppm") * lit(4294967296L))
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

  /** Exactly-K weighted sample per stratum (Efraimidis–Spirtsis A-ES):
    * each row draws the deterministic uniform u = (hash32(key)+1)/2³²
    * and gets priority ln(u)/w — keeping the K LARGEST priorities per
    * stratum is distributionally identical to sequential
    * without-replacement draws ∝ w (the u^(1/w) key order, taken in log
    * space so heavy weights damp toward 0 = the maximum). This is the
    * fixed-BUDGET counterpart of [[weighted]] (per-row keep
    * probability): "exactly K docs per source, quality-weighted" is the
    * training-mixture contract.
    *
    * Determinism contract: u is the salted md5 hash (engine-portable,
    * append-stable like [[split]]); the only non-integer step is
    * ln(u)/w, whose cross-engine wobble is ≤1 ulp — it can reorder two
    * priorities only if they agree to ~15 significant digits, which
    * distinct 32-bit u draws don't do (ties on EQUAL (u, w) are broken
    * by the key). Scale shape: one hash + one ln per row map-side, then
    * the same per-stratum top-K window as [[stratifiedK]] — no global
    * sort, skew bounded by stratum size (salt the stratum first if one
    * stratum dominates).
    *
    * `weight` must be strictly positive (enforced in-plan: a zero or
    * negative weight raises rather than silently sampling wrong).
    */
  def weightedK(df: DataFrame, strata: Seq[Column], key: Column,
                weight: Column, k: Int, salt: String): DataFrame = {
    require(k > 0, "weightedK: k must be positive")
    val w = weight.cast("double")
    val guarded = when(w > 0.0, w).otherwise(
      raise_error(concat(lit("weightedK: non-positive weight for key "),
        key.cast("string"))))
    val u = (H.hash32(key, salt) + lit(1L)).cast("double") / lit(4294967296.0)
    val pri = log(u) / guarded
    val win = Window.partitionBy(strata: _*).orderBy(col("__wpri").desc, key)
    df.withColumn("__wpri", pri)
      .withColumn("__wrn", row_number().over(win))
      .filter(col("__wrn") <= k)
      .drop("__wpri", "__wrn")
  }

  /** Deterministic train/val/test assignment: the salted 32-bit hash of
    * the key lands in one of the permille ranges — so the split is (a)
    * reproducible run-to-run and engine-to-engine, (b) DISJOINT and
    * exhaustive by construction (ranges partition the hash space), and
    * (c) stable under corpus growth: a document keeps its split forever
    * because assignment depends only on its own key — append-only
    * pipelines never leak yesterday's train doc into tomorrow's test
    * set. Purely map-side (one hash + two compares per row, no shuffle).
    * `trainPm`/`valPm` are permille sizes, e.g. (900, 50) = 90/5/5.
    */
  def split(df: DataFrame, key: Column, salt: String,
            trainPm: Long, valPm: Long,
            splitCol: String = "split"): DataFrame = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= 1000)
    val h = H.hash32(coalesce(key.cast("string"), lit("\u0000<null-key>")), salt)
    val trainThr = trainPm * 4294967296L / 1000L
    val valThr = (trainPm + valPm) * 4294967296L / 1000L
    df.withColumn(splitCol,
      when(h < trainThr, lit("train"))
        .when(h < valThr, lit("val"))
        .otherwise(lit("test")))
  }

  /** Training-mix token-budget allocation: split a total budget of
    * `budgetPct`% of the corpus size across sources, uniform target
    * share, each source capped at `maxEpochs` passes over its available
    * mass — the planning step every LLM data mix runs before sampling
    * (you cannot take 5 epochs of a small source just because its
    * target share asks for it). Water-filling with ONE redistribution
    * round, documented: sources whose cap is below the uniform share
    * release their shortfall, which is re-split proportional to the
    * uncapped sources' remaining headroom (`least(headroom, L·h div H)`
    * — exact, never exceeds a cap; if the budget exceeds total capacity
    * the pool saturates and the shortfall column reports what's left).
    * A second round would re-redistribute crumbs from sources capped BY
    * the redistribution — sub-ppm at realistic shapes, so one round is
    * the contract (the `epochs_ppm` column makes any violation visible).
    *
    * All integer: the only products ride DECIMAL(38,0) (leftover ×
    * headroom overflows int64 past ~10⁹ token corpora), every division
    * has a non-negative numerator. Distributed shape: one source-keyed
    * partial aggregate, then two single-row broadcasts — nothing
    * row-sized shuffles twice. Returns one row per source:
    * (source, avail, cap, alloc, epochs_ppm).
    */
  def mixBudget(df: DataFrame, sourceCol: String, sizeCol: Column,
                budgetPct: Long, maxEpochs: Long): DataFrame = {
    require(budgetPct > 0 && maxEpochs >= 1)
    val avail = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(sizeCol).as("avail"))
    val tot = avail.agg(sum(col("avail")).as("tot"), count(lit(1)).as("n_src"))
    val base = avail.crossJoin(broadcast(tot))
      .select(col("source"), col("avail"),
        (col("avail") * lit(maxEpochs)).as("cap"),
        expr(s"tot * $budgetPct div 100 div n_src").as("alloc0"))
      .select(col("source"), col("avail"), col("cap"),
        least(col("cap"), col("alloc0")).as("alloc1"),
        greatest(lit(0L), col("alloc0") - col("cap")).as("shortfall"),
        greatest(lit(0L), col("cap") - col("alloc0")).as("headroom"))
    val pool = base.agg(sum(col("shortfall")).as("pool"),
      sum(col("headroom")).as("hsum"))
    base.crossJoin(broadcast(pool))
      .select(col("source"), col("avail"), col("cap"),
        (col("alloc1") + when(col("hsum") > 0,
          least(col("headroom"), expr(
            "CAST(CAST(pool AS DECIMAL(38,0)) * headroom div hsum AS BIGINT)")))
          .otherwise(lit(0L))).as("alloc"))
      .select(col("source"), col("avail"), col("cap"), col("alloc"),
        expr("alloc * 1000000L div avail").as("epochs_ppm"))
  }

  /** Horvitz–Thompson total estimator over the deterministic bernoulli
    * sample: Σ v/π for sampled rows, π = ratePpm constant — the
    * closing half of the sampling loop ("estimate corpus statistics
    * from the sample you can afford"), unbiased by construction, and
    * because the draw is the salted-hash [[bernoulli]], the estimate
    * is REPLAYABLE: same corpus + salt + rate → the same number on any
    * engine, unlike a rand() survey. The scaled sum rides
    * DECIMAL(38,0) ([[graft.operators.Audit.joinSizeEst]]'s contract).
    * Emits one row: (n_sampled, sampled_sum, est_total).
    */
  def htEstimate(df: DataFrame, key: Column, value: Column, ratePpm: Long,
                 salt: String): DataFrame = {
    require(ratePpm > 0 && ratePpm <= 1000000L, "rate must be in (0, 1e6] ppm")
    val thr = ratePpm * 4294967296L / 1000000L
    val k = coalesce(key.cast("string"), lit("\u0000<null-key>"))
    df.where(H.hash32(k, salt) < thr)
      .agg(count(lit(1)).as("n_sampled"),
        coalesce(sum(value.cast("long")), lit(0L)).as("sampled_sum"))
      .select(col("n_sampled"), col("sampled_sum"),
        expr(s"cast(floor((cast(sampled_sum as decimal(38,0)) * 4294967296) / $thr) as long)")
          .as("est_total"))
  }

  /** Deterministic per-epoch training order: every epoch draws an
    * independent pseudo-random permutation of the corpus from the salted
    * hash h = md5(salt:epoch:key) — same corpus + salt always yields the
    * same order (resumable runs re-derive it; no rand(), no persisted
    * shuffle files), and each epoch's order is uncorrelated with the
    * last (the epoch number is INSIDE the hash).
    *
    * The global sort a naive `ORDER BY h` implies is the scale trap —
    * so the permutation is sharded: shard = h mod `shards` (which
    * shard-assignment is itself part of the permutation's randomness),
    * position = rank of h within the shard. Readers consume shards in
    * any order / in parallel — the standard sharded-shuffle contract
    * of training-data loaders — and each (epoch, shard) sorts locally
    * under a partitioned window: one shuffle, no single-partition sort.
    * `shards` should be ≥ cluster parallelism and small enough that a
    * shard fits an executor's sort buffer (corpus/shards rows each).
    */
  def epochShuffle(df: DataFrame, key: Column, epochs: Int, shards: Int,
                   salt: String): DataFrame = {
    require(epochs >= 1 && shards >= 1)
    val k = coalesce(key.cast("string"), lit("\u0000<null-key>"))
    val exploded = df.select(key.as("doc_id"), k.as("__k"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("__h", H.hash32(
        concat(col("epoch").cast("string"), lit(":"), col("__k")), salt))
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
    // doc_id tie-break: 32-bit hash collisions are rare but real at
    // corpus scale, and the order must be total for reproducibility
    exploded
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("__h").asc, col("doc_id").asc)).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * via Importance Resampling"): score each raw document by how much
    * its hashed n-gram profile resembles a TARGET corpus rather than
    * the raw corpus, keep the top-K — the standard way to skim
    * domain-matched training data out of a web-scale crawl.
    *
    * Features are unigrams + word bigrams hashed into `buckets` buckets
    * (the hashing is what makes this corpus-scale: the model state is
    * two B-row count tables, never a vocabulary). Per-bucket log
    * importance ratio uses add-one smoothing over the bucket space,
    *   λ_b = ln((t_b + 1)/(T + B)) − ln((r_b + 1)/(R + B)),
    * QUANTIZED to an int64 in 10⁻⁴ nats; a document's score is the
    * exact-integer Σ c_b·λ4_b, so the fold is order-insensitive
    * (engine-portable — a float sum would hash-flake on partial-agg
    * order, SURVEY §6). Shuffles: one (doc, bucket) count aggregate on
    * the raw corpus, one bucket census each side; the λ table is
    * B rows and BROADCASTS back, so scoring is map-side on the count
    * table. Selection is TakeOrdered top-K (no global sort); the rank
    * window then runs on K rows (constant partition, declared bounded).
    * Output: (doc_id, score4, rk) — score4 in 10⁻⁴ nats.
    */
  def dsirTopK(raw: DataFrame, target: DataFrame, idCol: String,
               textCol: String, buckets: Long, k: Int): DataFrame = {
    require(buckets >= 2 && k >= 1)
    import graft.functions.{TextFunctions => T}
    // unsalted md5 prefix, the minhash/simhash oracle-twin hash family
    def feats(df: DataFrame) = df.select(col(idCol).as("doc_id"),
        explode(concat(T.tokens(col(textCol)),
          T.shingles(col(textCol), 2))).as("t"))
      .select(col("doc_id"),
        (conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
    // two consumers (raw census + per-doc score): materialize once
    val db = feats(raw).groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val rawB = db.groupBy(col("b")).agg(sum(col("c")).as("rc"))
    val tgtB = feats(target).groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val tot = rawB.agg(sum(col("rc")).as("rtot"))
      .crossJoin(tgtB.agg(coalesce(sum(col("tc")), lit(0L)).as("ttot")))
    // raw-side buckets only: a bucket no raw feature hits can't score a
    // raw document, so the left join keeps λ exactly where it's needed
    val lam = rawB.join(tgtB, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        round((log((coalesce(col("tc"), lit(0L)) + lit(1)).cast("double") /
                   (col("ttot") + lit(buckets)).cast("double")) -
               log((col("rc") + lit(1)).cast("double") /
                   (col("rtot") + lit(buckets)).cast("double"))) * 10000)
          .cast("long").as("lam4"))
    val sc = db.join(broadcast(lam), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("lam4")).as("score4"))
      .orderBy(col("score4").desc, col("doc_id").asc)
      .limit(k) // TakeOrdered: per-partition top-K, never a global sort
    sc.withColumn("rk", row_number().over(
        Window.partitionBy(lit(0)) // declared bounded: K rows
          .orderBy(col("score4").desc, col("doc_id").asc)).cast("long"))
  }

  /** Deterministic k-fold CV assignment + balance audit: fold =
    * hash32(key) mod k — the reshuffle-free, engine-replayable fold
    * draw (same salted-md5 kernel as [[bernoulli]]/[[split]]) — then
    * one row per (fold, class) with the class share of its fold in
    * exact ppm. This is the leakage-free bookkeeping a pipeline checks
    * BEFORE training k models: folds of roughly equal size whose class
    * mix matches the corpus. Map-side assignment; the only shuffle is
    * the (fold x class)-keyed count; the per-fold total is a window
    * over fold x class rows, never data rows.
    */
  def kfoldBalance(df: DataFrame, key: Column, cls: Column, k: Int,
                   salt: String): DataFrame = {
    require(k >= 2, "need at least two folds")
    val h = H.hash32(coalesce(key.cast("string"), lit("\u0000<null-key>")), salt)
    df.select((h % k).as("fold"), cls.as("cls"))
      .groupBy(col("fold"), col("cls")).agg(count(lit(1)).as("n"))
      .withColumn("n_fold", sum(col("n")).over(
        Window.partitionBy(col("fold"))))
      .select(col("fold"), col("cls"), col("n"), col("n_fold"),
        expr("n * 1000000L div n_fold").as("share_ppm"))
  }
}
