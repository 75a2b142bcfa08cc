package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import EventStreams.{Event, SessionOut}

/** Run the stateful streaming operators TO COMPLETION over the static
  * events table, so the driver's DuckDB oracle can check their final
  * output exactly like any batch query (VERDICT r7 task #4: rows 33/33b
  * graduate from spec-only to driver-oracle coverage).
  *
  * The replay discipline that makes streaming output == batch output:
  *
  *  - The watermark delay (45 days) exceeds the generator's 30-day data
  *    span, so while real data flows the watermark stays BELOW every
  *    real event: nothing is late, no state is evicted mid-replay, and
  *    per-user ordering concerns vanish because the whole table rides
  *    one micro-batch (the stateful closures sort each group by
  *    (ts, event_id) in-batch).
  *  - Event-time-timeout operators (the sessionizer) only emit their
  *    last open session once the watermark passes `last + gap`; a
  *    finite file never advances it that far. Two SENTINEL events on a
  *    reserved key (user_id = −1) with far-future timestamps are staged
  *    as separate parquet files with strictly later modification times:
  *    the file source (`latestFirst=false` sorts by mod time) delivers
  *    them as two trailing single-file micro-batches — the first jumps
  *    the watermark past every real timeout, the second gives the
  *    engine a batch in which those timeouts FIRE (timeouts use the
  *    watermark computed from the PREVIOUS batch). Sentinel output is
  *    filtered by key.
  *
  * The one-file staging of the real table is a property of this verify
  * harness, not of the operators: the streaming ops themselves are
  * watermark-bounded and run on unbounded multi-file feeds (StreamingSpec
  * covers out-of-order and cross-batch arrival); this harness exists to
  * pin their FINAL output against the batch twins' SQL on shared data.
  */
object StreamRun {

  private val SentinelUser = -1L

  /** Stage `frames` as one parquet directory where frame i's file(s)
    * carry strictly increasing modification times — the file stream
    * source (`latestFirst=false`, mod-time order) then delivers each
    * frame as its own micro-batch under `maxFilesPerTrigger=1`.
    * All frames must share a schema. Returns the input directory.
    */
  private def stageFrames(frames: Seq[org.apache.spark.sql.DataFrame]): String = {
    require(frames.nonEmpty)
    val root = Files.createTempDirectory("graft_stream_replay")
    root.toFile.deleteOnExit()
    val in = root.resolve("in").toString
    frames.head.coalesce(1).write.parquet(in)
    appendFrames(in, frames.drop(1))
    in
  }

  /** Append `frames` to an already-staged directory, each with a
    * modification time strictly AFTER everything present — so the file
    * source delivers them as new trailing micro-batches. The staging
    * half of the restart discipline: a backlog that keeps growing while
    * the query is down.
    */
  private def appendFrames(in: String,
                           frames: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    import scala.jdk.CollectionConverters._
    def parts(): Set[Path] = {
      val s = Files.list(Paths.get(in))
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSet
      finally s.close()
    }
    var seen = parts()
    var t = seen.map(p => Files.getLastModifiedTime(p).toMillis).max
    frames.foreach { f =>
      f.coalesce(1).write.mode("append").parquet(in)
      t += 60000L
      val now = parts()
      (now -- seen).foreach(p => Files.setLastModifiedTime(p,
        FileTime.fromMillis(t)))
      seen = now
    }
  }

  /** Stage the events table as one real parquet file plus `sentinels`
    * trailing single-row files with strictly increasing modification
    * times. Returns the input directory for the file stream source.
    */
  private def stage(spark: SparkSession, dir: String,
                    sentinels: Seq[java.sql.Timestamp]): String = {
    import spark.implicits._
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    stageFrames(events +: sentinels.zipWithIndex.map { case (sts, i) =>
      Seq((SentinelUser * (i + 2), sts, SentinelUser, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    })
  }

  /** Drain a streaming DataFrame to parquet with Trigger.AvailableNow
    * and return the materialized result.
    */
  private def drain(spark: SparkSession, out: DataFrame): DataFrame = {
    val root = Files.createTempDirectory("graft_stream_out")
    root.toFile.deleteOnExit()
    val sink = root.resolve("sink").toString
    val q = out.writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Streaming sessionizer run to completion on the static events table:
    * emits exactly the batch sessions (user_id, n_events, start_ms,
    * duration_ms) — the driver checks it against the batch twin's SQL.
    */
  def sessionizeReplay(spark: SparkSession, dir: String, gapMs: Long): DataFrame = {
    withStatePartitions(spark, 4) {
    import spark.implicits._
    // sentinel1 jumps the watermark past every real timeout; sentinel2
    // provides the batch in which they fire. 45-day delay > 30-day span.
    val maxMs = graft.Tables.events(spark, dir)
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    val delayMs = 45L * 86400000L
    val s1 = new java.sql.Timestamp(maxMs + gapMs + delayMs + 3600000L)
    val s2 = new java.sql.Timestamp(maxMs + gapMs + 2 * delayMs)
    val in = stage(spark, dir, Seq(s1, s2))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val sessions = EventStreams.watermarkedSessions(
      stream.as[Event], gapMs, watermark = "45 days")
    drain(spark, sessions.filter(col("user_id") =!= SentinelUser).toDF())
      .select("user_id", "n_events", "start_ms", "duration_ms")
  }}

  /** Streaming watermarked 1-hour tumbling-window aggregate run to
    * completion: the same sentinel discipline as [[sessionizeReplay]]
    * (append-mode aggregation emits a window only in a batch whose
    * START watermark has passed the window end, so sentinel1 advances
    * the watermark past every real window and sentinel2's batch flushes
    * them). Final table must equal the batch GROUP BY twin
    * ([[EventStreams.hourlyCounts]] vs plain SQL over events) —
    * graduating §2.6 row 32 from spec-only to driver-oracle coverage.
    */
  def windowAggReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    val maxMs = graft.Tables.events(spark, dir)
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    val delayMs = 45L * 86400000L
    val s1 = new java.sql.Timestamp(maxMs + delayMs + 3600000L)
    val s2 = new java.sql.Timestamp(maxMs + 2 * delayMs)
    val in = stage(spark, dir, Seq(s1, s2))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    // NO sentinel filter inside the streaming query: a predicate on
    // event_type — even above the aggregation, where it pushes back
    // through the grouping key — reaches the parquet scan, row-group
    // stats prune the sentinel file entirely, and the watermark never
    // advances (measured: 0 windows ever emitted). Sentinel windows
    // cannot emit anyway (their ends sit beyond the final watermark);
    // the belt-and-braces filter runs on the drained BATCH result.
    val agg = EventStreams.hourlyCounts(stream, watermark = "45 days")
    drain(spark, agg)
      .where(col("event_type") =!= "sentinel")
      .select(unix_millis(col("window.start")).as("win_ms"), col("event_type"),
        col("n_events"), col("value_cents"))
  }}

  /** Streaming stream-stream INTERVAL JOIN run to completion: each
    * purchase joins the same user's clicks in the preceding
    * `windowMinutes` ([[EventStreams.matchedPairs]], inner). Inner
    * matches emit in the micro-batch where both sides hold the rows —
    * no watermark advancement is needed for OUTPUT (only for state
    * eviction), so the whole table rides one staged micro-batch with
    * no sentinels, and the final table must equal the batch join twin.
    * Graduates §2.6 row 33c from spec-only to driver-oracle coverage.
    */
  def joinReplay(spark: SparkSession, dir: String,
                 windowMinutes: Int = 30): DataFrame = {
    withStatePartitions(spark, 4) {
    val in = stage(spark, dir, Seq.empty)
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val joined = EventStreams.matchedPairs(stream,
      graft.Params.AsofMatch, graft.Params.AsofTarget,
      watermark = "45 days", windowMinutes = windowMinutes)
    drain(spark, joined)
      .select(col("user_id"), col("buy_id"), col("click_id"), col("gap_ms"))
  }}

  /** Streaming LEFT-OUTER stream-stream join run to completion: matched
    * pairs emit in-batch like the inner form; an UNMATCHED click emits
    * its null row only in a batch whose starting watermark has passed
    * `click_ts + windowMinutes` — the moment the state store can prove
    * no future buy lands in its window and evicts the row. The sentinel
    * discipline therefore needs rows that pass BOTH sides' event_type
    * filters (each side computes its own watermark; the global one is
    * their min): each trailing file carries one far-future click and
    * one far-future purchase on distinct reserved negative users (so
    * they cannot match each other). Sentinel 1 advances both watermarks
    * past every real click's window end; sentinel 2's batch is where
    * those evictions FIRE. Sentinel output is filtered from the drained
    * BATCH result — never inside the streaming query, where the
    * predicate would reach the parquet scan, row-group stats would
    * prune the sentinel file, and the watermark would never advance
    * (the r11 stream_window_agg_replay trap). Graduates §2.6 row 33c2.
    */
  def leftJoinReplay(spark: SparkSession, dir: String,
                     windowMinutes: Int = 30): DataFrame = {
    withStatePartitions(spark, 4) {
    import spark.implicits._
    val maxMs = graft.Tables.events(spark, dir)
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    val delayMs = 45L * 86400000L
    def sentinelFile(ix: Int, ms: Long) = Seq(
      (SentinelUser * (2 * ix + 2), new java.sql.Timestamp(ms),
        SentinelUser, graft.Params.AsofMatch, 0.0),
      (SentinelUser * (2 * ix + 3), new java.sql.Timestamp(ms),
        SentinelUser - 1, graft.Params.AsofTarget, 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val in = stageFrames(Seq(events,
      sentinelFile(1, maxMs + delayMs + 3600000L),
      sentinelFile(2, maxMs + 2 * delayMs)))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val joined = EventStreams.matchedPairs(stream,
      graft.Params.AsofMatch, graft.Params.AsofTarget,
      watermark = "45 days", windowMinutes = windowMinutes,
      joinType = "left_outer")
    drain(spark, joined)
      .where(col("user_id") >= 0) // sentinel users are negative
      .select(col("user_id"), col("buy_id"), col("click_id"), col("gap_ms"))
  }}

  /** Streaming CDC ingestion run to completion ([[StreamingSpec]] 33i's
    * foreachBatch fold, driver-oracle'd): a deterministic change log
    * derived from orders arrives as THREE seq-ordered micro-batches —
    * updates at seq 1 (%7 keys, +1000) and seq 2 (%13 keys, +500) in
    * the SAME batch (in-batch latest-op-wins via the seq window), then
    * deletes at seq 3 (%11 keys) in a later batch (cross-batch fold
    * order). Each micro-batch folds into the parquet snapshot via
    * [[graft.etl.Staging.cdcApply]] with a materialize-then-swap (the
    * fold must never overwrite what it still reads). Because batches
    * partition the log by seq RANGE, the fold equals one global
    * latest-op-wins — the twin recomputes it from orders directly.
    */
  def cdcReplay(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(spark, dir, "orders")
    def logRows(mod: Int, bump: Double, op: String, seq: Long) =
      orders.filter(col("o_orderkey") % mod === 0)
        .withColumn("o_totalprice", col("o_totalprice") + bump)
        .withColumn("op", lit(op)).withColumn("seq", lit(seq))
    val in = stageFrames(Seq(
      logRows(7, 1000.0, "U", 1L).unionByName(logRows(13, 500.0, "U", 2L)),
      logRows(11, 0.0, "D", 3L)))
    val root = Files.createTempDirectory("graft_stream_cdc")
    root.toFile.deleteOnExit()
    val snap = root.resolve("snap").toString
    orders.write.parquet(snap)
    val schema = spark.read.parquet(in).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val next = graft.etl.Staging.cdcApply(
          spark.read.parquet(snap), b, Seq("o_orderkey"), "op", Seq("seq"))
        next.write.mode("overwrite").parquet(snap + "_tmp")
        spark.read.parquet(snap + "_tmp")
          .write.mode("overwrite").parquet(snap)
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(snap)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100.0).cast("long").as("price_cents"))
  }

  /** Stream-static enrichment run to completion ([[EventStreams.enrich]]
    * — broadcast dim per micro-batch, stateless, left join keeps
    * unmatched events): the dim is derived deterministically from the
    * event-type domain MINUS 'error', so both the matched and the
    * null-row path carry data. Final table must equal the batch LEFT
    * JOIN twin. Graduates §2.6 row 33e.
    */
  def enrichReplay(spark: SparkSession, dir: String): DataFrame = {
    val in = stage(spark, dir, Seq.empty)
    val dim = graft.Tables.events(spark, dir)
      .select(col("event_type")).distinct()
      .where(col("event_type") =!= "error")
      .withColumn("category", concat(lit("cat_"), col("event_type")))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    drain(spark, EventStreams.enrich(stream, dim, "event_type")
        .select(col("event_id"), col("user_id"), col("category")))
      .select(col("event_id"), col("user_id"), col("category"))
  }

  /** Custom TopK Aggregator inside a streaming aggregation, run to
    * completion: the events table is staged as TWO micro-batches split
    * by event_id parity, so the buffer's zero/reduce/MERGE path runs
    * across batches (a single batch would never exercise merge-into-
    * existing-state). Complete-mode memory sink + AvailableNow; the
    * final per-type top-K (value desc, id asc) must equal the batch
    * window twin. Graduates §2.6 row 33f.
    */
  def topkReplay(spark: SparkSession, dir: String, k: Int): DataFrame = {
    withStatePartitions(spark, 4) {
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val in = stageFrames(Seq(
      events.where(col("event_id") % 2 === 0),
      events.where(col("event_id") % 2 =!= 0)))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val fn = org.apache.spark.sql.functions.udaf(
      new graft.operators.TopKAggregator[Double, Long](k))
    val name = "graft_stream_topk_replay"
    val q = stream.groupBy(col("event_type"))
      .agg(fn(col("value"), col("event_id")).as("top"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
        col("p._2").as("event_id"),
        floor(col("p._1") * 100.0).cast("long").as("cents"))
  }}

  /** Idempotent merge-on-read sink run to completion ([[StreamingSpec]]
    * 33d): the events table is staged TWICE (a redelivered batch), the
    * writer foreachBatch-APPENDS every micro-batch verbatim — so the
    * sink parquet really holds each row twice — and the READ side
    * dedups on the key, turning at-least-once delivery into
    * exactly-once results with no table locks. Final read-side table
    * must equal the plain events table. Graduates §2.6 row 33d.
    */
  def idempotentSinkReplay(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val in = stageFrames(Seq(events, events))
    val root = Files.createTempDirectory("graft_stream_sink")
    root.toFile.deleteOnExit()
    val tbl = root.resolve("tbl").toString
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(tbl)
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sunk = spark.read.parquet(tbl)
    require(sunk.count() == 2 * events.count(),
      "idempotent-sink replay: the sink must hold BOTH deliveries verbatim")
    sunk.dropDuplicates("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"),
        floor(col("value") * 100.0).cast("long").as("cents"))
  }

  /** Stage arbitrary projections as mod-time-ordered single-file
    * micro-batches and open a file stream over them — the generic form
    * of [[stage]] for non-events tables (orders, documents, tokens).
    */
  private def streamFrames(spark: SparkSession,
                           frames: Seq[DataFrame]): DataFrame = {
    val in = stageFrames(frames)
    spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
  }

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the session value after. HARNESS tuning only: a
    * streaming stateful operator creates one state store per shuffle
    * partition per batch, and StageProbe measured ~4.6 s of fixed
    * store open/commit CPU per task on state stages carrying SEVEN
    * rows — 32 partitions × 2 batches of that dominated the replay
    * walls. The replays' state is a handful of groups by construction,
    * so they run at small fixed parallelism; production streams keep
    * the session's setting (state scales with keys there).
    */
  private def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Streaming bottom-k quantile sketch ([[QuantileStream.sketchStream]])
    * run to completion over TWO parity-split micro-batches of orders, so
    * the aggregator's cross-batch MERGE path carries state between
    * triggers. Because the sketch's merge is exact and order-independent,
    * the final complete-mode state is bit-identical to the batch sketch,
    * and the percentile estimates over it must equal the batch twin
    * (`q_kll_quantiles` — same oracle). Graduates §2.6 row 33j.
    */
  def kllReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    val o = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val stream = streamFrames(spark, Seq(
      o.where(col("o_orderkey") % 2 === 0),
      o.where(col("o_orderkey") % 2 =!= 0)))
    val name = "graft_stream_kll_replay"
    val q = QuantileStream.sketchStream(stream,
        year(col("o_orderdate")).cast("long"), "yearkey", col("o_orderkey"),
        floor(col("o_totalprice") * 100.0).cast("long"),
        graft.Params.KllK, graft.Params.KllSalt)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.operators.QuantileSketch.estimate(
      spark.table(name), "qs", graft.Params.KllPs)
  }}

  /** Streaming KMV distinct sketch ([[SketchStream.kmvDistinctStream]])
    * run to completion over TWO parity-split micro-batches of orders.
    * Any of the union's k smallest distinct hashes is in its own batch's
    * bottom-k, so the final state equals the batch sketch and the
    * emitted estimate must equal `q_kmv_distinct` (same oracle).
    * Graduates §2.6 row 33k (KMV half).
    */
  def kmvReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    val o = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_custkey"))
    val stream = streamFrames(spark, Seq(
      o.where(col("o_orderkey") % 2 === 0),
      o.where(col("o_orderkey") % 2 =!= 0)))
    val name = "graft_stream_kmv_replay"
    val q = SketchStream.kmvDistinctStream(stream,
        year(col("o_orderdate")).cast("long"), "yearkey", col("o_custkey"),
        graft.Params.KmvK, graft.Params.KmvSalt)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).select(col("yearkey"), col("n_est"))
  }}

  /** Streaming Misra–Gries heavy hitters
    * ([[FrequencyStream.heavyHittersStream]]) run to completion over TWO
    * doc-parity micro-batches of the documents token stream, then the
    * documented sketch-then-verify split: the stream maintains the
    * standing CANDIDATE summary (update-mode emissions; the driver keeps
    * each shard's LATEST — ≤ nShards·k rows, a bounded sketch, so the
    * collect is a summary not a table scan); a batch pass verifies
    * candidates exactly against cold storage. Every true heavy hitter
    * (n·HhDenom > n_total ⇒ n > n_shard/(k+1) since its whole count
    * lands in one shard and k+1 = HhMgK+1 > HhDenom)
    * ALWAYS survives its shard's counters, so the verified set must
    * equal the batch twin `q_heavy_hitters` (same oracle). Graduates
    * §2.6 row 33k (Misra–Gries half).
    */
  def heavyHittersReplay(spark: SparkSession, dir: String,
                         nShards: Int = 8): DataFrame = {
    withStatePartitions(spark, 4) {
    import spark.implicits._
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val stream = streamFrames(spark, Seq(
      toks.where(col("doc_id") % 2 === 0).select("tok"),
      toks.where(col("doc_id") % 2 =!= 0).select("tok")))
    val latest = scala.collection.mutable.HashMap.empty[Int, Seq[String]]
    val root = Files.createTempDirectory("graft_stream_hh")
    root.toFile.deleteOnExit()
    val q = FrequencyStream.heavyHittersStream(stream, col("tok"),
        nShards, graft.Params.HhMgK)
      .writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[FrequencyStream.MgCandidate],
         _: Long) =>
          b.collect().groupBy(_.shard).foreach { case (s, rows) =>
            latest.synchronized { latest(s) = rows.map(_.item).toSeq }
          }
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val cand = latest.synchronized { latest.values.flatten.toVector.distinct }
    val counts = toks.groupBy(col("tok").as("term")).agg(count(lit(1)).as("n"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    counts.join(broadcast(cand.toDF("term")), "term")
      .crossJoin(broadcast(total))
      .where(col("n") * graft.Params.HhDenom > col("n_total"))
      .select(col("term"), col("n"), col("n_total"))
  }}

  /** Streaming MinHash-LSH near-dup detection
    * ([[DedupStream.nearDupCandidates]]) run to completion over TWO
    * doc-id-ordered micro-batches of documents (ids ≤ mid arrive first,
    * so cross-batch claims are exercised and the per-band claimant is
    * deterministically the band's MIN doc_id; ts is synthesized monotone
    * in doc_id, the horizon exceeds the synthetic span so no claim
    * expires mid-replay). Final candidates must equal the first-claimant
    * twin: per (band_id, bk), pairs (min doc, every later doc).
    * Graduates §2.6 row 33j (MinHash band state).
    */
  def minhashReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        timestamp_seconds(lit(1577836800L) + col("doc_id")).as("ts"))
    val mid = docs.agg(((min(col("doc_id")) + max(col("doc_id"))) / 2)
      .cast("long")).head().getLong(0)
    // width-floor per micro-batch: the replay stages each frame as ONE
    // file (the mod-time batch-boundary contract of stageFrames), so the
    // CPU-heavy map-side signature expression inside nearDupCandidates
    // would run as a single task per batch (measured r15: two 3 s
    // one-task stages were 75% of this query at sf0.1/32 cores). A
    // production feed arrives as many files per trigger and never needs
    // this; the repartition carries only the raw doc rows, once, and the
    // stateful operator's own exchange (4 state partitions) is unchanged.
    val stream = streamFrames(spark, Seq(
        docs.where(col("doc_id") <= mid), docs.where(col("doc_id") > mid)))
      .repartition(spark.sparkContext.defaultParallelism)
      .withWatermark("ts", "3650 days")
    val out = DedupStream.nearDupCandidates(stream, "doc_id", "text", "ts",
      horizonMs = 3650L * 86400000L,
      k = graft.Params.MinhashK, bands = graft.Params.MinhashBands)
    drain(spark, out.toDF())
      .select(col("doc_a"), col("doc_b"),
        col("band_id").cast("long").as("band_id"), col("bk"))
  }}

  /** Streaming chi-squared drift guard ([[DriftStream.chi2Guard]]) run
    * to completion: the post-split order prices arrive as TWO
    * parity-split micro-batches, each scored independently against the
    * static pre-split reference (the guard is stateless by design —
    * foreachBatch, a batch job per trigger). The per-batch pooled
    * statistics (chi2_ppm, n_buckets, n_rows) must equal the twin's
    * per-parity-cohort chi-squared aggregates. Graduates §2.6 row 33l
    * (drift-guard half).
    */
  def driftReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = graft.Tables.load(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("y"),
        floor(col("o_totalprice") * 100.0).cast("long").as("c"),
        col("o_orderkey"))
    val ref = o.where(col("y") <= lit(graft.Params.DriftSplitYear)).select("c")
    val cur = o.where(col("y") > lit(graft.Params.DriftSplitYear))
    val stream = streamFrames(spark, Seq(
      cur.where(col("o_orderkey") % 2 === 0).select("c"),
      cur.where(col("o_orderkey") % 2 =!= 0).select("c")))
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = DriftStream.chi2Guard(stream, ref,
      expr(s"c div ${graft.Params.DriftBucketCents}"),
      (id, chi2, nb, nr) => buf.synchronized { buf += ((id, chi2, nb, nr)) })
    try q.processAllAvailable() finally q.stop()
    buf.synchronized { buf.sortBy(_._1).toVector }
      .toDF("batch_id", "chi2_ppm", "n_buckets", "n_rows")
  }

  /** Streaming z-score anomaly alerts ([[AnomalyStream.zAlerts]]) run to
    * completion over TWO time-split micro-batches of events (first half
    * by timestamp arrives first, so per-key (ts, event_id) processing
    * order is globally preserved and the exact integer state folds
    * ACROSS batches). The alert set must equal the batch twin
    * `events_zscore_alerts` (same oracle — backfill == live feed is the
    * operator's contract). Graduates §2.6 row 33m.
    */
  def zscoreReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    import spark.implicits._
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val b = events.agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
      .head()
    val midMs = (b.getLong(0) + b.getLong(1)) / 2
    val in = stageFrames(Seq(
      events.where(unix_millis(col("ts")) <= midMs),
      events.where(unix_millis(col("ts")) > midMs)))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val alerts = AnomalyStream.zAlerts(stream.as[Event])
    drain(spark, alerts.toDF())
      .select(col("event_type"), col("event_id"), col("cents"), col("n_prior"))
  }}

  /** Checkpoint-restart recovery run as a driver-oracle query (§2.6 row
    * 33h, VERDICT r13 task #3): HALF the events backlog is staged and
    * drained by one AvailableNow run of a stateful per-type aggregation
    * (complete mode, store-backed state), the query STOPS (the
    * deploy/kill window), the rest of the backlog lands as later-mtime
    * files, and a SECOND query starts on the SAME checkpoint. The
    * restarted query must recover the aggregation state AND consult the
    * checkpointed file-source offsets: a state loss undercounts, a
    * re-read of already-committed files double-counts — either way the
    * final table hash-fails against the batch GROUP BY twin over the
    * whole table. A mid-point require pins that the first run really
    * drained ONLY the first half (so the restart is load-bearing, not
    * a single-run pass in disguise).
    */
  def restartReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    def part(i: Int) = events.where(pmod(col("event_id"), lit(4)) === i)
    val in = stageFrames(Seq(part(0), part(1)))
    val root = Files.createTempDirectory("graft_stream_restart")
    root.toFile.deleteOnExit()
    val ckpt = root.resolve("ckpt").toString
    val name = "graft_stream_restart_replay"
    def run(): Unit = {
      val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
      val q = stream.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100.0).cast("long")).as("value_cents"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // drains the visible half, then terminates — the "kill"
    val firstSeen = spark.table(name).agg(sum(col("n_events"))).head().getLong(0)
    val firstHalf = part(0).count() + part(1).count()
    require(firstSeen == firstHalf,
      s"restart replay: first run must drain exactly the staged half " +
        s"($firstHalf rows), saw $firstSeen")
    appendFrames(in, Seq(part(2), part(3)))
    run() // restart on the SAME checkpoint: recovered state + new files only
    spark.table(name)
      .select(col("event_type"), col("n_events"), col("value_cents"))
  }}

  /** Streaming per-key throttle ([[ThrottleStream.throttle]]) run to
    * completion (§2.6 row 33l, VERDICT r13 task #3): events arrive as
    * TWO time-split micro-batches (first half by timestamp first, so
    * per-key event-time order is globally preserved and the last-passed
    * anchor folds ACROSS batches — batch 2 suppressions against batch
    * 1 anchors are exercised). Pass/suppress is deterministic in event
    * time, so the final passed set must equal the batch recurrence twin
    * (per-key recursive fold in the oracle). The 45-day watermark
    * exceeds the data span: no state times out mid-replay, nothing is
    * late — timeout semantics stay covered by StreamingSpec.
    */
  def throttleReplay(spark: SparkSession, dir: String,
                     cooldownMs: Long): DataFrame = {
    withStatePartitions(spark, 4) {
    import spark.implicits._
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val b = events.agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
      .head()
    val midMs = (b.getLong(0) + b.getLong(1)) / 2
    val in = stageFrames(Seq(
      events.where(unix_millis(col("ts")) <= midMs),
      events.where(unix_millis(col("ts")) > midMs)))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val passed = ThrottleStream.throttle(stream.as[Event], cooldownMs,
      watermark = "45 days")
    drain(spark, passed.toDF())
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
  }}

  /** Watermark late-drop observability as a DRIVER row (§2.6 row 33n,
    * VERDICT r14 #7 — previously the only streaming signal never
    * hash-checked): three staged micro-batches — the real events, a
    * far-future sentinel that advances the watermark ONE DAY past every
    * real timestamp, then a deliberately LATE frame (the deterministic
    * event_id % 37 slice of the real events, re-keyed so dedup-free
    * operators still see fresh rows). The watermarked windowed
    * aggregation must DROP every late row and account for each one in
    * `numRowsDroppedByWatermark`. Output is ONE row
    * (n_late_staged, n_dropped_by_watermark, all_late_dropped); the
    * twin recomputes the staged-late count from the events table and
    * asserts the dropped count EQUAL — an engine that silently accepts
    * late data (state-bound leak) or loses it without accounting
    * (ops-blind loss) hash-fails either way.
    */
  def lateDropReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    import spark.implicits._
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val maxMs = events.agg(max(unix_millis(col("ts")))).head().getLong(0)
    val delayMs = 45L * 86400000L
    // sentinel ts − 45-day watermark delay = maxMs + 1 day: past every
    // real hour window, so the whole late frame lands below the line.
    // TWO sentinels, not one (the sessionizeReplay discipline, measured
    // here too): the late-record filter runs on the watermark COMMITTED
    // a batch earlier, so a late frame staged directly after a single
    // sentinel is filtered against the PRE-sentinel watermark and
    // silently admitted — the second sentinel's batch is what makes the
    // advanced watermark effective for the frame after it.
    val s1 = new java.sql.Timestamp(maxMs + delayMs + 86400000L)
    val s2 = new java.sql.Timestamp(maxMs + delayMs + 2L * 86400000L)
    def sentinel(i: Long, sts: java.sql.Timestamp) =
      Seq((SentinelUser * (i + 2), sts, SentinelUser, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    val late = events.where(col("event_id") % 37 === 0)
      .select((col("event_id") + lit(1000000000L)).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"))
    val nLate = late.count()
    val in = stageFrames(Seq(events, sentinel(0, s1), sentinel(1, s2), late))
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val agg = stream
      .withWatermark("ts", "45 days")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val root = Files.createTempDirectory("graft_stream_latedrop")
    root.toFile.deleteOnExit()
    val q = agg.writeStream
      .format("parquet")
      .option("path", root.resolve("sink").toString)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the operational counter the row certifies: every stateful op's
    // per-batch numRowsDroppedByWatermark, summed across the run
    val dropped = q.recentProgress
      .map(p => p.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
    System.err.println(s"[graft][latedrop] batches=${q.recentProgress.length} " +
      s"dropped=$dropped staged=$nLate")
    Seq((nLate, dropped, dropped == nLate))
      .toDF("n_late_staged", "n_dropped_by_watermark", "all_late_dropped")
  }}

  /** Streaming watermark-bounded exact dedup run to completion: the
    * table is staged TWICE (two micro-batches), the second pass is
    * dropped entirely by per-key state, and the final output is exactly
    * one row per event_id — checked against plain SQL over the table.
    */
  def dedupeReplay(spark: SparkSession, dir: String): DataFrame = {
    withStatePartitions(spark, 4) {
    val root = Files.createTempDirectory("graft_stream_dedup")
    root.toFile.deleteOnExit()
    val in = root.resolve("in").toString
    val events = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // two identical files = the same rows in two micro-batches; mtime
    // order is irrelevant (copies are identical) and the 45-day horizon
    // exceeds the data span, so no dedup state expires mid-replay
    events.coalesce(1).write.parquet(in)
    events.coalesce(1).write.mode("append").parquet(in)
    val stream = EventStreams.readEventsStream(spark, in, maxFilesPerTrigger = 1)
    val deduped = EventStreams.dedupeStream(stream, watermark = "45 days")
    drain(spark, deduped)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"),
        floor(col("value") * 100.0).cast("long").as("cents"))
  }}
}
