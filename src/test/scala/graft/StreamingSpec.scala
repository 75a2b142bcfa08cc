package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming operators (#32/#33 in SURVEY.md §2) driven through
  * MemoryStream with a memory sink — real micro-batch execution, state
  * store and watermark included.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked hourly window aggregates in append mode after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(stream.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:55:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 10:20:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough that the 10:00 window closes
      stream.addData(Event(4, ts("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select(col("window.start").cast("string"), col("event_type"), col("n_events"))
        .as[(String, String, Long)].collect().toSet
      assert(rows === Set(
        ("2024-01-01 10:00:00", "click", 2L),
        ("2024-01-01 10:00:00", "view", 1L)))
    } finally q.stop()
  }

  test("watermark late-drop counter: operational visibility of discarded rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(stream.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("hourly_drops")
      .outputMode("append").start()
    try {
      stream.addData(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // push the watermark far ahead, then deliver an event hours late:
      // the state op must COUNT the drop (numRowsDroppedByWatermark) —
      // the signal an ops dashboard alarms on; silent loss is the bug
      stream.addData(Event(2, ts("2024-01-01 15:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      stream.addData(Event(3, ts("2024-01-01 10:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, s"late row not counted as dropped (got $dropped)")
    } finally q.stop()
  }

  test("stateful sessionizer closes a session on in-batch gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.watermarkedSessions(stream.toDS(), gapMs = 1800000L)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "click", 1.0),
        Event(3, ts("2024-01-01 02:00:00"), 7, "click", 1.0)) // gap > 30min closes first session
      q.processAllAvailable()
      val rows = spark.table("sessions").as[EventStreams.SessionOut].collect().toSet
      assert(rows === Set(EventStreams.SessionOut(7, 2,
        ts("2024-01-01 00:00:00").getTime, 600000L)))
    } finally q.stop()
  }

  test("event-time sessionizer: replayed batches reproduce the batch twin exactly") {
    // VERDICT r1 #3: with EventTimeTimeout, session closure depends only
    // on event time + watermark, so replaying the same data gives the
    // same sessions — and they equal the batch form's.
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 00:05:00"), 8, "view", 1.0),
      Event(3, ts("2024-01-01 00:10:00"), 7, "click", 1.0))
    val batch2 = Seq(Event(4, ts("2024-01-01 02:00:00"), 7, "click", 1.0))
    // watermark driver: far-future event for an unrelated user closes
    // every session of users 7/8 via event-time timeout
    val batch3 = Seq(Event(5, ts("2024-01-01 06:00:00"), 9, "click", 1.0))

    def run(name: String): Set[(Long, Long, Long, Long)] = {
      val stream = MemoryStream[Event]
      val q = EventStreams.watermarkedSessions(stream.toDS(), gapMs = 1800000L,
          watermark = "10 minutes")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        Seq(batch1, batch2, batch3).foreach { b =>
          stream.addData(b: _*)
          q.processAllAvailable()
        }
        spark.table(name).as[EventStreams.SessionOut].collect()
          .map(s => (s.user_id, s.n_events, s.start_ms, s.duration_ms))
          .filter(_._1 != 9L).toSet // user 9's session is still open
      } finally q.stop()
    }

    val first = run("replay_a")
    val second = run("replay_b")
    assert(first === second, "replaying identical batches must give identical sessions")

    val batchTwin = graft.operators.EventOps
      .sessionize((batch1 ++ batch2).toDF(), "user_id", "ts", 1800000L)
      .select(col("user_id"), col("n_events"), col("start_ms"), col("duration_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(first === batchTwin, "streamed sessions must equal the batch twin")
  }

  test("sessionizer merges a legally-late out-of-order event without regressing the envelope") {
    // ADVICE r2: an event older than lastMs arriving in a LATER batch
    // (legal inside the watermark delay) must extend the session envelope
    // monotonically — n_events counts it, duration never goes negative,
    // and startMs lowers when the late event precedes the session start.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.watermarkedSessions(stream.toDS(), gapMs = 1800000L,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("ooo_sessions").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 01:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 01:10:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // later batch, earlier event time: inside the 2h watermark and
      // within gap of the session start → must merge, lowering startMs
      stream.addData(Event(3, ts("2024-01-01 00:45:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // watermark driver closes user 7's session
      stream.addData(Event(4, ts("2024-01-01 09:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ooo_sessions").as[EventStreams.SessionOut]
        .collect().filter(_.user_id == 7L).toSet
      assert(rows === Set(EventStreams.SessionOut(7, 3,
        ts("2024-01-01 00:45:00").getTime, 1500000L)))
    } finally q.stop()
  }

  test("adjacent too-old events sessionize together, not as n singletons") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.watermarkedSessions(stream.toDS(), gapMs = 1800000L,
        watermark = "6 hours")
      .writeStream.format("memory").queryName("old_burst").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 04:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 04:10:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // a replayed burst far older than the live session (legal inside
      // the 6h watermark): 02:00/02:10 are within gap of each other →
      // ONE 2-event session, not two singletons
      stream.addData(
        Event(3, ts("2024-01-01 02:00:00"), 7, "click", 1.0),
        Event(4, ts("2024-01-01 02:10:00"), 7, "click", 1.0))
      q.processAllAvailable()
      val burst = spark.table("old_burst").as[EventStreams.SessionOut]
        .collect().filter(s => s.user_id == 7L &&
          s.start_ms == ts("2024-01-01 02:00:00").getTime)
      assert(burst.toSeq === Seq(EventStreams.SessionOut(7, 2,
        ts("2024-01-01 02:00:00").getTime, 600000L)))
    } finally q.stop()
  }

  test("too-old burst merges into the live session when a later event lowers the envelope") {
    // ADVICE r3: an event routed to the batch-local too-old session is
    // judged against the live start AT THAT MOMENT; a later event in the
    // same sorted batch can lower the live start to within the gap of it.
    // The batch-end reconciliation must merge the two — otherwise two
    // sessions whose extents are within gapMs both emit, diverging from
    // the batch twin. gap=10m: live session starts 01:40; next batch
    // delivers 01:25 (15m before live start → too-old) then 01:35 (merges,
    // lowering live start to 01:35, which is exactly 10m after 01:25).
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.watermarkedSessions(stream.toDS(), gapMs = 600000L,
        watermark = "6 hours")
      .writeStream.format("memory").queryName("old_merge").outputMode("append").start()
    try {
      stream.addData(Event(1, ts("2024-01-01 01:40:00"), 7, "click", 1.0))
      q.processAllAvailable()
      stream.addData(
        Event(2, ts("2024-01-01 01:25:00"), 7, "click", 1.0),
        Event(3, ts("2024-01-01 01:35:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // watermark driver closes user 7's session via event-time timeout
      stream.addData(Event(4, ts("2024-01-01 09:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("old_merge").as[EventStreams.SessionOut]
        .collect().filter(_.user_id == 7L).toSet
      assert(rows === Set(EventStreams.SessionOut(7, 3,
        ts("2024-01-01 01:25:00").getTime, 900000L)),
        "01:25/01:35/01:40 are pairwise within-gap after the envelope lowers — one session")
    } finally q.stop()
  }

  test("streaming dedup drops in-batch and cross-batch duplicates, state watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.dedupeStream(stream.toDF(), watermark = "1 hour")
      .select(col("event_id"))
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(1, ts("2024-01-01 00:00:30"), 7, "click", 1.0), // in-batch dup
        Event(2, ts("2024-01-01 00:01:00"), 8, "view", 1.0))
      q.processAllAvailable()
      stream.addData(
        Event(2, ts("2024-01-01 00:02:00"), 8, "view", 1.0),  // cross-batch dup
        Event(3, ts("2024-01-01 00:03:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("file-source stream over the events parquet matches the batch read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evstream").toString
    // stage the sf0.001 events file as the stream's input directory
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/part-0.parquet"))
    val q = EventStreams.readEventsStream(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ev_file").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_file").as[(String, Long)].collect().toMap
      val batch = Tables.events(spark, sfDir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches and terminates") {
    // the backfill mode: process everything currently in the source —
    // honoring maxFilesPerTrigger per micro-batch, so a month of backlog
    // does not become one giant batch — then stop on its own. This is
    // how a catch-up run of the streaming pipeline is operated at scale
    // (same query, same checkpoint; no always-on cluster).
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    // stage the same events file under THREE names: 3 input files against
    // maxFilesPerTrigger=1 forces at least 3 micro-batches
    (0 until 3).foreach { i =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        java.nio.file.Paths.get(s"$dir/part-$i.parquet"))
    }
    val q = EventStreams.readEventsStream(spark, dir, maxFilesPerTrigger = 1)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ev_avnow").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000),
        "AvailableNow must terminate by itself once the backlog drains")
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"maxFilesPerTrigger=1 over 3 files needs >=3 batches, got $batches")
      val streamed = spark.table("ev_avnow").as[(String, Long)].collect().toMap
      val batch = Tables.events(spark, sfDir)
        .groupBy(col("event_type")).agg((count(lit(1)) * 3).as("n"))
        .as[(String, Long)].collect().toMap
      assert(streamed === batch, "backfill total must equal 3x the batch read")
    } finally q.stop()
  }

  test("restart from the same checkpoint is exactly-once: old files are not recounted") {
    // the operational core of a long-lived pipeline: the query dies (or
    // is stopped for a deploy), restarts against the SAME checkpoint,
    // and must resume where it left off — processed source files skipped,
    // aggregation state recovered — with totals identical to a single
    // uninterrupted run.
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val src = s"$root/in"
    val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()
    def stage(i: Int): Unit = java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$src/part-$i.parquet"))
    def runToCompletion(): Unit = {
      val q = EventStreams.readEventsStream(spark, src, maxFilesPerTrigger = 1)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("ev_restart").outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000), "AvailableNow run must terminate")
      finally q.stop()
    }
    stage(0)
    runToCompletion()
    val perFile = Tables.events(spark, sfDir).count()
    assert(spark.table("ev_restart").agg(sum(col("n"))).head.getLong(0) === perFile)
    stage(1); stage(2)
    runToCompletion()
    assert(spark.table("ev_restart").agg(sum(col("n"))).head.getLong(0) === 3 * perFile,
      "restart must recover state and count each file exactly once — " +
        "a recount of part-0 would show 4x, a state loss 2x")
  }

  test("stream-stream join matches buys to prior clicks inside the window only") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.matchedPairs(stream.toDF(), "click", "purchase",
        watermark = "1 hour", windowMinutes = 30)
      .writeStream.format("memory").queryName("pairs").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "purchase", 1.0), // inside 30m → match
        Event(3, ts("2024-01-01 02:00:00"), 7, "purchase", 1.0), // no click in window
        Event(4, ts("2024-01-01 00:05:00"), 8, "click", 1.0))    // never buys
      q.processAllAvailable()
      val rows = spark.table("pairs").as[(Long, Long, Long, Long)].collect().toSet
      assert(rows === Set((7L, 2L, 1L, 600000L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks after watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.matchedPairs(stream.toDF(), "click", "purchase",
        watermark = "1 hour", windowMinutes = 30, joinType = "left_outer")
      .writeStream.format("memory").queryName("pairs_lo").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "purchase", 1.0), // match
        Event(4, ts("2024-01-01 00:05:00"), 8, "click", 1.0))    // never buys
      q.processAllAvailable()
      // the unmatched click can only emit once the watermark on BOTH
      // sides clears its window end (00:35) — advance each side past it
      stream.addData(
        Event(90, ts("2024-01-01 03:00:00"), 98, "click", 1.0),
        Event(91, ts("2024-01-01 03:00:00"), 99, "purchase", 1.0))
      q.processAllAvailable()
      q.processAllAvailable() // second cycle: watermark moves at batch boundaries
      val rows = spark.table("pairs_lo")
        .select($"user_id", $"buy_id", $"click_id", $"gap_ms")
        .collect().map(r => (r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
      assert(rows.contains((7L, Some(2L), 1L, Some(600000L))),
        s"matched pair must emit: $rows")
      assert(rows.contains((8L, None, 4L, None)),
        s"unmatched click must emit nulls after eviction: $rows")
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "engagement"), ("purchase", "revenue"))
      .toDF("event_type", "category")
    val stream = MemoryStream[Event]
    val q = EventStreams.enrich(stream.toDF(), dim, "event_type")
      .select(col("event_id"), col("category"))
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:01:00"), 7, "view", 1.0), // no dim row → null
        Event(3, ts("2024-01-01 00:02:00"), 8, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").as[(Long, Option[String])].collect().toSet
      assert(rows === Set((1L, Some("engagement")), (2L, None), (3L, Some("revenue"))))
    } finally q.stop()
  }

  test("foreachBatch append + read-side key dedup is an idempotent sink") {
    // merge-on-read sink pattern: the writer APPENDS micro-batches (so a
    // redelivered batch just lands twice) and readers dedup on the key —
    // exactly-once results from at-least-once delivery, no table locks
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/tbl"
    val stream = MemoryStream[Event]
    val q = stream.toDS().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Event], _: Long) =>
        b.write.mode("append").parquet(dir)
      }
      .option("checkpointLocation", dir + "_ckpt")
      .start()
    val batch2 = Seq(Event(3, ts("2024-01-01 01:00:00"), 8, "view", 2.0))
    try {
      stream.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "click", 1.0))
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // simulate an at-least-once redelivery of batch 2
    batch2.toDS().write.mode("append").parquet(dir)
    val read = spark.read.parquet(dir)
    assert(read.count() === 4, "raw table carries the duplicate")
    val deduped = graft.etl.Staging
      .dedupByKeyKeepFirst(read, Seq("event_id"), Seq(col("event_id")))
      .select(col("event_id")).as[Long].collect().sorted
    assert(deduped.toSeq === Seq(1L, 2L, 3L))
  }

  test("custom TopK Aggregator runs inside a streaming aggregation with partial merges") {
    // the same bounded-buffer Aggregator the batch marts use — streaming
    // aggregation exercises its zero/reduce/merge across micro-batches,
    // so per-(group, mapper) state stays K rows on an unbounded feed
    implicit val sqlCtx = spark.sqlContext
    val fn = udaf(new graft.operators.TopKAggregator[Double, Long](3))
    val stream = MemoryStream[Event]
    val q = stream.toDF()
      .groupBy(col("event_type"))
      .agg(fn(col("value"), col("event_id")).as("top"))
      .writeStream.format("memory").queryName("stream_topk").outputMode("complete").start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 00:01:00"), 7, "click", 5.0),
        Event(2, ts("2024-01-01 00:02:00"), 7, "click", 9.0),
        Event(3, ts("2024-01-01 00:03:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // a later micro-batch must MERGE into the existing top buffer:
      // 7.0 displaces 1.0, the duplicate 9.0 ranks after the earlier id
      stream.addData(
        Event(4, ts("2024-01-01 00:04:00"), 7, "click", 7.0),
        Event(5, ts("2024-01-01 00:05:00"), 7, "click", 9.0))
      q.processAllAvailable()
      val top = spark.table("stream_topk").filter($"event_type" === "click")
        .select(explode($"top").as("p")).select($"p._1", $"p._2")
        .as[(Double, Long)].collect().toSeq
      assert(top === Seq((9.0, 2L), (9.0, 5L), (7.0, 4L)))
    } finally q.stop()
  }

  test("streaming hourly agg matches the batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 50).map(i =>
      Event(i, ts(f"2024-01-01 ${i % 5}%02d:${i % 60}%02d:00"), i % 3, if (i % 2 == 0) "a" else "b", i * 0.37))
    val stream = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(stream.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("twin").outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("twin")
        .select(hour(col("window.start")).cast("long").as("h"), col("event_type"),
          col("n_events"), col("value_cents"))
        .as[(Long, String, Long, Long)].collect().toSet
      val batch = graft.operators.EventOps
        .hourlyAgg(events.toDF(), "ts", "event_type", "value")
        .select(col("h"), col("event_type"), col("n_events"), col("value_cents"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming CDC: foreachBatch folds each micro-batch into the snapshot") {
    // the incremental-ingestion loop end-to-end: a CDC feed arrives as a
    // stream, each micro-batch folds into the snapshot via cdcApply
    // (latest-op-wins inside a batch via seq; across batches via the
    // fold order). A real deployment writes a versioned dir and swaps —
    // the fold logic is what's under test.
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val snapDir = base + "/snap"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(snapDir)
    val stream = MemoryStream[(Long, String, String, Long)]
    val q = stream.toDS().toDF("k", "v", "op", "seq").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = graft.etl.Staging
          .cdcApply(spark.read.parquet(snapDir), b, Seq("k"), "op", Seq("seq"))
        // materialize BEFORE overwriting what it reads from
        next.write.mode("overwrite").parquet(snapDir + "_tmp")
        spark.read.parquet(snapDir + "_tmp")
          .write.mode("overwrite").parquet(snapDir)
      }
      .option("checkpointLocation", base + "/ckpt")
      .start()
    try {
      stream.addData((2L, "b2", "U", 1L), (3L, "c", "I", 2L))
      q.processAllAvailable()
      // cross-batch delete + an in-batch out-of-order pair (seq 4 wins)
      stream.addData((1L, "x", "D", 3L), (3L, "zzz", "U", 3L), (3L, "c2", "U", 4L))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.read.parquet(snapDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fin === Set((2L, "b2"), (3L, "c2")))
  }

  test("streaming near-dup: batch parity, first-claimant pairing, state eviction") {
    import graft.streaming.DedupStream
    implicit val sqlCtx = spark.sqlContext
    val near = "spark shuffles the partitions and sorts each group by key before merging output"
    val far = "completely different words about gardens flowers bees and honey production"
    val far2 = "unrelated second filler text that keeps the watermark moving along nicely here"
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = stream.toDS().toDF("doc_id", "text", "ts")
      .withWatermark("ts", "10 minutes")
    val q = DedupStream.nearDupCandidates(docs, "doc_id", "text", "ts",
        horizonMs = 3600000L)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    def pairs(): Set[(Long, Long)] = spark.table("neardup_stream")
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // batch 1: near pair (1,2) in-batch + a disjoint doc
      stream.addData((1L, near, ts("2024-01-01 00:00:00")),
        (2L, near + " tail", ts("2024-01-01 00:00:30")),
        (3L, far, ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // streaming pairs == the batch twin's candidates on the same docs
      val batchPairs = graft.operators.Dedup.minhashCandidates(
          Seq((1L, near), (2L, near + " tail"), (3L, far)).toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs() === batchPairs && batchPairs === Set((1L, 2L)))
      // batch 2: cross-batch near-dup pairs with the FIRST claimant (1)
      stream.addData((4L, near + " more", ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L), (1L, 4L)))
      // batches 3+4: move the watermark past the horizon (claims from
      // 00:05 time out at 01:05; watermark reaches 09:50), firing evictions
      stream.addData((6L, far2, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      stream.addData((7L, "entirely separate topic covering ovens bread flour yeast and baking times", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // batch 5: a new near-dup arrives AFTER eviction — no pair against
      // doc 1 (its claims are gone); doc 5 re-claims the bands fresh
      stream.addData((5L, near + " late", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L), (1L, 4L)))
      // batch 6: the NEXT near-dup pairs with the new claimant, not doc 1
      stream.addData((8L, near + " newest", ts("2024-01-01 10:04:00")))
      q.processAllAvailable()
      assert(pairs() === Set((1L, 2L), (1L, 4L), (5L, 8L)))
    } finally q.stop()
  }

  test("streaming chi2 guard: in-distribution batch scores low, shifted batch spikes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    // reference: uniform over a..d
    val ref = (0 until 100).map(i => s"${('a' + i % 4).toChar}").toDF("value")
    val scores = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val q = graft.streaming.DriftStream.chi2Guard(
      stream.toDF(), ref, col("value"),
      (id, chi2, nb, nr) => scores.synchronized { scores(id) = (chi2, nb, nr) })
    try {
      // batch ~reference-shaped → small statistic
      stream.addData(Seq("a", "b", "c", "d", "a", "b", "c", "d"): _*)
      q.processAllAvailable()
      // batch all-"e" (a bucket the reference has NEVER seen) → spike
      stream.addData(Seq.fill(8)("e"): _*)
      q.processAllAvailable()
      val s = scores.synchronized(scores.toMap)
      assert(s.size === 2)
      val (inDist, shifted) = (s(0L), s(1L))
      assert(inDist._3 === 8L && shifted._3 === 8L)
      // uniform batch vs uniform ref: χ²=0 exactly (counts proportional);
      // the disjoint batch is maximal: χ² = N (here 108·1e6 over ppm-floor)
      assert(inDist._1 === 0L, s"in-distribution batch must score 0, got $inDist")
      assert(shifted._1 > 100L * 1000000L,
        s"disjoint-support batch must spike, got $shifted")
      assert(shifted._2 === 5L, "e joins the 4 reference buckets in the census")
    } finally q.stop()
  }

  test("streaming quantile sketch: state after any prefix equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val evs = (0 until 120).map(i => Event(i, ts(f"2024-01-01 00:${i % 60}%02d:00"),
      i % 7, if (i % 2 == 0) "a" else "b", (i * 37 % 101).toDouble))
    val stream = MemoryStream[Event]
    val q = graft.streaming.QuantileStream.sketchStream(stream.toDF(),
        col("event_type"), "grp", col("event_id"), col("value"), 16, "qs-spec")
      .writeStream.format("memory").queryName("stream_qsketch")
      .outputMode("complete").start()
    try {
      // two out-of-order micro-batches — order must not matter
      stream.addData(evs.drop(70): _*)
      q.processAllAvailable()
      stream.addData(evs.take(70): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_qsketch")
      val batch = graft.operators.QuantileSketch.sketch(evs.toDF(),
        col("event_type"), "grp", col("event_id"), col("value"), 16, "qs-spec")
      def stateOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("grp"), expr("transform(qs, x -> struct(x.h, x.v))").as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Any](1).toVector).toMap
      assert(stateOf(streamed) === stateOf(batch),
        "streaming state must be bit-identical to the batch sketch")
      // bounded state: never more than k pairs per group
      streamed.select(size(col("qs"))).collect().foreach(r => assert(r.getInt(0) <= 16))
      // and the estimates flow through the same batch estimator
      val est = graft.operators.QuantileSketch.estimate(streamed, "qs", Seq(50, 90))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(est.keySet === Set("a", "b"))
    } finally q.stop()
  }

  test("throttle: one event per key per cooldown, cross-batch state, timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = graft.streaming.ThrottleStream.throttle(
        stream.toDS(), cooldownMs = 5 * 60000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("throttled")
      .outputMode("append").start()
    def ids() = spark.table("throttled").select("event_id")
      .as[Long].collect().toSet
    try {
      // batch 1, key (7, alert): t=0 passes, 1 and 2 suppress (inside
      // cooldown), 10 passes; key (8, alert) is independent
      stream.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "alert", 1.0),
        Event(2, ts("2024-01-01 00:01:00"), 7, "alert", 1.0),
        Event(3, ts("2024-01-01 00:02:00"), 7, "alert", 1.0),
        Event(4, ts("2024-01-01 00:10:00"), 7, "alert", 1.0),
        Event(5, ts("2024-01-01 00:01:00"), 8, "alert", 1.0))
      q.processAllAvailable()
      assert(ids() === Set(1L, 4L, 5L))
      // batch 2: t=12 suppresses against the PASSED t=10; t=16 passes
      stream.addData(
        Event(6, ts("2024-01-01 00:12:00"), 7, "alert", 1.0),
        Event(7, ts("2024-01-01 00:16:00"), 7, "alert", 1.0))
      q.processAllAvailable()
      assert(ids() === Set(1L, 4L, 5L, 7L))
      // far future: key state has long timed out → passes immediately
      stream.addData(Event(8, ts("2024-01-01 03:00:00"), 7, "alert", 1.0))
      q.processAllAvailable()
      assert(ids() === Set(1L, 4L, 5L, 7L, 8L))
    } finally q.stop()
  }

  test("streaming KMV distinct: state equals batch sketch, estimate tracks") {
    implicit val sqlCtx = spark.sqlContext
    // 80 distinct users per type across 200 events, arriving out of order
    val evs = (0 until 200).map(i => Event(i, ts(f"2024-01-01 00:${i % 60}%02d:00"),
      i % 80, if (i % 2 == 0) "a" else "b", 1.0))
    val stream = MemoryStream[Event]
    val q = graft.streaming.SketchStream.kmvDistinctStream(stream.toDF(),
        col("event_type"), "grp", col("user_id"), 16, "kmv-stream-spec")
      .writeStream.format("memory").queryName("stream_kmv")
      .outputMode("complete").start()
    try {
      stream.addData(evs.drop(120): _*)
      q.processAllAvailable()
      stream.addData(evs.take(120): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_kmv")
      val batchState = graft.operators.Sketches.kmvSketch(evs.toDF(),
        col("event_type"), "grp", col("user_id"), 16, "kmv-stream-spec")
      def st(df: org.apache.spark.sql.DataFrame) = df.select(col("grp"), col("hs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
      assert(st(streamed) === st(batchState),
        "streaming KMV state must be bit-identical to the batch sketch")
      // the emitted estimate is the batch estimator on that state
      val est = streamed.select(col("grp"), col("n_est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchEst = graft.operators.Sketches.kmvDistinct(evs.toDF(),
          col("event_type"), "grp", col("user_id"), 16, "kmv-stream-spec")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est === batchEst)
      // 40 true distinct per type; k=16 estimate within a loose 3x band
      est.values.foreach(v => assert(v > 13L && v < 120L, s"estimate $v wild"))
    } finally q.stop()
  }

  test("streaming heavy hitters: MG state bounded at k, hot item never lost across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    // one shard, k=3 → anything above n/4 of the stream must survive
    val q = graft.streaming.FrequencyStream.heavyHittersStream(
        stream.toDF(), col("value"), nShards = 1, k = 3)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    // update-mode memory sink appends each trigger's emission; the
    // latest summary is the rows at the shard's max n_shard
    def latest(): Map[String, Long] = {
      val all = spark.table("hh_stream")
        .collect().map(r => (r.getAs[String]("item"),
          r.getAs[Long]("mg_count"), r.getAs[Long]("n_shard")))
      if (all.isEmpty) Map.empty
      else {
        val nMax = all.map(_._3).max
        all.filter(_._3 == nMax).map(t => t._1 -> t._2).toMap
      }
    }
    try {
      // batch 1: "a"×6 among 5 distinct fillers (n=11)
      stream.addData(Seq.fill(6)("a") ++ Seq("x1", "x2", "x3", "x4", "x5"): _*)
      q.processAllAvailable()
      val s1 = latest()
      assert(s1.size <= 3, "state must stay at <= k counters")
      assert(s1.contains("a"), "item at 6/11 > n/4 must survive batch 1")
      assert(s1("a") <= 6L, "mg_count is a lower bound")
      // batch 2: "b" surges, "a" keeps flowing, more filler noise (n=22)
      stream.addData(Seq.fill(4)("b") ++ Seq.fill(3)("a")
        ++ Seq("y1", "y2", "y3", "y4"): _*)
      q.processAllAvailable()
      val s2 = latest()
      assert(s2.size <= 3)
      // a: 9/22, b: 4/22 — only `a` is guaranteed (> n/4); check both
      // the guarantee and that the cross-batch fold kept the lead
      assert(s2.contains("a"), "hot item above n/4 must survive the fold")
      assert(s2("a") <= 9L && s2("a") >= 9L - 22L / 4L,
        "mg_count within the n/(k+1) MG error band")
      // emitted n_shard is the exact cross-batch row count
      val nShard = spark.table("hh_stream").agg(max("n_shard")).head().getLong(0)
      assert(nShard === 22L)
    } finally q.stop()
  }

  test("streaming z-score alerts: spike flagged against prior stats, " +
    "repetition never alerts, batch split preserves decisions") {
    implicit val sqlCtx = spark.sqlContext
    // 10 calm events at 100±1, then a 500 spike, then calm again
    def ev(i: Int, v: Double) =
      Event(i, ts(f"2024-01-01 00:${i}%02d:00"), 1, "m", v)
    val calm = (0 until 10).map(i => ev(i, if (i % 2 == 0) 100.0 else 101.0))
    val spike = ev(10, 500.0)
    val after = Seq(ev(11, 100.0), ev(12, 101.0))
    def run(batches: Seq[Seq[Event]], name: String): Set[Long] = {
      val stream = MemoryStream[Event]
      val q = graft.streaming.AnomalyStream.zAlerts(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
        spark.table(name).select("event_id").as[Long].collect().toSet
      } finally q.stop()
    }
    val oneBatch = run(Seq(calm ++ Seq(spike) ++ after), "anom1")
    assert(oneBatch === Set(10L)) // only the spike; calm tail unflagged
    // identical decisions when the stream arrives in three triggers
    val split = run(Seq(calm, Seq(spike), after), "anom2")
    assert(split === oneBatch)
    // constant series: σ = 0, repetition never alerts
    val const = run(Seq((0 until 12).map(i => ev(i, 100.0))), "anom3")
    assert(const === Set.empty[Long])
    // ...but under σ = 0 ANY deviation alerts (division-free degenerate)
    val constSpike = run(Seq((0 until 8).map(i => ev(i, 100.0)) :+ ev(8, 100.01)),
      "anom4")
    assert(constSpike === Set(8L))
  }

  test("z-alerts: the batch twin emits exactly the streamed alert set") {
    implicit val sqlCtx = spark.sqlContext
    // two keys, drifting values with planted spikes — in-order feed
    def ev(i: Int, typ: String, v: Double) =
      Event(i, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), 1, typ, v)
    // key "c" runs at |cents| ~2·10⁷ — inside the widened shared
    // envelope (Σx² < 10³⁸) but far past the old 3·10⁵ streaming box,
    // which crashed the stream on data the batch twin accepted
    val data = (0 until 40).map { i =>
      val base = i % 3 match {
        case 0 => 100.0 + (i % 7)
        case 1 => 50.0 + (i % 5)
        case _ => 200000.0 + (i % 11) * 1000.0
      }
      val v = if (i == 25 || i == 38) base * 8 else base
      ev(i, Seq("a", "b", "c")(i % 3), v)
    }
    val stream = MemoryStream[Event]
    val q = graft.streaming.AnomalyStream.zAlerts(stream.toDS())
      .writeStream.format("memory").queryName("anom_eq")
      .outputMode("append").start()
    val streamed = try {
      stream.addData(data.take(17): _*); q.processAllAvailable()
      stream.addData(data.drop(17): _*); q.processAllAvailable()
      spark.table("anom_eq").select("event_id").as[Long].collect().toSet
    } finally q.stop()
    val batch = graft.operators.EventOps.zscoreAlerts(data.toDF(),
        col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 100.0).cast("long"))
      .select("event_id").as[Long].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
    assert(batch.contains(25L) && batch.contains(38L))
  }

  test("z-alerts: Σx² past 10^38 fails loudly at the shared envelope") {
    implicit val sqlCtx = spark.sqlContext
    // floor(±3e16 dollars · 100) = ±3·10¹⁸ cents; alternating sign keeps
    // S1 inside the long envelope while x² = 9·10³⁶ per event pushes
    // Σx² over 10³⁸ at the 12th fold, where the require must fire
    def ev(i: Int) =
      Event(i, ts(f"2024-01-01 00:${i}%02d:00"), 1, "m",
        (if (i % 2 == 0) 1 else -1) * 3.0e16)
    val stream = MemoryStream[Event]
    val q = graft.streaming.AnomalyStream.zAlerts(stream.toDS())
      .writeStream.format("memory").queryName("anom_env")
      .outputMode("append").start()
    try {
      stream.addData((0 until 12).map(ev): _*)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).take(10)
        .flatMap(t => Option(t.getMessage)).mkString("\n")
      assert(chain.contains("S2 envelope"), chain)
    } finally q.stop()
  }
}
