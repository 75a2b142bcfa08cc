package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event operators. Batch twins live in
  * [[graft.operators.EventOps]] and act as their semantic oracles.
  *
  * State is always watermark-bounded: windowed aggregation state expires
  * with the watermark, and the sessionizer closes sessions on EVENT-time
  * timeouts driven by the same watermark, so executor state stays
  * O(active keys) no matter how long the stream runs — and replaying the
  * same data yields the same sessions (processing-time timeouts would
  * not), the property that matters on an unbounded 100 TB/day feed.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(nEvents: Long, startMs: Long, lastMs: Long)
  case class SessionOut(user_id: Long, n_events: Long, start_ms: Long, duration_ms: Long)

  /** File-based streaming source over the events parquet layout: new
    * files appearing under `dir` become micro-batches. A streaming read
    * needs a fixed schema up front, but the generator has shipped `ts`
    * as both TIMESTAMP(NANOS)-read-as-long and plain timestamp[us] —
    * so the schema is taken from a one-off batch probe of the existing
    * files, and `ts` is then normalized to a microsecond TimestampType
    * exactly like the batch loader ([[graft.Tables.normalizeTs]]), so
    * batch and stream share plans. (The probe lists the directory once
    * at stream-construction time — negligible next to the stream
    * itself, and new files must match the launch schema anyway.)
    * `maxFilesPerTrigger` bounds per-batch work on a backfill. If the
    * directory is empty (or absent) at stream-construction time — a
    * stream legitimately started before its producer's first file —
    * the probe falls back to the generator's canonical schema
    * (microsecond ts; [[graft.Tables.normalizeTs]] is the identity on
    * it), so startup order never matters.
    */
  def readEventsStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 16): DataFrame = {
    import org.apache.spark.sql.types._
    val fallback = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val schema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => fallback }
    graft.Tables.normalizeTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(dir))
  }

  /** Tumbling 1-hour windowed counts per event type with a watermark.
    * Append mode emits each window once, when the watermark passes it.
    * `value_cents` is the same exact-integer form the batch twin
    * ([[graft.operators.EventOps.hourlyAgg]]) emits — float sums would be
    * summation-order-dependent and so not comparable across runs.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))

  /** Gap-based sessionization with explicit state: a session closes when
    * event time advances more than `gapMs` past its last event — tracked
    * via EVENT-time timeout, so closure is driven by the watermark, not
    * wall-clock arrival. Replaying the same data therefore produces the
    * same sessions as the batch twin ([[graft.operators.EventOps
    * .sessionize]]); a processing-time timeout would close sessions at
    * nondeterministic points on replay/backfill. flatMapGroupsWithState
    * keeps exactly one small state record per active user, expired by the
    * watermark.
    *
    * Callers must set a watermark on `ts` BEFORE calling (the timeout
    * needs one); `watermarkedSessions` bundles the standard form.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.nEvents, s.startMs, s.lastMs - s.startMs))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            // Batch-local session for events too old to belong to the live
            // session (they belong to an earlier, already-emitted one):
            // adjacent too-old events sessionize among THEMSELVES by the
            // same gap rule, so a late replayed burst emits one session,
            // not n singletons. At batch end it MERGES into the live
            // session if a later in-batch event lowered the live envelope
            // to within the gap (otherwise two sessions whose extents are
            // within gapMs of each other would both emit); only a
            // genuinely gap-separated remainder flushes on its own. It
            // cannot become state because the live session owns the
            // event-time timeout. Remaining divergence from an ordered
            // batch replay: these sessions cannot extend a session
            // emitted in a PRIOR batch (already irrevocably emitted), and
            // an old-side sub-session already flushed mid-batch (two
            // too-old bursts separated by more than the gap) cannot be
            // retracted in Append mode.
            var oldCur = Option.empty[SessionState]
            def flushOld(): Unit = oldCur.foreach { o =>
              closed ::= SessionOut(userId, o.nEvents, o.startMs, o.lastMs - o.startMs)
              oldCur = None
            }
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // Events are sorted within a micro-batch, but a later batch
                // may legally (inside the watermark delay) deliver an event
                // older than lastMs — so merge on proximity to the session
                // envelope in EITHER direction and keep the envelope
                // monotone with min/max; a plain `lastMs = t` would regress
                // it and corrupt gap decisions and durations.
                case Some(s) if s.startMs - t > gapMs =>
                  oldCur match {
                    case Some(o) if t - o.lastMs <= gapMs =>
                      oldCur = Some(o.copy(nEvents = o.nEvents + 1,
                        startMs = math.min(o.startMs, t), lastMs = math.max(o.lastMs, t)))
                    case Some(_) =>
                      flushOld()
                      oldCur = Some(SessionState(1, t, t))
                    case None =>
                      oldCur = Some(SessionState(1, t, t))
                  }
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1,
                    startMs = math.min(s.startMs, t), lastMs = math.max(s.lastMs, t)))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.nEvents, s.startMs, s.lastMs - s.startMs)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            // batch-end reconciliation: an event was routed to oldCur
            // against the live start AT THAT MOMENT, but a later in-batch
            // event may have lowered the live start to within the gap of
            // oldCur's extent — merge instead of emitting two sessions
            // that the batch twin would count as one
            (cur, oldCur) match {
              case (Some(s), Some(o)) if s.startMs - o.lastMs <= gapMs =>
                cur = Some(SessionState(s.nEvents + o.nEvents,
                  math.min(s.startMs, o.startMs), math.max(s.lastMs, o.lastMs)))
                oldCur = None
              case _ => ()
            }
            flushOld()
            cur.foreach { s =>
              state.update(s)
              // close when event time passes last event + gap; the timeout
              // timestamp must stay ahead of the current watermark
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup on the event id with WATERMARK-BOUNDED state:
    * duplicates arriving within the watermark horizon are dropped, and
    * per-key state expires once the watermark passes — a plain streaming
    * `dropDuplicates` would grow state forever on an unbounded feed.
    */
  def dedupeStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream inner join: each `buyType` event joins the
    * `clickType` events of the same user in the preceding `windowMinutes`.
    * Both sides carry watermarks and the join condition carries the time
    * bound, so Spark purges both state stores as the watermark advances —
    * unbounded-state stream joins never survive a 100 TB/day feed.
    */
  /** Stream-stream interval join. `joinType` "inner" emits matches as
    * they form; "left_outer" ALSO emits every unmatched click with null
    * buy columns — but only once the global watermark proves no future
    * buy can land in its window (click_ts + windowMinutes), which is
    * when the state store can evict the row. The interval bound plus
    * both-side watermarks is exactly what makes that state bounded; an
    * un-bounded outer stream-stream join is rejected by Spark for this
    * reason.
    */
  def matchedPairs(events: DataFrame, clickType: String, buyType: String,
                   watermark: String = "1 hour", windowMinutes: Int = 30,
                   joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === clickType)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val buys = events.filter(col("event_type") === buyType)
      .select(col("event_id").as("buy_id"), col("user_id").as("b_user"),
        col("ts").as("buy_ts"))
      .withWatermark("buy_ts", watermark)
    clicks.join(buys,
        col("c_user") === col("b_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr(s"interval $windowMinutes minutes"),
        joinType)
      // coalesce: on outer null-rows only the click side exists
      .select(coalesce(col("c_user"), col("b_user")).as("user_id"),
        col("buy_id"), col("click_id"),
        (unix_millis(col("buy_ts")) - unix_millis(col("click_ts"))).as("gap_ms"))
  }

  /** Stream-static enrichment: join the stream against a STATIC (batch)
    * dimension — no state store at all, because the static side is just
    * re-read/broadcast per micro-batch; the standard pattern for
    * attaching slowly-refreshed reference data to an unbounded feed
    * (the static side may be an updatable view: each micro-batch sees
    * its latest snapshot). Left join keeps unmatched events flowing.
    */
  def enrich(events: DataFrame, dim: DataFrame, joinCol: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(joinCol), "left")

  /** Standard watermark + event-time sessionization composition. */
  def watermarkedSessions(events: Dataset[Event], gapMs: Long,
                          watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    sessionize(events.withWatermark("ts", watermark).as[Event], gapMs)
  }
}
