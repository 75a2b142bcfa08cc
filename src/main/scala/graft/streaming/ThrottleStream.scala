package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventStreams.Event

/** Per-key rate limiting / alert suppression: pass at most one event per
  * (user, type) key per `cooldownMs` of EVENT time — the stream-hygiene
  * primitive between dedup (identical events) and sessionization
  * (grouping): "page me once, not two hundred times, for the same
  * flapping alert".
  *
  * Semantics: within each key, events ordered by (event-time, event_id)
  * pass iff at least `cooldownMs` elapsed since the last PASSED event's
  * event time; later-arriving events that land inside a passed event's
  * cooldown are suppressed too (emission is irrevocable in Append mode,
  * so the passed event — not arrival order — anchors the window).
  * State is ONE long per live key (last passed event time), dropped by
  * event-time timeout once a key stays silent past its cooldown — a key
  * that can no longer suppress anything holds no state, so state is
  * bounded by keys active inside one cooldown, not by history.
  *
  * Sizing note: each trigger sorts a key's micro-batch group in executor
  * memory (the in-order scan is what the pass/suppress decision needs),
  * so a single key's PER-TRIGGER volume must fit on one executor. On a
  * live feed that's one cooldown's worth of one key — trivial; on a
  * historical REPLAY a hot key's entire backlog can land in one trigger,
  * so cap trigger size (the source's `maxFilesPerTrigger` /
  * `maxOffsetsPerTrigger`) when throttling a backfill.
  */
object ThrottleStream {

  def throttle(events: Dataset[Event], cooldownMs: Long,
               watermark: String = "1 hour"): Dataset[Event] = {
    require(cooldownMs > 0)
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, String), batch: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var last = state.getOption.getOrElse(Long.MinValue)
            val out = sorted.flatMap { e =>
              val t = e.ts.getTime
              if (last == Long.MinValue || t - last >= cooldownMs) {
                last = t
                Some(e)
              } else None
            }
            if (last != Long.MinValue) {
              state.update(last)
              state.setTimeoutTimestamp(last + cooldownMs)
            }
            out.iterator
          }
      }
  }
}
