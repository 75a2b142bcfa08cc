package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventStreams.Event

/** Streaming z-score anomaly alerts with EXACT integer state: per key
  * (event type), maintain (n, Σx, Σx²) over money-cents and flag an
  * incoming event whose deviation from the PRIOR population exceeds
  * z sample standard deviations. The test is the division-free
  * cross-multiplied form
  * `(x·n − S1)²·(n−1) > z²·n·(n·S2 − S1²)` — every quantity an exact
  * integer (the comparison rides BigInt, so no overflow and no IEEE
  * replay problems), which makes alert decisions bit-reproducible
  * across restarts and engines. σ = 0 degenerates correctly: any
  * deviation alerts, repetition never does.
  *
  * Semantics: within a trigger, a key's events are processed in
  * (event-time, event_id) order; each event is tested against the
  * statistics of everything processed BEFORE it (then folded in —
  * the population tracks the stream, outliers included; a trimmed
  * update is a policy choice this operator deliberately does not
  * make). State is three longs per key, keys = event types — bounded
  * by construction, so no timeout eviction is needed. Alerts need
  * `minN` prior observations (a variance estimated from four points
  * pages nobody).
  *
  * Bounds: the long S2 accumulator needs n·x²max < 2⁶³, so the
  * enforced envelope is |cents| ≤ 3·10⁵ at n ≤ 10⁸ per key (equally:
  * |cents| ≤ 3·10⁷ at n ≤ 10⁴). Out-of-envelope input fails loudly
  * (require below) instead of wrapping; the comparison itself rides
  * BigInt and never overflows.
  */
object AnomalyStream {

  case class StatState(n: Long, s1: Long, s2: Long)
  case class Alert(event_type: String, event_id: Long,
                   ts: java.sql.Timestamp, cents: Long, n_prior: Long)

  def zAlerts(events: Dataset[Event], z: Int = 3,
              minN: Long = 5): Dataset[Alert] = {
    require(z >= 1 && minN >= 2)
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[StatState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[Event], state: GroupState[StatState]) =>
          var st = state.getOption.getOrElse(StatState(0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val x = math.floor(e.value * 100.0).toLong
            require(math.abs(x) <= 300000L && st.n < 100000000L,
              s"zAlerts envelope exceeded (cents=$x, n=${st.n}): " +
                "long S2 state would wrap; re-scale input or shard the key")
            if (st.n >= minN) {
              val n = BigInt(st.n)
              val s1 = BigInt(st.s1)
              val lhs = (BigInt(x) * n - s1).pow(2) * (n - 1)
              val rhs = BigInt(z.toLong * z) * n * (n * BigInt(st.s2) - s1 * s1)
              if (lhs > rhs) out += Alert(key, e.event_id, e.ts, x, st.n)
            }
            st = StatState(st.n + 1, st.s1 + x, st.s2 + x * x)
          }
          state.update(st)
          out.iterator
      }
  }
}
