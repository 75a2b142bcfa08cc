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
  * Bounds: S2 rides BigInt in state (encoded as DECIMAL(38,0)), so the
  * envelope is exactly the batch twin's
  * ([[graft.operators.EventOps.zscoreAlerts]]): per key, Σ|x| < 2⁶³
  * (S1 stays a long, folded with addExact) and Σx² < 10³⁸ (the
  * decimal ceiling of the encoded state, required loudly below before
  * the fold). Inside that envelope both twins are exact-integer and
  * emit identical alert rows; outside it BOTH fail loudly — the stream
  * at the require, the batch at its ANSI decimal/long window-sum
  * overflow. (The r8 shape — long S2 with a |cents| ≤ 3·10⁵ box —
  * made the stream crash on data the batch path accepted, breaking
  * backfill equivalence; ADVICE r8.)
  */
object AnomalyStream {

  /** 10³⁸ − 1: the widest value a DECIMAL(38,0) — the encoding of the
    * BigInt S2 state and of the batch twin's window sum — can carry.
    */
  val S2Ceiling: BigInt = BigInt(10).pow(38) - 1

  case class StatState(n: Long, s1: Long, s2: BigInt)
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
          var st = state.getOption.getOrElse(StatState(0L, 0L, BigInt(0)))
          val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val x = math.floor(e.value * 100.0).toLong
            if (st.n >= minN) {
              val n = BigInt(st.n)
              val s1 = BigInt(st.s1)
              val lhs = (BigInt(x) * n - s1).pow(2) * (n - 1)
              val rhs = BigInt(z.toLong * z) * n * (n * st.s2 - s1 * s1)
              if (lhs > rhs) out += Alert(key, e.event_id, e.ts, x, st.n)
            }
            // same envelope as the batch twin, enforced on the ACTUAL
            // accumulators (not a fixed |cents| box): S1 long-exact,
            // S2 within the DECIMAL(38,0) the state encoder carries
            val s2next = st.s2 + BigInt(x) * BigInt(x)
            require(s2next <= S2Ceiling,
              s"zAlerts S2 envelope exceeded (key=$key, n=${st.n}, cents=$x): " +
                "Σx² passed 10^38; re-scale input or shard the key")
            st = StatState(st.n + 1, math.addExact(st.s1, x), s2next)
          }
          state.update(st)
          out.iterator
      }
  }
}
