package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Arbitrary keyed streaming state (SURVEY.md §2 I / G7) — the typed
  * `mapGroupsWithState` path for semantics the built-in windows can't
  * express. The reference keeps exactly this kind of state in its
  * in-memory two-generation id maps (ref: cmd/gh-archived/main.go:107,
  * 153-162, 207); here the analog is a per-key running event count whose
  * state is WATERMARK-BOUNDED via event-time timeout — at 100 TB the state
  * store holds only keys seen inside the watermark horizon, exactly like
  * the reference's generation swap evicts old ids.
  */
object StateOps {

  case class KeyCount(key: Long, n: Long, closed: Boolean)

  /** Funnel progress for one user: step timestamps in epoch millis, -1 =
    * step not reached. State is three longs per user — constant size. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)

  /** Emitted whenever a user advances a funnel level. */
  case class FunnelAdvance(user_id: Long, level: Int, at: Timestamp)

  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val kcEnc: Encoder[KeyCount] = Encoders.product[KeyCount]
  private implicit val fsEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  private implicit val faEnc: Encoder[FunnelAdvance] = Encoders.product[FunnelAdvance]
  private implicit val tupEnc: Encoder[(Long, Timestamp)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)
  private implicit val tripEnc: Encoder[(Long, String, Timestamp)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.TIMESTAMP)

  /** Per-key cumulative event count over a stream of (key, ts). Counts
    * accumulate across micro-batches in `GroupState[Long]`; a key idle past
    * `idleGap` (event time, enforced by the watermark) times out, emits its
    * final count with `closed = true`, and frees its state. Update output
    * mode — each batch emits the latest count per touched key.
    */
  def runningCounts(events: Dataset[(Long, Timestamp)],
                    watermark: String = "10 minutes",
                    idleGapMs: Long = 30L * 60 * 1000): Dataset[KeyCount] =
    events.toDF("key", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[Long, KeyCount](GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.get
            state.remove()
            KeyCount(key, n, closed = true)
          } else {
            var n = state.getOption.getOrElse(0L)
            var maxTs = Long.MinValue
            rows.foreach { case (_, ts) =>
              n += 1
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(n)
            state.setTimeoutTimestamp(maxTs + idleGapMs)
            KeyCount(key, n, closed = false)
          }
      }

  /** Streaming funnel detection (the live twin of `event_funnel`): per
    * user, strict-order signup → click → purchase inside `windowMs` of the
    * first signup, emitting a `FunnelAdvance` row the moment a level is
    * reached. This is `flatMapGroupsWithState` — zero-or-more outputs per
    * key per batch — because a batch can advance a user several levels (or
    * none), which `mapGroupsWithState`'s one-row contract can't express.
    *
    * State discipline at scale: per-user state is three epoch longs;
    * nothing is stored for users who never signed up; once a user signs up
    * the state carries an EVENT-TIME timeout at t1 + windowMs — past that
    * point no further transition is possible (every later step must land
    * inside the window), so the store drops the key at the watermark and
    * the state size is bounded by signups inside the horizon, not by the
    * all-time user count. Eviction buys a semantic: a signup arriving AFTER
    * the user's previous window closed re-anchors a fresh funnel (the
    * evicted window is final — its levels were already emitted). The batch
    * `event_funnel` instead anchors once at the global first signup; the
    * two agree exactly whenever the watermark horizon spans the replayed
    * data (no eviction mid-stream), which is what StreamingSpec asserts,
    * and differ only by deliberate re-anchoring beyond that.
    *
    * Within a batch events are processed in event-time order; in-order
    * delivery across batches is the archive source's replay contract.
    */
  def streamingFunnel(events: Dataset[(Long, String, Timestamp)],
                      watermark: String = "1 hour",
                      windowMs: Long = 7L * 24 * 3600 * 1000): Dataset[FunnelAdvance] =
    events.toDF("user_id", "event_type", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, Timestamp)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // window closed — no transition can follow
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val out = Seq.newBuilder[FunnelAdvance]
            rows.toSeq.sortBy(_._3.getTime).foreach { case (_, typ, ts) =>
              val t = ts.getTime
              if (typ == "signup" && s.t1 < 0) {
                s = s.copy(t1 = t); out += FunnelAdvance(user, 1, ts)
              } else if (typ == "click" && s.t1 >= 0 && s.t2 < 0 &&
                  t > s.t1 && t <= s.t1 + windowMs) {
                s = s.copy(t2 = t); out += FunnelAdvance(user, 2, ts)
              } else if (typ == "purchase" && s.t2 >= 0 && s.t3 < 0 &&
                  t > s.t2 && t <= s.t1 + windowMs) {
                s = s.copy(t3 = t); out += FunnelAdvance(user, 3, ts)
              }
            }
            if (s.t1 >= 0) { // never store state for users with no signup
              state.update(s)
              // timeout must sit past the current watermark or Spark rejects it
              state.setTimeoutTimestamp(
                math.max(s.t1 + windowMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }

  case class CarryState(v: Double)
  case class FilledEvent(user_id: Long, event_id: Long, filled: Option[Double])

  private implicit val csEnc: Encoder[CarryState] = Encoders.product[CarryState]
  private implicit val feEnc: Encoder[FilledEvent] = Encoders.product[FilledEvent]
  private implicit val quintEnc: Encoder[(Long, Long, String, Timestamp, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING,
      Encoders.TIMESTAMP, Encoders.scalaDouble)

  /** Streaming forward fill (the live twin of `window_fill_forward`): per
    * user, every event is enriched with the latest purchase value observed
    * so far — None before the first purchase. State is ONE value per
    * user, the smallest state a stateful enrichment can carry,
    * evicted after `idleGapMs` of event time like `runningCounts` (an
    * idle user's next event restarts from None — the eviction is the
    * watermark contract, documented rather than hidden). Within a batch
    * events apply in (event-time, event_id) order — the same total order
    * the batch twin's window uses — so a single-replay stream reproduces
    * `window_fill_forward`'s filled column exactly (StreamingSpec).
    */
  def carryForward(events: Dataset[(Long, Long, String, Timestamp, Double)],
                   watermark: String = "1 hour",
                   idleGapMs: Long = 24L * 3600 * 1000): Dataset[FilledEvent] =
    events.toDF("user_id", "event_id", "event_type", "ts", "value")
      .withWatermark("ts", watermark)
      .as[(Long, Long, String, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CarryState, FilledEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String, Timestamp, Double)],
         state: GroupState[CarryState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.orNull
            val out = Seq.newBuilder[FilledEvent]
            var maxTs = Long.MinValue
            rows.toSeq.sortBy(r => (r._4.getTime, r._2)).foreach {
              case (_, eventId, typ, ts, value) =>
                val t = ts.getTime
                if (t > maxTs) maxTs = t
                // update before emitting: the batch twin's running frame
                // includes the current row, so a purchase sees its own value
                if (typ == "purchase") s = CarryState(value)
                out += FilledEvent(user, eventId, Option(s).map(_.v))
            }
            if (s != null) {
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(maxTs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }

  case class ClickState(t: Long, id: Long)
  case class AsOfMatch(user_id: Long, p_id: Long, p_ts: Timestamp,
                       click_ts: Option[Timestamp])

  private implicit val clkEnc: Encoder[ClickState] = Encoders.product[ClickState]
  private implicit val amEnc: Encoder[AsOfMatch] = Encoders.product[AsOfMatch]
  private implicit val quadEnc: Encoder[(Long, String, Long, Timestamp)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong,
      Encoders.TIMESTAMP)

  /** Streaming backward as-of join (the live twin of `join_asof` and of
    * the plan-level `graft.plans.AsOfJoin`): every purchase is paired with
    * the latest same-user click at-or-before it, the moment it arrives.
    *
    * State discipline at scale: ONE (ts, id) pair per user — the as-of
    * carry needs nothing else, because backward as-of is a running `last`
    * (the batch twin's window). Compare a stream-stream interval join for
    * the same ask: its state holds EVERY click inside the watermark
    * horizon. Eviction after `idleGapMs` of event-time idleness frees the
    * key; a later purchase restarts unmatched (the eviction contract,
    * documented like `carryForward`'s).
    *
    * Within a batch rows apply in (ts, kind, id) order with clicks before
    * purchases at equal ts — the SAME total order the batch window sorts
    * by, so inclusive-bound and max-id tie semantics match exactly;
    * in-order delivery across batches is the archive replay contract
    * (StreamingSpec pins the equality against the batch key).
    */
  def streamingAsOf(events: Dataset[(Long, String, Long, Timestamp)],
                    watermark: String = "1 hour",
                    idleGapMs: Long = 24L * 3600 * 1000): Dataset[AsOfMatch] =
    events.toDF("user_id", "event_type", "event_id", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, String, Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ClickState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Timestamp)],
         state: GroupState[ClickState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // state and ordering in MICROSECONDS: Timestamp.getTime is
            // millis-only and the archive carries µs — truncating here
            // would silently shift the carried click_ts by up to 999 µs
            def micros(ts: Timestamp): Long =
              ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
            def fromMicros(us: Long): Timestamp = {
              val t = new Timestamp(us / 1000000 * 1000)
              t.setNanos((us % 1000000).toInt * 1000)
              t
            }
            var s = state.getOption.orNull
            val out = Seq.newBuilder[AsOfMatch]
            var maxTsMs = Long.MinValue
            def kindRank(t: String) = if (t == "click") 0 else 1
            rows.toSeq
              .sortBy(r => (micros(r._4), kindRank(r._2), r._3))
              .foreach { case (_, typ, id, ts) =>
                val t = micros(ts)
                if (ts.getTime > maxTsMs) maxTsMs = ts.getTime
                if (typ == "click") {
                  // latest (ts, id) click wins — the batch window's
                  // ascending-id tie rule falls out of the sort above
                  if (s == null || t > s.t || (t == s.t && id > s.id)) s = ClickState(t, id)
                } else if (typ == "purchase") {
                  out += AsOfMatch(user, id, ts,
                    Option(s).map(c => fromMicros(c.t)))
                }
              }
            if (s != null) {
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(maxTsMs + idleGapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
}
