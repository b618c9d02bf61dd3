package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
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

  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val kcEnc: Encoder[KeyCount] = Encoders.product[KeyCount]
  private implicit val tupEnc: Encoder[(Long, Timestamp)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)

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
}
