package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time window semantics (SURVEY.md §2 group G), batch-checkable.
  *
  * The reference's hour-file key "YYYY-MM-DD-H" (ref: cmd/gh-load/main.go:49)
  * IS a tumbling window; sliding and session windows are the implied
  * generalization. The same `window`/`session_window` expressions run
  * unchanged under Structured Streaming (graft.streaming.ArchiveStream);
  * batch mode makes them DuckDB-checkable here.
  *
  * Scale note: windowed aggregation shuffles once on (window, keys); the
  * map-side partial agg collapses most rows before the exchange because
  * window start is derived arithmetic on ts — no expensive bucketing join.
  */
object WindowOps {
  import Tables.dec

  /** Interval join: each purchase matched to the same user's clicks in the
    * hour before it. The SAME plan runs batch (DuckDB-checkable, the
    * `stream_interval_join` key) and as a stream-stream join under
    * Structured Streaming (StreamingSpec), where the time bound is what
    * makes it feasible at all: with watermarks on both sides each stream
    * buffers only the interval's worth of state — an unbounded-predicate
    * stream join would buffer forever. Inputs need (user_id, c_id/c_ts)
    * and (user_id, p_id/p_ts).
    */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame): DataFrame =
    // rename instead of dataset-qualified columns: both sides usually derive
    // from the same scan, where `purchases("user_id") === clicks("user_id")`
    // resolves only through self-join lineage disambiguation (and warns)
    purchases.join(clicks.withColumnRenamed("user_id", "c_user"),
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"), col("p_ts"), col("c_ts"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G6+: stream-stream interval join, batch-checkable twin (the streaming
    // mode with watermark-bounded state runs in StreamingSpec).
    "stream_interval_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      intervalJoin(purchases, clicks)
        .orderBy("p_id", "c_id")
    }),

    // G2: tumbling 1-hour window — count + sum per window.
    "stream_tumbling" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
          col("n"), col("sum_value"))
        .orderBy("w_start")
    }),

    // G3: sliding 1-hour window, 15-minute slide — each event lands in 4.
    "stream_sliding" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"))
        .orderBy("w_start")
    }),

    // G4: session window per user, 30-minute gap.
    "stream_session" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "session_start")
    }))

  def oracle: Map[String, String] = Map(
    "stream_interval_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.ts AS p_ts, c.ts AS c_ts
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts
        |ORDER BY p_id, c_id""".stripMargin,
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
        |       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    "stream_sliding" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS w_start,
        |       time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
        |         + INTERVAL '1 hour' AS w_end,
        |       count(*) AS n
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS slides(k)
        |GROUP BY 1, 2 ORDER BY w_start""".stripMargin,
    "stream_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   > INTERVAL '30 minutes'
        |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts, value,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM islands GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)
}
