package graft

import graft.streaming.ArchiveStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming semantics (SURVEY.md §2 group G) under MemoryStream micro-batches:
  * the dedup + archive pipeline behaves like the reference service —
  * duplicates across polls collapse, output is day-partitioned parquet.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def raw(id: Long, t: String): String =
    s"""{"id": $id, "created_at": "${t.replace(' ', 'T')}Z", "type": "PushEvent"}"""

  test("parseRaw extracts id/ts and keeps payload verbatim") {
    import spark.implicits._
    val in = Seq(raw(7, "2024-01-01 10:00:00"), raw(8, "2024-01-02 11:30:00")).toDF("raw")
    val out = ArchiveStream.parseRaw(in).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L, 8L))
    assert(out(0).getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(out(0).getString(2) == raw(7, "2024-01-01 10:00:00"))
  }

  test("streaming dedup drops within-batch and cross-batch duplicate ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("id", "ts", "raw")
    val q = ArchiveStream.dedup(events)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // poll 1: one in-batch duplicate (id 1)
      mem.addData((1L, ts("2024-01-01 10:00:00"), "a"),
                  (1L, ts("2024-01-01 10:00:00"), "a"),
                  (2L, ts("2024-01-01 10:00:30"), "b"))
      q.processAllAvailable()
      // poll 2: id 2 replayed (cross-batch dup, inside watermark) + new id 3
      mem.addData((2L, ts("2024-01-01 10:00:30"), "b"),
                  (3L, ts("2024-01-01 10:01:00"), "c"))
      q.processAllAvailable()
      val got = spark.sql("select id from dedup_out").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("archive writes day-partitioned parquet, deduped, all rows present") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = Files.createTempDirectory("graft-archive-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val q = ArchiveStream.archive(
      mem.toDF().toDF("id", "ts", "raw"), out, ckpt,
      trigger = Trigger.AvailableNow())
    mem.addData((1L, ts("2024-01-01 10:00:00"), "a"),
                (2L, ts("2024-01-02 09:00:00"), "b"),
                (2L, ts("2024-01-02 09:00:00"), "b"),
                (3L, ts("2024-01-02 09:05:00"), "c"))
    q.awaitTermination()
    val archived = spark.read.parquet(out)
    assert(archived.count() == 3)
    // day partitioning materialized as directory column d
    val days = archived.select("d").distinct().collect().map(_.get(0).toString).sorted
    assert(days.toSeq == Seq("2024-01-01", "2024-01-02"))
  }

  test("hourlyCounts matches batch groupBy on the same data") {
    import spark.implicits._
    val e = Tables.events(spark, sf).select(col("event_id").as("id"), col("ts"),
      col("props").as("raw"))
    val streaming = ArchiveStream.hourlyCounts(e).orderBy("hour").collect()
    val batch = e.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")).orderBy("hour").collect()
    assert(streaming.toSeq == batch.toSeq)
  }

  test("applyTtl drops nothing younger than 3 days and everything older") {
    val e = Tables.events(spark, sf)
    val kept = ArchiveStream.applyTtl(e.withColumnRenamed("event_id", "id"))
    val mx = e.agg(max("ts")).head().getTimestamp(0)
    val cutoff = java.sql.Timestamp.from(mx.toInstant.minus(java.time.Duration.ofDays(3)))
    assert(kept.filter(col("ts") < lit(cutoff)).count() == 0)
    assert(kept.count() == e.filter(col("ts") >= lit(cutoff)).count())
  }
}
