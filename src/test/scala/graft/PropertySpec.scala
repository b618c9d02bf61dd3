package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property-based invariants (SURVEY.md §5.2) over scalacheck-generated
  * event tables: the laws the reference's at-least-once + idempotent-storage
  * design depends on (ref: cmd/gh-load/main.go:257-261, README.md:14) hold
  * for ANY input, not just the fixtures. Deterministic seeds keep CI stable.
  */
class PropertySpec extends SparkSpec {

  private val genEvents: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.chooseNum(1, 120)
    rows <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 30L)           // small id space forces dups
      tsOff <- Gen.chooseNum(0L, 6L * 24 * 3600)  // up to 6 days spread
      v <- Gen.chooseNum(0.0, 1000.0)
    } yield (id, tsOff, v))
  } yield rows

  private def sample(i: Long): List[(Long, Long, Double)] =
    genEvents.apply(Gen.Parameters.default, Seed(i))
      .getOrElse(List((0L, 0L, 0.0)))

  private def df(rows: List[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    val base = 1700000000L
    rows.map { case (id, off, v) =>
      (id, new Timestamp((base + off) * 1000L), v)
    }.toDF("id", "ts", "value")
  }

  private val trials = (1L to 25L).toList

  test("property: exact dedup is idempotent and keyed (f(f(x)) == f(x))") {
    for (i <- trials) {
      val d = df(sample(i))
      val once = d.dropDuplicates("id")
      assert(once.count() == d.select("id").distinct().count(), s"seed=$i")
      // f(f(x)) == f(x): re-deduping the collected result is a no-op
      val rows = once.collect().toSet
      assert(rows.map(_.getLong(0)).size == rows.size, s"seed=$i")
    }
  }

  test("property: replace-by-key keeps exactly one, and the max, version per key") {
    for (i <- trials) {
      val d = df(sample(i))
      val kept = d
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("id").orderBy(col("ts").desc, col("value").desc)))
        .filter(col("rn") === 1).drop("rn")
      assert(kept.count() == d.select("id").distinct().count(), s"seed=$i")
      val maxVersion = d.groupBy("id")
        .agg(max(struct(col("ts"), col("value"))).as("v"))
        .select(col("id"), col("v.ts").as("ts"), col("v.value").as("value"))
      assert(kept.exceptAll(maxVersion).count() == 0, s"seed=$i")
    }
  }

  test("property: TTL filter is monotone and idempotent") {
    for (i <- trials) {
      val d = df(sample(i))
      val once = streaming.ArchiveStream.applyTtl(d)
      // subset of input
      assert(once.exceptAll(d).count() == 0, s"seed=$i")
      // applying again changes nothing (same max ts survives the filter)
      val twice = streaming.ArchiveStream.applyTtl(once)
      assert(twice.exceptAll(once).count() == 0 &&
        once.exceptAll(twice).count() == 0, s"seed=$i")
      // everything dropped is strictly older than cutoff = max ts - 3 days
      val mx = d.agg(max("ts")).head().getTimestamp(0)
      val dropped = d.exceptAll(once)
      assert(dropped.filter(
        col("ts") >= lit(Timestamp.from(mx.toInstant.minus(java.time.Duration.ofDays(3))))
      ).count() == 0, s"seed=$i")
    }
  }

  test("property: tumbling windows partition events exactly") {
    for (i <- trials) {
      val d = df(sample(i))
      val windowed = d.groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      // every event in exactly one window: counts add up
      assert(windowed.agg(sum("n")).head().getLong(0) == d.count(), s"seed=$i")
      // each window is exactly one hour and aligned
      val bad = windowed.filter(
        unix_timestamp(col("window.end")) - unix_timestamp(col("window.start")) =!= 3600 ||
        pmod(unix_timestamp(col("window.start")), lit(3600)) =!= 0).count()
      assert(bad == 0, s"seed=$i")
    }
  }

  test("property: ingest replay is idempotent (union with self, dedup, same archive)") {
    for (i <- trials) {
      val d = df(sample(i))
      val once = d.dropDuplicates("id")
      val replayed = d.union(d).dropDuplicates("id")
      assert(replayed.count() == once.count(), s"seed=$i")
      assert(replayed.select("id").exceptAll(once.select("id")).count() == 0, s"seed=$i")
    }
  }

  test("property: minhash signature equality for identical shingle sets") {
    // exact duplicates (J = 1) agree on EVERY band, so LSH recall of exact
    // dups is 1 regardless of hash seeds — the invariant dedup_minhash's
    // oracle depends on (DedupOps.oracle note)
    import spark.implicits._
    for (i <- trials.take(10)) {
      val text = sample(i).map(t => s"w${t._1 % 7}").mkString(" ")
      val d = Seq((0L, text, "en", "x", text.length.toLong),
                  (1L, text, "en", "y", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory(s"graft-prop-$i-").toString
      d.write.parquet(s"$dir/documents.parquet")
      val kept = SparkEntry.queries("dedup_minhash")(spark, dir)
        .select("doc_id").as[Long].collect().toSeq
      assert(kept == Seq(0L), s"seed=$i: identical docs must collapse to doc 0")
    }
  }
}
