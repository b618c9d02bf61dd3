package graft

import graft.plans.QueryMetrics
import org.apache.spark.sql.functions._

/** C9 metering: the QueryExecutionListener records tagged entries with
  * real durations and scan-row counts for ordinary actions.
  */
class QueryMetricsSpec extends SparkSpec {

  private def await(cond: => Boolean, ms: Long = 10000): Boolean = {
    val end = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(50)
    cond
  }

  test("timed() records a tagged entry with duration and scanned rows") {
    QueryMetrics.register(spark)
    QueryMetrics.clear()
    // timed() waits for the async delivery, so back-to-back timed sections
    // cannot mislabel each other
    val n = QueryMetrics.timed(spark, "metered_scan") {
      Tables.events(spark, sf).filter(col("event_type") === "error").count()
    }
    assert(n > 0)
    val e = QueryMetrics.entries.find(_.tag == "metered_scan")
      .getOrElse(fail(s"no metered_scan entry in ${QueryMetrics.entries.map(_.tag)}"))
    assert(!e.failed)
    assert(e.durationNs > 0)
    // the leaf scan reads every event row (filter applies above the scan or
    // inside it; either way the metric is positive and bounded by the table)
    assert(e.scannedRows > 0 && e.scannedRows <= Tables.events(spark, sf).count())
  }

  test("registration is idempotent — no double-counted entries") {
    QueryMetrics.register(spark)
    QueryMetrics.register(spark)
    QueryMetrics.clear()
    QueryMetrics.tag(spark, "idem")
    Tables.region(spark, sf).count()
    assert(await(QueryMetrics.entries.count(_.tag == "idem") >= 1))
    Thread.sleep(300) // allow any duplicate delivery to surface
    assert(QueryMetrics.entries.count(_.tag == "idem") == 1,
      QueryMetrics.entries.filter(_.tag == "idem").toString)
    QueryMetrics.tag(spark, null)
  }
}
