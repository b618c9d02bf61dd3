package graft

import graft.plans.TtlPolicy
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import java.nio.file.Files
import java.sql.Timestamp

/** The TTL-enforcement optimizer rule: transparent retention over registered
  * paths, pushdown of the injected predicate, no effect on other reads.
  */
class TtlRuleSpec extends SparkSpec with BeforeAndAfterEach {

  override def afterEach(): Unit = TtlPolicy.clear()

  private def day(d: Int): Timestamp = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")

  private lazy val archive: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ttl-").toString + "/archive"
    (1 to 10).map(d => (d.toLong, day(d))).toDF("id", "ts")
      .withColumn("d", to_date(col("ts")))
      .write.partitionBy("d").parquet(dir)
    dir
  }

  test("registered path: expired rows vanish from every query, unregistered reads see all") {
    val all = spark.read.parquet(archive)
    assert(all.count() == 10)
    TtlPolicy.register(archive, "ts", 3, day(10))
    // no query rewrite by the user — the rule injects the retention filter;
    // cutoff = day10 noon - 3 days = day7 noon, and >= keeps the boundary row
    assert(spark.read.parquet(archive).count() == 4) // days 7..10 survive
    assert(spark.read.parquet(archive).agg(min("id")).head().getLong(0) == 7L)
    TtlPolicy.unregister(archive)
    assert(spark.read.parquet(archive).count() == 10)
  }

  test("injected predicate reaches the scan (pushed + partition-prunable)") {
    TtlPolicy.register(archive, "ts", 3, day(10))
    val df = spark.read.parquet(archive).select("id")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(ts"), physical.take(2000))
    // composes with user predicates without duplicating the guard
    val both = spark.read.parquet(archive).filter(col("id") =!= 9)
    assert(both.count() == 3)
    val optimized = both.queryExecution.optimizedPlan.toString
    assert("ts#\\d+ >= ".r.findAllIn(optimized).size == 1, optimized)
  }

  test("file:// registration matches the resolved scan path") {
    TtlPolicy.register(s"file://$archive", "ts", 3, day(10))
    assert(spark.read.parquet(archive).count() == 4)
  }

  test("broken registration fails loudly instead of silently skipping retention") {
    TtlPolicy.register(archive, "no_such_col", 3, day(10))
    val e1 = intercept[Exception] { spark.read.parquet(archive).count() }
    assert(e1.getMessage.contains("no_such_col"))
    TtlPolicy.clear()
    TtlPolicy.register(archive, "id", 3, day(10)) // wrong type (bigint)
    val e2 = intercept[Exception] { spark.read.parquet(archive).count() }
    assert(e2.getMessage.contains("expected a timestamp"))
  }

  test("column match is case-insensitive like Spark resolution") {
    TtlPolicy.register(archive, "TS", 3, day(10))
    assert(spark.read.parquet(archive).count() == 4)
  }

  test("path with special characters (space) still matches its scan") {
    import spark.implicits._
    // Hadoop renders such a root path differently from the raw registered
    // string (URI encoding); normalization must reconcile them or the
    // policy silently never fires and expired rows leak
    val dir = Files.createTempDirectory("graft-ttl sp-").toString + "/arch ive"
    (1 to 10).map(d => (d.toLong, day(d))).toDF("id", "ts")
      .write.parquet(dir)
    TtlPolicy.register(dir, "ts", 3, day(10))
    assert(spark.read.parquet(dir).count() == 4)
    TtlPolicy.unregister(dir)
    assert(spark.read.parquet(dir).count() == 10)
  }

  test("TTL composes with aggregation — the flagship archive shape") {
    TtlPolicy.register(archive, "ts", 3, day(10))
    val perDay = spark.read.parquet(archive)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .orderBy("day").collect()
    assert(perDay.length == 4)
    assert(perDay.forall(_.getLong(1) == 1L))
  }
}
