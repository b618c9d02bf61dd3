package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md, FIXTURES.md).
  *
  * Every `SparkEntry.queries` entry reads through here so paths always stay
  * `$sfDir/<table>.parquet` (SURVEY.md §7.4.6) and column pruning / predicate
  * pushdown reach the parquet scan untouched.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp. Read it as raw nanos and truncate to µs — exactly what
    * DuckDB 1.0 does on its side of the oracle compare, so both engines see
    * identical µs instants (SURVEY.md §7.4.2). Requires the `nanosAsLong`
    * conf, set at session construction by `GraftSession` (never here: query
    * builders must not mutate shared session state); a session missing it
    * fails loudly on the parquet read.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact 2-dp money arithmetic: the testdata doubles are exact 2-decimal
    * values (FIXTURES.md), so this cast is lossless and makes sums
    * order-independent — required for bit-exact DuckDB oracle parity
    * (SURVEY.md §5.2 determinism rules). Final aggregates are cast back to
    * double so the output schema matches DuckDB's `CAST(... AS DOUBLE)`.
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")
}
