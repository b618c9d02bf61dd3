package graft

/** Smoke-level contract for every SparkEntry entry: runs on sf0.001, yields
  * rows, has stable column names (the driver hash-compares on sorted column
  * names — a rename breaks the oracle pair silently otherwise).
  */
class QueriesSpec extends SparkSpec {

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries twin") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs non-empty and deterministically on sf0.001") {
      val df1 = fn(spark, sf)
      val rows1 = df1.collect()
      assert(rows1.nonEmpty, s"$name returned no rows")
      // determinism: a second evaluation returns the identical row sequence
      val rows2 = fn(spark, sf).collect()
      assert(rows1.toSeq == rows2.toSeq, s"$name is not deterministic")
    }
  }
}
