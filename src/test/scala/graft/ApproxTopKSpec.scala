package graft

import graft.functions.api
import org.apache.spark.sql.functions._

/** Pins functions/ApproxTopK (mergeable SpaceSaving heavy hitters): the
  * oracle covers the exact no-eviction regime; these cover the sketch
  * regime the fixtures never enter — eviction under pressure, the
  * never-underestimate guarantee, and merge across partitions.
  */
class ApproxTopKSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct fits capacity, ordered (cnt desc, item asc)") {
    val rows = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(20)("c") ++ Seq.fill(5)("d")
    val got = rows.toDF("x").repartition(7)
      .agg(api.approxTopK(col("x"), 3, 16).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // b/c tie at 20 resolves by item asc
    assert(got.toSeq == Seq(("a", 30L, 0L), ("b", 20L, 0L), ("c", 20L, 0L)))
  }

  test("under eviction pressure the true heavy hitter survives, never undercounted") {
    // 400 'hot' + 200 singletons, capacity 16 << 201 distinct
    val rows = Seq.fill(400)("hot") ++ (1 to 200).map(i => s"rare$i")
    val got = rows.toDF("x").repartition(5)
      .agg(api.approxTopK(col("x"), 1, 16).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).head
    assert(got._1 == "hot", s"heavy hitter evicted: $got")
    assert(got._2 >= 400L, s"SpaceSaving must never underestimate: $got")
    assert(got._2 - got._3 <= 400L, s"cnt - err must lower-bound the true count: $got")
  }

  test("weighted: exact totals when distinct fits capacity, weight-ordered") {
    val rows = Seq(("a", 5L), ("a", 5L), ("b", 30L), ("c", 1L), ("c", 2L))
    val got = rows.toDF("x", "w").repartition(3)
      .agg(api.approxTopKWeighted(col("x"), col("w"), 3, 16).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.w", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("b", 30L, 0L), ("a", 10L, 0L), ("c", 3L, 0L)))
  }

  test("weighted: heavy item survives eviction pressure, never undercounted") {
    // one item carrying most of the weight + 200 light singletons
    val rows = Seq.fill(40)(("hot", 50L)) ++ (1 to 200).map(i => (s"rare$i", 1L))
    val got = rows.toDF("x", "w").repartition(5)
      .agg(api.approxTopKWeighted(col("x"), col("w"), 1, 16).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.w", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).head
    assert(got._1 == "hot", s"heavy item evicted: $got")
    assert(got._2 >= 2000L, s"weighted SpaceSaving must never underestimate: $got")
    assert(got._2 - got._3 <= 2000L, s"w - err must lower-bound the true total: $got")
  }

  test("SQL surface: approx_topk registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT approx_topk(x, 2, 8) AS t FROM VALUES ('p'),('p'),('q') AS v(x)")
      .select(explode(col("t")).as("e")).select("e.item", "e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(r.toSeq == Seq(("p", 2L), ("q", 1L)))
  }
}
