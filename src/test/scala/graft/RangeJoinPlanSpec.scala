package graft

import graft.operators.RangeJoin
import graft.plans.BandedRangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The plan-level banded range join (graft.plans.BandedRangeJoin +
  * RangeJoinRewrite): semantics against the naive BETWEEN join, band-width
  * invariance, the expanded plan's scale shape (equi-join on the band key,
  * never a nested loop), and the factory's contract validation.
  */
class RangeJoinPlanSpec extends SparkSpec {

  private val HourUs = 3600L * 1000000
  private val DayUs = 24 * HourUs

  private def events = Tables.events(spark, sf)
  private def points = events.select(col("event_id"), col("user_id"), col("ts"))

  /** 30-min-gap error-incident islands — the `join_interval_bucketed`
    * fixture, rebuilt here as a plain interval table.
    */
  private def incidents: DataFrame = {
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy("d").orderBy("ts", "event_id")
    events.filter(col("event_type") === "error")
      .select(to_date(col("ts")).as("d"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(wi))
      .withColumn("brk",
        when(col("prev").isNull ||
          col("ts") > col("prev") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("inc_n", sum("brk").over(
        wi.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("d").as("inc_day"), col("inc_n"))
      .agg(min("ts").as("inc_start"), max("ts").as("inc_end"))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def banded(band: Long): DataFrame =
    RangeJoin.join(points, incidents, "ts", "inc_start", "inc_end", band)
      .select("event_id", "inc_day", "inc_n", "inc_start")
      .orderBy("event_id", "inc_day", "inc_n")

  private def naive: DataFrame =
    points.join(incidents,
        col("ts") >= col("inc_start") && col("ts") <= col("inc_end"))
      .select("event_id", "inc_day", "inc_n", "inc_start")
      .orderBy("event_id", "inc_day", "inc_n")

  test("matches the naive BETWEEN join exactly (each pair exactly once)") {
    assert(rows(banded(HourUs)) == rows(naive))
  }

  test("band width is a tuning knob, not a semantic: 1h == 1d == 7d") {
    val h = rows(banded(HourUs))
    assert(h == rows(banded(DayUs)))
    assert(h == rows(banded(7 * DayUs)))
  }

  test("expanded plan: no BandedRangeJoin survives; equi-join on the band; no NLJ") {
    val df = banded(HourUs)
    assert(!df.queryExecution.analyzed.exists(_.isInstanceOf[BandedRangeJoin]),
      "resolution rule must expand the node during analysis")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the range join must never plan as a nested loop:\n" + p.take(1500))
    assert(p.contains("Generate"), "interval banding must explode via Generate:\n" + p.take(1200))
    // the naive twin DOES nested-loop — that is the defect this node removes
    val np = naive.queryExecution.executedPlan.toString
    assert(np.contains("BroadcastNestedLoopJoin") || np.contains("CartesianProduct"),
      "fixture sanity: the naive BETWEEN join should be the nested-loop shape")
  }

  test("sentinel interval raises the named band-cap error, not an opaque sequence failure") {
    import spark.implicits._
    // one open-ended "active" interval with a far-future hi: at a 1-second
    // band it spans ~2.4e11 bands — without the guard, sequence() dies with
    // an internal array-size error; with it (ADVICE r6 #3) the query raises
    // a named error telling the user to widen bandMicros.
    val sentinel = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
       java.sql.Timestamp.valueOf("9999-12-31 00:00:00"), 1L))
      .toDF("inc_start", "inc_end", "inc_id")
    val ex = intercept[Exception] {
      RangeJoin.join(points, sentinel, "ts", "inc_start", "inc_end", 1000000L)
        .count()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages(ex).contains("widen bandMicros"),
      "guard must surface the actionable range_join error: " + messages(ex).take(800))
    // the same interval at a sane band width (30 days) joins fine
    val ok = RangeJoin.join(points, sentinel, "ts", "inc_start", "inc_end",
      30L * DayUs)
    assert(ok.count() == points.count())
  }

  test("optional equality key: per-user day spans, matches the keyed naive join") {
    val spans = events.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min("ts").as("span_lo"), max("ts").as("span_hi"))
    val viaPlan = RangeJoin.join(points, spans, "ts", "span_lo", "span_hi",
        HourUs, key = Some("user_id"))
      .select("event_id", "day", "span_lo")
      .orderBy("event_id", "day")
    val viaNaive = points.join(spans, Seq("user_id"))
      .filter(col("ts") >= col("span_lo") && col("ts") <= col("span_hi"))
      .select("event_id", "day", "span_lo")
      .orderBy("event_id", "day")
    assert(rows(viaPlan) == rows(viaNaive))
    assert(viaPlan.count() >= points.count()) // every point is inside its own day span
  }

  test("degenerate intervals (lo > hi) match nothing and raise nothing") {
    val flipped = incidents.select(col("inc_day"), col("inc_n"),
      col("inc_end").as("inc_start"), col("inc_start").as("inc_end"))
    val mixed = incidents.unionByName(
      flipped.filter(col("inc_start") =!= col("inc_end")))
    val out = RangeJoin.join(points, mixed, "ts", "inc_start", "inc_end", HourUs)
      .select("event_id", "inc_day", "inc_n", "inc_start")
      .orderBy("event_id", "inc_day", "inc_n")
    assert(rows(out) == rows(banded(HourUs)))
  }

  test("self-join: the same plan on both sides re-aliases cleanly") {
    val iv = incidents.select(col("inc_n"), col("inc_start"),
      col("inc_end"), col("inc_start").as("pt"))
    val out = RangeJoin.join(
      iv.select(col("inc_n").as("a_n"), col("pt")), iv.drop("pt"),
      "pt", "inc_start", "inc_end", HourUs)
    assert(out.count() >= incidents.count()) // every start sits in its own interval
  }

  test("factory validates the column contract") {
    val e1 = intercept[IllegalArgumentException](
      RangeJoin.join(points, incidents, "ts", "nope", "inc_end", HourUs))
    assert(e1.getMessage.contains("not found"))
    val e2 = intercept[IllegalArgumentException](
      RangeJoin.join(points, incidents.withColumn("inc_start",
        unix_micros(col("inc_start"))), "ts", "inc_start", "inc_end", HourUs))
    assert(e2.getMessage.contains("TimestampType"))
    val e3 = intercept[IllegalArgumentException](
      RangeJoin.join(points, incidents, "ts", "inc_start", "inc_end", 0L))
    assert(e3.getMessage.contains("positive"))
    val e4 = intercept[IllegalArgumentException](
      RangeJoin.join(points, incidents.withColumn("ts", col("inc_start")),
        "ts", "inc_start", "inc_end", HourUs))
    assert(e4.getMessage.contains("collide"))
    // key aliased as a bound column (the AsOfJoin aliasing trap)
    val spans = events.groupBy(col("user_id")).agg(
      min("ts").as("span_lo"), max("ts").as("span_hi"))
    val e5 = intercept[IllegalArgumentException](
      RangeJoin.join(points, spans,
        "ts", "span_lo", "span_hi", HourUs, key = Some("span_lo")))
    assert(e5.getMessage.contains("interval bound"))
  }

  test("SQL TVF: range_join(...) matches the Scala node and plans identically") {
    points.createOrReplaceTempView("tvf_rj_points")
    incidents.createOrReplaceTempView("tvf_rj_incidents")
    val viaSql = spark.sql(
      s"""SELECT event_id, inc_day, inc_n, inc_start
         |FROM range_join('tvf_rj_points', 'tvf_rj_incidents',
         |                'ts', 'inc_start', 'inc_end', $HourUs)
         |ORDER BY event_id, inc_day, inc_n""".stripMargin)
    assert(rows(viaSql) == rows(banded(HourUs)))
    def spine(df: DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case p => p.nodeName }
    assert(spine(viaSql) == spine(banded(HourUs)),
      s"SQL and Scala range join must plan the same:\n${spine(viaSql)}")
  }

  test("SQL TVF: argument validation") {
    points.createOrReplaceTempView("tvf_rj_points")
    incidents.createOrReplaceTempView("tvf_rj_incidents")
    val badArity = intercept[Exception](
      spark.sql("SELECT * FROM range_join('tvf_rj_points', 'tvf_rj_incidents')"))
    assert(badArity.getMessage.contains("6-7 arguments"))
    val badBand = intercept[Exception](spark.sql(
      """SELECT * FROM range_join('tvf_rj_points', 'tvf_rj_incidents',
        |'ts', 'inc_start', 'inc_end', 'soon')""".stripMargin))
    assert(badBand.getMessage.contains("band_micros"))
    val badCol = intercept[Exception](spark.sql(
      s"""SELECT * FROM range_join('tvf_rj_points', 'tvf_rj_incidents',
         |'ts', 'nope', 'inc_end', $HourUs)""".stripMargin))
    assert(badCol.getMessage.contains("not found"))
  }
}
