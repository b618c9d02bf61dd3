package graft
// Throwaway r10 measurement harness — A/B variants for single keys.
// Not referenced by queries/oracle; deleted (or inert) by round end.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame

object QPerf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timeIt(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $label ${ts.min}%.3f (${ts.mkString(", ")})")
    }
    val cuts = array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))
    def orig = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), cuts).as("qs"))
      .select(col("l_returnflag"),
        round(element_at(col("qs"), 1), 4).as("p25"),
        round(element_at(col("qs"), 2), 4).as("p50"),
        round(element_at(col("qs"), 3), 4).as("p75"),
        round(element_at(col("qs"), 4), 4).as("p95"))
      .orderBy("l_returnflag")
    def win = {
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val wp = Window.partitionBy("l_returnflag")
      val base = Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wp))
      val withPos = ps.zipWithIndex.foldLeft(base) { case (df, (p, i)) =>
        df.withColumn(s"pos$i", lit(p) * (col("n") - 1))
          .withColumn(s"flo$i", floor(col(s"pos$i")))
          .withColumn(s"hi$i", ceil(col(s"pos$i")))
      }
      val keep = ps.indices.map(i =>
        (col("rn") - 1 === col(s"flo$i")) || (col("rn") - 1 === col(s"hi$i")))
        .reduce(_ || _)
      val picked = withPos.filter(keep)
      val aggs = ps.indices.flatMap { i => Seq(
        max(when(col("rn") - 1 === col(s"flo$i"), col("l_extendedprice"))).as(s"lv$i"),
        max(when(col("rn") - 1 === col(s"hi$i"), col("l_extendedprice"))).as(s"uv$i"),
        max(col(s"pos$i")).as(s"p$i"),
        max(col(s"flo$i")).as(s"f$i"),
        max(col(s"hi$i")).as(s"h$i"))
      }
      val g = picked.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
      val qs = ps.indices.map { i =>
        when(col(s"h$i") === col(s"f$i") || col(s"uv$i") === col(s"lv$i"), col(s"lv$i"))
          .otherwise((col(s"h$i") - col(s"p$i")) * col(s"lv$i") +
            (col(s"p$i") - col(s"f$i")) * col(s"uv$i"))
      }
      g.select(col("l_returnflag"),
        round(qs(0), 4).as("p25"), round(qs(1), 4).as("p50"),
        round(qs(2), 4).as("p75"), round(qs(3), 4).as("p95"))
        .orderBy("l_returnflag")
    }
    timeIt("orig")(orig)
    timeIt("win")(win)
    val a = orig.collect().map(_.toString).toSeq
    val b = win.collect().map(_.toString).toSeq
    println("EQUAL " + (a == b))
    a.zip(b).foreach { case (x, y) => if (x != y) println(s"DIFF $x | $y") }
    spark.stop()
  }
}
