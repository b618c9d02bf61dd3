package graft

import graft.functions.api
import org.apache.spark.sql.functions._

/** Laws of the MinHashSignature aggregate: permutation-min structure,
  * merge = element-wise min (the property distributed partial aggregation
  * relies on), estimate accuracy, SQL registration.
  */
class MinHashSpec extends SparkSpec {

  private def sig(ids: Seq[Long]): Seq[Long] = {
    import spark.implicits._
    ids.toDF("g").agg(api.minHashSig(col("g")).as("s"))
      .head().getSeq[Long](0)
  }

  test("identical input sets yield identical signatures (any order/multiplicity)") {
    val a = sig(Seq(1L, 2L, 3L, 4L))
    assert(a == sig(Seq(4L, 3L, 2L, 1L)))
    assert(a == sig(Seq(1L, 1L, 2L, 3L, 4L, 4L)))
    assert(a.length == 64)
  }

  test("signature of a union is the element-wise min of the signatures") {
    // the defining minhash property — exactly what makes map-side partial
    // aggregation + merge correct at any partitioning
    val a = Seq(10L, 20L, 30L)
    val b = Seq(40L, 50L)
    val sa = sig(a); val sb = sig(b); val su = sig(a ++ b)
    assert(su == sa.zip(sb).map { case (x, y) => math.min(x, y) })
  }

  test("estimated Jaccard tracks true Jaccard within sampling error") {
    // J = 30/50 = 0.6; sd of a 64-perm estimate ~ sqrt(J(1-J)/64) ~ 0.06
    val shared = (1L to 30L)
    val a = shared ++ (100L to 119L)  // |a| = 50
    val b = shared ++ (200L to 219L)  // |b| = 50
    val sa = sig(a); val sb = sig(b)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 64.0
    assert(math.abs(est - 0.6) < 0.2, s"estimate $est too far from 0.6")
  }

  test("SQL registration: minhash_sig usable from spark.sql") {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("g").createOrReplaceTempView("mh_in")
    val viaSql = spark.sql("SELECT minhash_sig(g) AS s FROM mh_in")
      .head().getSeq[Long](0)
    assert(viaSql == sig(Seq(1L, 2L, 3L)))
  }

  test("groupBy partial aggregation matches single-partition computation") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i % 7, i * 31L))
    val many = rows.toDF("k", "g").repartition(8)
      .groupBy("k").agg(api.minHashSig(col("g")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val one = rows.toDF("k", "g").coalesce(1)
      .groupBy("k").agg(api.minHashSig(col("g")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(many == one)
  }
}
