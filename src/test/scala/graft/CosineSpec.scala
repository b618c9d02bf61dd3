package graft

import graft.functions.api
import graft.operators.SimOps
import org.apache.spark.sql.functions._

/** The codegen'd CosineSimilarity expression is bit-identical to the
  * built-in higher-order-function formulation, interpreted and codegen
  * paths agree, and the SQL registration works.
  */
class CosineSpec extends SparkSpec {

  test("codegen cosine == built-in cosine, bit-exact, on real embeddings") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.limit(1).select(col("v").as("qv"))
    val both = e.crossJoin(q)
      .select(
        api.cosineSim(col("v"), col("qv")).as("fast"),
        SimOps.cosine(col("v"), col("qv")).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine properties: self-similarity 1, symmetry, known values") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),    // identical -> 1
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),    // orthogonal -> 0
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)),   // opposite -> -1
      (Seq(3.0, 4.0), Seq(4.0, 3.0)))    // 24/25
      .toDF("a", "b")
      .select(api.cosineSim(col("a"), col("b")).as("c"),
        api.cosineSim(col("b"), col("a")).as("c_sym"))
      .collect()
    val got = df.map(_.getDouble(0)).toSeq
    assert(got(0) == 1.0 && math.abs(got(1)) < 1e-15 && got(2) == -1.0)
    assert(math.abs(got(3) - 24.0 / 25.0) < 1e-15)
    df.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("float arrays are implicitly cast") {
    import spark.implicits._
    val one = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(api.cosineSim(col("a"), col("b")).as("c")).head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("null inputs yield null") {
    import spark.implicits._
    val r = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(api.cosineSim(col("a"), col("b")).as("c")).head()
    assert(r.isNullAt(0))
  }

  test("ragged (different-length) arrays yield null, matching the built-in") {
    import spark.implicits._
    val rows = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)))
      .toDF("a", "b")
      .select(
        api.cosineSim(col("a"), col("b")).as("fast"),
        SimOps.cosine(col("a"), col("b")).as("ref"))
      .head()
    // a truncated-vector similarity would silently pass a malformed
    // embedding through dedup_embedding's >= 0.95 gate; both paths refuse
    assert(rows.isNullAt(0) && rows.isNullAt(1))
    // interpreted path (no codegen) agrees
    val interp = spark.sql(
      "SELECT cosine_sim(array(1.0d,2.0d,3.0d), array(1.0d,2.0d)) AS c").head()
    assert(interp.isNullAt(0))
  }

  test("SQL surface: cosine_sim registered via GraftExtensions") {
    // the shared test session is built with spark.sql.extensions=graft.GraftExtensions
    val v = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(0.5d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(v == 1.0)
  }
}
