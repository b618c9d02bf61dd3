package graft

import graft.functions.{NormalizeText, ZOrderValue}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The two round-3 layout/cleanup expressions: Unicode normalization and the
  * Z-order clustering key — codegen ≡ reference semantics, algebraic
  * round-trips, and the clustering property sort_zorder's pruning story
  * rests on.
  */
class NormalizeZorderSpec extends SparkSpec {

  private def norm(s: String): String =
    NormalizeText.compute(UTF8String.fromString(s)).toString

  test("normalize_text: accents stripped, lowered, whitespace collapsed") {
    assert(norm("Café  du   Monde") == "cafe du monde")
    assert(norm("  \tSŚx \r\n yü ") == "ssx yu") // Ś → s, ü → u, trim
    assert(norm("") == "")
    assert(norm(" \n\t ") == "")
    // NFD input (decomposed e + combining acute) normalizes like precomposed
    assert(norm("Café") == norm("Café"))
  }

  test("normalize_text is idempotent on generated inputs") {
    val rnd = new scala.util.Random(5)
    val alphabet = "aA éÜŁz.\tñB-"
    val samples = Seq.fill(200)(
      Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    samples.foreach(s => assert(norm(norm(s)) == norm(s), s"not idempotent on '$s'"))
  }

  test("normalize_text codegen path equals the helper on the documents table") {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), translate(col("text"), "aeu", "áéü").as("t"))
    val viaExpr = d.select(col("doc_id"),
        graft.functions.api.normalizeText(col("t")).as("n"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val viaHelper = d.orderBy("doc_id").collect().map(r => norm(r.getString(1)))
    assert(viaExpr.toSeq == viaHelper.toSeq)
  }

  test("zorder: interleave/deinterleave round-trip over the 21-bit domain") {
    val rnd = new scala.util.Random(17)
    val cases = Seq((0L, 0L), (ZOrderValue.Mask, ZOrderValue.Mask), (1L, 0L),
      (0L, 1L)) ++ Seq.fill(500)((rnd.nextLong() & ZOrderValue.Mask,
      rnd.nextLong() & ZOrderValue.Mask))
    cases.foreach { case (x, y) =>
      assert(ZOrderValue.deinterleave(ZOrderValue.interleave(x, y)) == (x, y))
    }
    // out-of-domain inputs are masked, never corrupted
    assert(ZOrderValue.interleave(-1L, 0L) ==
      ZOrderValue.interleave(ZOrderValue.Mask, 0L))
  }

  test("zorder is monotonic in each dimension with the other held fixed") {
    val rnd = new scala.util.Random(23)
    Seq.fill(200)((rnd.nextInt(1 << 21).toLong, rnd.nextInt((1 << 21) - 1).toLong))
      .foreach { case (fixed, v) =>
        assert(ZOrderValue.interleave(v, fixed) < ZOrderValue.interleave(v + 1, fixed))
        assert(ZOrderValue.interleave(fixed, v) < ZOrderValue.interleave(fixed, v + 1))
      }
  }

  test("zorder clusters both dimensions: quadrant prefixes are contiguous") {
    // the file-skipping claim in miniature: sorting a 64x64 grid by zval
    // puts each 32x32 quadrant in one contiguous run, so min/max stats on
    // zval ranges bound BOTH coordinates
    val zs = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (ZOrderValue.interleave(x, y), x / 32, y / 32)
    val sorted = zs.sortBy(_._1).map(q => (q._2, q._3))
    val runs = sorted.foldLeft(List.empty[(Long, Long)]) {
      case (acc, q) if acc.headOption.contains(q) => acc
      case (acc, q) => q :: acc
    }
    assert(runs.size == 4, s"expected 4 contiguous quadrant runs, got ${runs.size}")
  }

  test("normalize_text and zorder_value are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      """SELECT normalize_text(' Café  X ') AS n,
        |       zorder_value(3L, 5L) AS z""".stripMargin).head()
    assert(r.getString(0) == "cafe x")
    // x=3 (bits 0,1 -> even pos 0,2), y=5 (bits 0,2 -> odd pos 1,5): 0b100111
    assert(r.getLong(1) == 39L)
  }

  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinkler.computeRaw(a, b)

  test("jaro_winkler: literature values, edges, and the floor-t convention") {
    // Winkler's canonical pairs
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // identity / disjoint / empty
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 1.0)
    // no Winkler boost at or below the 0.7 gate despite a common prefix
    assert(math.abs(jw("ax", "abcdefgh") - 0.5416666666666666) < 1e-12)
    // prefix capped at 4 even with a 14-char common prefix
    assert(math.abs(
      jw("prefix_common_xyz", "prefix_common_abc") - 0.9294117647058824) < 1e-12)
    // odd transposition count floors (rapidfuzz/DuckDB convention):
    // 'small gizmo'/'hot gear' has m=3 with 3 out-of-order positions
    assert(math.abs(jw("small gizmo", "hot gear") - 0.43813131313131315) < 1e-12)
  }

  test("jaro_winkler codegen path matches the helper and is SQL-registered") {
    val p = Tables.part(spark, sf).select(col("p_partkey"), col("p_name")).limit(50)
    val pairs = p.crossJoin(p.select(col("p_name").as("q_name")))
    val viaExpr = pairs
      .select(graft.functions.api.jaroWinkler(col("p_name"), col("q_name")))
      .collect().map(_.getDouble(0))
    val viaHelper = pairs.collect().map(r => jw(r.getString(1), r.getString(2)))
    viaExpr.zip(viaHelper).foreach { case (e, h) => assert(e == h) }
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").head()
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
  }
}
