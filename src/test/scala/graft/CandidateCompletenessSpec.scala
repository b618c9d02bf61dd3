package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Pins the AllPairs prefix-filter completeness THEOREM the candidate-
  * limited DuckDB oracles now lean on (VERDICT r7 ask #2): with the r8
  * oracle rewrite, both engines generate candidates from rarest-first
  * prefixes, so "engine == oracle" alone would no longer catch a candidate
  * set that silently lost a true pair — the two sides could agree on the
  * same wrong subset. These tests restore the independence by computing
  * the LITERAL all-pairs truth (no prefixes, no length filter — quadratic,
  * which is exactly why it lives here at spec scale and not in a sweep
  * oracle) and asserting the production keys equal it row for row.
  *
  * Tie-break orders differ between the engines (shingle hash vs string);
  * the theorem says any fixed total order is candidate-complete, so the
  * verified outputs must match the truth regardless — that is the claim
  * under test.
  */
class CandidateCompletenessSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01" // 500 docs -> 124,750 pairs: fine

  private def shingled: DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      graft.functions.api.shingleHashes(col("text")).as("sh"))

  private def jac = size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType) /
    size(array_union(col("a.sh"), col("b.sh"))).cast(DoubleType)

  /** All-pairs exact-Jaccard >= t dup pairs (a_id < b_id), the truth. */
  private def truthPairs(t: Double): DataFrame = {
    val sh = shingled
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(jac >= t)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)

  test("dedup_ngram_jaccard retained set == all-pairs truth (no prefix recall loss)") {
    val truthDropped = truthPairs(0.8).select(col("b_id").as("doc_id")).distinct()
    val expect = Tables.documents(spark, dir)
      .join(truthDropped, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")
    val got = operators.DedupOps.queries("dedup_ngram_jaccard")(spark, dir)
    assert(rows(got) == rows(expect))
  }

  test("dedup_cluster_cc components == components of the all-pairs truth graph") {
    val roots = operators.DedupOps.ccRoots(
      truthPairs(0.8).select(col("a_id").as("u"), col("b_id").as("v")))
    val expect = Tables.documents(spark, dir).select("doc_id", "lang", "source")
      .join(roots.withColumnRenamed("u", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("rep_id"),
        col("lang"), col("source"))
      .orderBy("doc_id")
    val got = operators.DedupOps.queries("dedup_cluster_cc")(spark, dir)
    assert(rows(got) == rows(expect))
  }

  test("dedup_containment pairs == all-pairs truth (asymmetric prefix loses nothing)") {
    val sh = shingled
    val expect = sh.as("a").join(sh.as("b"), col("a.doc_id") =!= col("b.doc_id"))
      .withColumn("containment",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType) /
          size(col("a.sh")).cast(DoubleType))
      .filter(col("containment") >= 0.9)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        round(col("containment"), 6).as("containment"))
      .orderBy("a_id", "b_id")
    val got = operators.DedupOps.queries("dedup_containment")(spark, dir)
    assert(rows(got) == rows(expect))
  }

  test("dedup_incremental accepted set == all-pairs cross-split truth") {
    val sh = shingled.withColumn("is_new", Tables.splitHash(col("doc_id"), 100L) >= 90)
    val hits = sh.filter(col("is_new")).as("a")
      .join(sh.filter(!col("is_new")).as("b"), jac >= 0.8)
      .select(col("a.doc_id").as("doc_id")).distinct()
    val expect = Tables.documents(spark, dir)
      .join(sh.filter(col("is_new")).select("doc_id"), Seq("doc_id"), "left_semi")
      .join(hits, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")
    val got = operators.DedupOps.queries("dedup_incremental")(spark, dir)
    assert(rows(got) == rows(expect))
  }
}
