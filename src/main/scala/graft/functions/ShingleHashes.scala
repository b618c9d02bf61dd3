package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word-3-gram shingles of a text column — the near-dup
  * identity unit of the dedup family (DedupOps), as ONE fused pass.
  *
  * Why a custom expression: the built-in phrasing
  * `transform(sequence(...), i -> xxhash64(element_at(toks, i+1), ...))`
  * evaluates its lambda INTERPRETED, and every `element_at(toks, ...)`
  * re-evaluates the captured `split(text, ' ')` — three full re-splits of
  * the document per shingle, O(tokens²) per document (measured 4.3 s of
  * dedup_minhash's 6.2 s at sf0.1). Here: tokenize once (single byte scan,
  * same single-space semantics as `split(text, ' ')`), XXH64 each token
  * once, mix the three token hashes per shingle (boost-style hash_combine,
  * public technique), sort + dedup in place. Shingle ids are engine-
  * internal (only set cardinalities reach the Jaccard verify and the
  * MinHash sketch), so the combine choice affects nothing downstream.
  *
  * Texts shorter than 3 tokens fall back to one whole-text hash, matching
  * the previous guard.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashes.compute($v));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 42L

  /** XXH64 of a token's bytes — one hash per token, reused by every
    * shingle the token participates in.
    */
  private[functions] def tokenHash(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  /** 64-bit hash_combine (boost-style, public technique) with a SplitMix64
    * finalize for avalanche.
    */
  private[functions] def combine(a: Long, b: Long): Long =
    MinHashSignature.splitmix64(a ^ (b + 0x9E3779B97F4A7C15L + (a << 6) + (a >>> 2)))

  /** Sorted distinct 3-gram shingle hashes; single-space tokenization
    * (empty tokens included), identical to `split(text, ' ')`.
    */
  def compute(text: UTF8String): Array[Long] = {
    val toks = text.split(UTF8String.fromString(" "), -1)
    val n = toks.length
    if (n < 3) return Array(tokenHash(text))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = tokenHash(toks(i)); i += 1 }
    val out = new Array[Long](n - 2)
    i = 0
    while (i < n - 2) {
      out(i) = combine(combine(th(i), th(i + 1)), th(i + 2))
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }
}
