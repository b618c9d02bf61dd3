package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column (Charikar, public literature): per-bit
  * majority vote over the XXH64 hashes of the document's DISTINCT
  * single-space tokens — one fused map-side pass.
  *
  * Why a custom expression: the relational phrasing (explode distinct
  * tokens → groupBy(doc_id) with 64 conditional-sum aggregates → fold the
  * signature) pays a token-row explode and an aggregation exchange for
  * what is a scalar function of the document; at 100 TB the signature
  * should be map-only, like every other fingerprint. Token hashing uses
  * seed 42 — byte-identical to Spark's `xxhash64(token)`, so signatures
  * match the previous aggregate formulation bit for bit (distinctness by
  * token hash rather than token bytes differs only on 64-bit collisions).
  * Majority rule: bit set when strictly more +1s than -1s (`sum > 0`),
  * matching the aggregate version's `when(sum > 0, ...)`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SimHash64.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private val Seed = 42L // Spark's xxhash64 default seed

  def compute(text: UTF8String): Long = {
    val toks = text.split(UTF8String.fromString(" "), -1)
    val hs = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    val counts = new Array[Int](64)
    i = 0
    var prev = 0L
    var first = true
    while (i < hs.length) {
      val h = hs(i)
      if (first || h != prev) { // distinct tokens only
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        prev = h; first = false
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
