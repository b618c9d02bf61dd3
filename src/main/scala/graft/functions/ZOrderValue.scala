package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve value of two long keys — bit-interleave of the low
  * 21 bits of each (x on even positions, y on odd), the multi-dimensional
  * clustering key behind Delta/Iceberg `OPTIMIZE ZORDER BY` (public
  * literature: Morton 1966). Sorting or range-partitioning by this value
  * co-locates rows that are close in BOTH dimensions, so file-level min/max
  * statistics prune scans filtered on either key — a 1-D sort can only ever
  * serve its leading column.
  *
  * Why a custom expression: the relational phrasing is a 42-term
  * shift-mask-or chain (exactly what the DuckDB oracle twin evaluates);
  * here it is one fused magic-number interleave (the public
  * "Interleave bits by Binary Magic Numbers" bit-twiddling technique)
  * inside whole-stage codegen. Inputs are masked to 21 bits explicitly, so
  * the mapping is total and engine-independent at any scale.
  */
case class ZOrderValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_value"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderValue.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderValue.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderValue {

  final val Bits = 21
  final val Mask = (1L << Bits) - 1

  /** Spread the low 21 bits of `v` onto even bit positions (0,2,4,...). */
  private def spread(v: Long): Long = {
    var x = v & Mask
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spread]]: gather even bit positions back into an int. */
  private def gather(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Round-trip inverse, for the property spec: z → (x, y). */
  def deinterleave(z: Long): (Long, Long) = (gather(z), gather(z >>> 1))
}
