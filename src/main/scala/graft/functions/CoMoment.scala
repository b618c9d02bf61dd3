package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** One-pass mergeable vector co-moment accumulator — the covariance /
  * Gram-matrix building block of an embedding pipeline (PCA whitening,
  * feature decorrelation, OOD scoring).
  *
  * For a `d`-dimensional double-array column it accumulates
  * `[n, Σx_0 … Σx_{d-1}, Σx_i·x_j for i ≤ j]` — a flat buffer of
  * `1 + d + d(d+1)/2` doubles. Covariance then derives per pair as
  * `Σxy/n − (Σx/n)(Σy/n)`.
  *
  * Why a custom aggregate: the compositional alternative explodes each
  * vector into d² (i, j, x·y) rows and groups — an N·d² exchange that is
  * 4096× the input width at d=64 and simply impossible at 100 TB. Here
  * the scan is one pass, per-partition state is O(d²) REGARDLESS of N,
  * partials merge element-wise, and the result row is d(d+1)/2-sized
  * metadata. Buffers are primitive double arrays; update is two nested
  * loops over a local `Array[Double]` — no boxing in the hot path.
  */
case class CoMoment(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  require(d >= 1 && d <= 512, s"need 1 <= d <= 512, got $d")

  private val size = 1 + d + d * (d + 1) / 2

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "co_moment"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](size)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"$prettyName: expected dimension $d, got ${arr.numElements()}")
      val x = arr.toDoubleArray()
      buf(0) += 1.0
      var i = 0
      var k = 1 + d
      while (i < d) {
        buf(1 + i) += x(i)
        var j = i
        while (j < d) {
          buf(k) += x(i) * x(j)
          k += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 * size)
    var i = 0
    while (i < size) { out.putDouble(buf(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Double](size)
    var i = 0
    while (i < size) { buf(i) = in.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CoMoment =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CoMoment =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CoMoment =
    copy(child = newChild)
}
