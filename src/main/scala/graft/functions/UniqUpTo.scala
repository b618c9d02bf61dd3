package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded-state distinct count saturating at `n + 1` — the ClickHouse
  * `uniqUpTo(N)` analog: "does this column have more than N distinct
  * values, and if not, exactly how many?" — the cardinality guard a
  * quality gate or a pivot-width check asks at 100 TB, where a full
  * `count(distinct)` pays an unbounded shuffle for an answer that only
  * needed one bit past N.
  *
  * State: a hash set of XXH64(value) capped at `n + 1` entries — once the
  * cap is reached nothing more is ever added, so per-group memory is
  * O(n) regardless of the group's true cardinality, and partials merge by
  * capped union. Result: the exact distinct count while ≤ n, else n + 1
  * ("more than n"). Exactness rides on 64-bit hashing: a within-group
  * collision would need ~2^32 distinct values (documented contract; the
  * oracle twin is LEAST(count(DISTINCT x), n+1)).
  */
case class UniqUpTo(
    child: Expression,
    n: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Long]]
  with UnaryLike[Expression] {

  require(n >= 1, "need n >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "uniq_up_to"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an atomic type, got ${child.dataType.simpleString}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashSet[Long] =
    mutable.HashSet.empty

  override def update(buf: mutable.HashSet[Long],
      input: InternalRow): mutable.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null && buf.size <= n) {
      buf.add(XxHash64Function.hash(v, child.dataType, 0x5eed5eedL))
    }
    buf
  }

  override def merge(buf: mutable.HashSet[Long],
      other: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    val it = other.iterator
    while (it.hasNext && buf.size <= n) buf.add(it.next())
    buf
  }

  override def eval(buf: mutable.HashSet[Long]): Any =
    math.min(buf.size, n + 1).toLong

  override def serialize(buf: mutable.HashSet[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    out.putInt(buf.size)
    buf.foreach(h => out.putLong(h))
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val sz = in.getInt
    val s = mutable.HashSet.empty[Long]
    var i = 0
    while (i < sz) { s.add(in.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): UniqUpTo =
    copy(child = newChild)
}
