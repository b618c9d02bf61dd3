package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Approximate heavy hitters — the ClickHouse `topK` analog — as a
  * mergeable SpaceSaving sketch (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams", public literature).
  *
  * The buffer holds at most `capacity` (item → (count, overestimate))
  * counters. A seen item increments its counter; an unseen item beyond
  * capacity EVICTS the minimum counter and inherits its count (+1), with
  * that count recorded as the new item's overestimation bound — the
  * SpaceSaving guarantees: counts are never underestimated, the
  * overestimate per item is at most min-counter, and any item with true
  * frequency > N/capacity is present. When a group's distinct count stays
  * ≤ capacity no eviction ever happens, errors are all zero, and the
  * sketch is EXACT — the documented contract the oracle-paired query key
  * leans on (capacity 64 over a ~5-value column).
  *
  * Merge (partial aggregation / shuffle): counts of common items add,
  * one-sided items keep their counts, then the union is trimmed back to
  * `capacity` by keeping the largest — the standard parallel SpaceSaving
  * merge; all guarantee bounds add. Output: the top `k` counters as
  * `array<struct<item, cnt, err>>`, ordered (cnt desc, item asc) so the
  * result is deterministic under ties.
  *
  * Scale: this is the bounded-memory path for "top domains / top repos /
  * top tokens over 100 TB" — per-group state is O(capacity) regardless of
  * cardinality, partials combine map-side, and nothing ever gathers a
  * group's raw values on one reducer (`agg_collect`'s exact formulation
  * does, deliberately, for small groups).
  */
case class ApproxTopK(
    child: Expression,
    k: Int = 3,
    capacity: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]]
  with UnaryLike[Expression] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "approx_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  override def update(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some((c, e)) => buf.update(item, (c + 1L, e))
        case None if buf.size < capacity => buf.update(item, (1L, 0L))
        case None =>
          // evict the min counter; the newcomer inherits its count as the
          // overestimation bound (the SpaceSaving replacement rule)
          val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
          buf.remove(minItem)
          buf.update(item, (minC + 1L, minC))
      }
    }
    buf
  }

  override def merge(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      other: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    for ((item, (c, e)) <- other) buf.get(item) match {
      case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
      case None => buf.update(item, (c, e))
    }
    if (buf.size > capacity) {
      val keep = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      buf.clear()
      buf ++= keep
    }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(i), c, e))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    for ((i, (c, e)) <- buf) {
      val b = i.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ApproxTopK =
    copy(child = newChild)
}

/** Weighted SpaceSaving (ClickHouse `topKWeighted` analog): identical
  * sketch, but each row contributes its WEIGHT instead of 1 — "top items
  * by revenue / bytes / tokens", not by row count. The replacement rule
  * generalizes verbatim (newcomer inherits minC + w with error bound
  * minC); negative weights are rejected — SpaceSaving's never-underestimate
  * guarantee is meaningless with cancellation. Same merge, same
  * exact-when-distinct≤capacity contract as [[ApproxTopK]].
  */
case class ApproxTopKWeighted(
    left: Expression,
    right: Expression,
    k: Int = 3,
    capacity: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("w", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "approx_topk_weighted"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  override def update(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = left.eval(input)
    val wv = right.eval(input)
    if (v != null && wv != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val w = wv.asInstanceOf[Long]
      // Negative weights break the SpaceSaving invariants (counts must be
      // monotone); surface a plain IllegalArgumentException from the task
      // (documented contract — callers see it wrapped in a SparkException).
      if (w < 0L)
        throw new IllegalArgumentException(s"$prettyName: negative weight $w")
      // A zero-weight row carries no mass: treat it like null rather than
      // letting an unseen w=0 item evict an established counter and
      // inherit minC (legal under SpaceSaving but wasteful — ClickHouse's
      // topKWeighted likewise ignores it).
      if (w > 0L || buf.contains(item)) buf.get(item) match {
        case Some((c, e)) => buf.update(item, (c + w, e))
        case None if buf.size < capacity => buf.update(item, (w, 0L))
        case None =>
          val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
          buf.remove(minItem)
          buf.update(item, (minC + w, minC))
      }
    }
    buf
  }

  override def merge(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      other: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    for ((item, (c, e)) <- other) buf.get(item) match {
      case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
      case None => buf.update(item, (c, e))
    }
    if (buf.size > capacity) {
      val keep = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      buf.clear()
      buf ++= keep
    }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(i), c, e))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    for ((i, (c, e)) <- buf) {
      val b = i.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ApproxTopKWeighted =
    copy(left = newLeft, right = newRight)
}
