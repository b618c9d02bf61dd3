package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** MinHash signature as a single-pass custom aggregate (SURVEY.md §2 I /
  * §7.3 "custom Aggregator for minhash"): aggregates a group's 64-bit
  * shingle hashes into a `numPerms`-slot signature of per-permutation
  * minima.
  *
  * Permutations are the standard universal-hash family h_k(x) = a_k*x + b_k
  * (mod 2^64, a_k odd), with a_k/b_k derived from the permutation index by
  * SplitMix64 (public algorithm; Steele et al., "Fast Splittable
  * Pseudorandom Number Generators") — so each input row costs ONE strong
  * hash upstream (xxhash64 of the shingle) plus `numPerms` multiply-adds
  * here, instead of `numPerms` independent full hashes.
  *
  * Why `TypedImperativeAggregate` and not 64 built-in `min()` columns: the
  * signature is a fixed-width sketch buffer — one `long[64]` updated in a
  * tight JVM loop, serialized only at shuffle boundaries. The 64-column
  * formulation is semantically identical but generates 64 separate
  * aggregate expressions (quadratic codegen surface, 64 hash evaluations
  * per row); this is the "sketch buffers demand it" case called out in
  * SURVEY.md §2 group I. Partial aggregation still applies: update runs
  * map-side, merge combines per-slot minima after the exchange.
  */
case class MinHashSignature(
    child: Expression,
    numPerms: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val as: Array[Long] = Array.tabulate(numPerms)(k => MinHashSignature.splitmix64(2L * k) | 1L)
  private val bs: Array[Long] = Array.tabulate(numPerms)(k => MinHashSignature.splitmix64(2L * k + 1))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input (pre-hashed shingle), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < numPerms) {
        val p = as(k) * h + bs(k)
        if (p < buf(k)) buf(k) = p
        k += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numPerms) {
      if (other(k) < buf(k)) buf(k) = other(k)
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numPerms)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** SplitMix64 finalizer (public domain; Steele et al.) — deterministic
    * per-permutation constants.
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
