package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd sign-random-projection band keys over a double-array column:
  * `Bands` bands x `Bits` hyperplane sign bits, returned as
  * `array<bigint>` of `Bands` band values — the LSH candidate key of
  * `dedup_embedding` (banding math documented there).
  *
  * Why a custom expression: the same computation phrased with
  * `zip_with`/`aggregate` higher-order functions pays per-element lambda
  * interpretation OUTSIDE whole-stage codegen — 256 interpreted array
  * traversals per row (measured 30 s at sf0.1); this emits one fused Java
  * loop over a JVM-static ±1 plane matrix (SplitMix64-derived, public
  * domain — Steele et al., as in [[MinHashSignature]]), ~16k mul-adds per
  * row inside codegen.
  */
case class SrpBandKeys(child: Expression, numBands: Int = SrpBandKeys.Bands,
    numBits: Int = SrpBandKeys.Bits)
  extends UnaryExpression {

  require(numBands >= 1 && numBands <= SrpBandKeys.Bands,
    s"numBands must be in 1..${SrpBandKeys.Bands}, got $numBands")
  require(numBits >= 1 && numBits <= SrpBandKeys.MaxBits,
    s"numBits must be in 1..${SrpBandKeys.MaxBits}, got $numBits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(SrpBandKeys.compute(v, numBands, numBits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planes = ctx.addReferenceObj("srpPlanes", SrpBandKeys.planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val bits = ctx.freshName("bits"); val row = ctx.freshName("row")
      s"""
         |final int $n = $v.numElements();
         |final long[] $out = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $bits = 0L;
         |  for (int $i = 0; $i < $numBits; $i++) {
         |    final double[] $row = $planes[$b * ${SrpBandKeys.MaxBits} + $i];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      if (!$v.isNullAt($d)) $s += $v.getDouble($d) * $row[$d & ${SrpBandKeys.MaxDim - 1}];
         |    }
         |    if ($s >= 0.0) $bits |= 1L << $i;
         |  }
         |  $out[$b] = $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBandKeys {
  /** 96 bands x 16 bits; planes cover MaxDim dims (power of two — longer
    * vectors wrap, the projection stays a valid LSH family).
    *
    * Geometry chosen for SCALE, not just recall: the round-6 sf1 ramp
    * measured the previous 32x8 banding quadratic on a 20k isotropic corpus
    * (random pairs collide per band with 2^-8, so expected false candidates
    * are n^2/2 * 32/256 ~ n^2/16 — 25M pairs at sf1, x136 wall-clock).
    * At 16 bits a random collision costs 2^-16 per band; 96 bands keep the
    * true-pair miss at the 0.95 threshold BELOW the old bound
    * ((1 - 0.899^16)^96 ~= 4e-9 vs 2e-8), so the oracle pairing stands,
    * while false-candidate volume drops ~85x and the bucket keyspace grows
    * to 96 * 65536 ~= 6.3M shuffle keys.
    */
  val Bands = 96
  val Bits = 16
  /** Band WIDTH ceiling — width must grow with corpus size (bits ≳ log₂ n,
    * the round-6 sf1 ramp lesson): random pairs collide per band at 2^-bits,
    * so a fixed width goes quadratic once n outgrows 2^bits. Callers pick
    * `numBits` per corpus (dedup_embedding: ceil(log₂ n) + 4, clamped to
    * [Bits, MaxBits]); 24 bits covers ~10^6-row corpora per partition-free
    * band math while the true-pair miss at the 0.95 threshold stays
    * ≤ (1 − 0.899²⁴)^96 ≈ 4e-4 — and at that width a miss requires the
    * pair to disagree on ≥1 of 24 planes in EVERY one of 96 bands.
    */
  val MaxBits = 24
  val MaxDim = 256

  /** JVM-static ±1 hyperplane matrix, identical on every executor
    * (row stride MaxBits — a band's first `numBits` rows are its planes,
    * so narrower widths use a prefix of the same geometry). */
  lazy val planes: Array[Array[Double]] =
    Array.tabulate(Bands * MaxBits)(p => Array.tabulate(MaxDim)(d =>
      if ((MinHashSignature.splitmix64(
        p.toLong * 0x9E3779B97F4A7C15L + d) & 1L) == 1L) 1.0 else -1.0))

  /** Interpreted-path twin of the generated loop (also the spec reference).
    * `numBands` computes a prefix of the band array only — consumers that
    * need a single coarse bucket (SimOps.lshBucket) skip 95/96ths of the
    * projection work; the prefix is bit-identical to the full array's.
    */
  def compute(v: ArrayData, numBands: Int = Bands, numBits: Int = Bits): Array[Long] = {
    val n = v.numElements()
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var bits = 0L
      var i = 0
      while (i < numBits) {
        val row = planes(b * MaxBits + i)
        var s = 0.0
        var d = 0
        while (d < n) {
          if (!v.isNullAt(d)) s += v.getDouble(d) * row(d & (MaxDim - 1))
          d += 1
        }
        if (s >= 0.0) bits |= 1L << i
        i += 1
      }
      out(b) = bits
      b += 1
    }
    out
  }
}
