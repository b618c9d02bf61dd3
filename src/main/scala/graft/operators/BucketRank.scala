package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Shared machinery for TWO-LEVEL (value-domain-bucketed) rank and quantile
  * plans (guide §2.5 — skew): several declared operators partition a window
  * by a 3–5-value key (l_returnflag, o_orderstatus, event_type, day), so the
  * single-level WindowExec sorts a constant fraction of the corpus on ONE
  * reducer at any scale — the classic skew wall. The two-level form buckets
  * rows by the ordering value, ranks each (group, bucket) slice locally, and
  * converts local ranks to global ones with the lower buckets' row-count
  * offsets (a bucket-level running sum — metadata-sized).
  *
  * Correctness argument, used by every caller and pinned in
  * R11RewriteEquivalenceSpec:
  *  - `bucketOf` is a PURE function of the ordering value and MONOTONE
  *    non-decreasing in it, so (a) equal values never split across buckets
  *    and (b) bucket order refines the value order: every row of bucket k
  *    precedes every row of bucket k+1 in the window's own ordering.
  *  - Therefore global row_number = (rows in lower buckets) + local
  *    row_number, exactly, for any total ordering whose FIRST key is the
  *    bucketed value. Tie-broken orderings (value, unique_id) stay total;
  *    value-only orderings give the same value-at-rank (the sorted multiset
  *    is unique even when row_number among ties is not).
  *
  * Bucket balance only affects load, never results: a degenerate
  * distribution (all values equal) collapses to one bucket, which is the
  * single-level plan again — correct, just unbalanced.
  */
object BucketRank {
  /** Scale-adaptive bucket count: at least the session's parallelism (so the
    * local[n] harness and a real cluster both spread each hot group over all
    * cores), floored at 32 so the 8-core driver bench still demonstrates the
    * two-level shape. NOT a local[32] constant — it keys off the session.
    */
  def nBuckets(s: SparkSession): Int =
    math.max(32, s.sparkContext.defaultParallelism)

  /** Uniform-width bucket id of `v` within the group's [mn, mx] value range
    * (width_bucket — whole-stage-codegen arithmetic, returns 1..nb for
    * in-range values and nb+1 for v == mx). Pure in `v`, monotone, total on
    * the mn == mx degenerate group.
    */
  def bucketOf(v: Column, mn: Column, mx: Column, nb: Int): Column =
    when(mn === mx, lit(1L)).otherwise(width_bucket(v, mn, mx, lit(nb)))

  /** NTile(b) bucket of the row with global row_number `rn` (1-based) in a
    * partition of `n` rows — Spark's own NTile algebra (the first n % b
    * buckets take ⌈n/b⌉ rows, the remaining take ⌊n/b⌋) as codegen column
    * arithmetic, so a two-level plan can serve ntile from (rn, n) without a
    * full-partition window. The divisions are double-exact for n < 2^52.
    * When q = ⌊n/b⌋ = 0 (n < b) the first branch always fires (rn ≤ n = r),
    * so the q-division in the otherwise branch is never taken.
    */
  def ntileOf(rn: Column, n: Column, b: Int): Column = {
    val q = floor(n / lit(b))
    val r = n - q * b
    when(rn <= r * (q + 1), ceil(rn.cast(DoubleType) / (q + 1).cast(DoubleType)))
      .otherwise(r + ceil((rn - r * (q + 1)).cast(DoubleType) / q.cast(DoubleType)))
      .cast(LongType)
  }
}
