package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** First-class BANDED RANGE JOIN as a Catalyst logical operator — the
  * point-in-interval sibling of [[AsOfJoin]] (SURVEY.md §7.3).
  *
  * A naive point-in-interval join (`p.ts BETWEEN i.lo AND i.hi`, no equality
  * key) has no equi-join key and Spark plans it as a broadcast
  * nested-loop join — quadratic work and a broadcast of the whole interval
  * side. The engine's `join_interval_bucketed` key hand-builds the standard
  * fix (band the time axis; explode each interval into the bands it covers;
  * equi-join point-band = interval-band; re-check the exact range): this
  * node lifts that composition to the PLAN layer so the linear shape is
  * owned by the rewrite rule — a user (or the `range_join(...)` SQL TVF)
  * declares the range join and can no longer accidentally get the
  * nested-loop plan. Same discipline as `AsOfJoin`: the scale contract
  * (equality shuffle on a well-spread band key, candidate volume bounded by
  * interval-length/band, no NLJ) lives in ONE place.
  *
  * Semantics: INNER point-in-interval join. Every (probe, interval) pair
  * with `lo <= ts <= hi` (both bounds inclusive) appears EXACTLY once —
  * the probe point falls in exactly one band, so banding introduces no
  * duplicates by construction. An optional equality key restricts pairs to
  * matching key values (per-entity intervals). Degenerate intervals
  * (`lo > hi`) match nothing and are dropped before banding (they would
  * otherwise make `sequence()` raise on an empty descending range).
  *
  * Tuning: `bandMicros` is the time-axis granularity. Cost per interval is
  * `O(length / band)` exploded rows; cost per band is the number of
  * intervals covering it. Pick the band near the TYPICAL interval length —
  * results are identical for any band width (spec-pinned), only the
  * explode/collision balance moves.
  *
  * Guard rail (ADVICE r6 #3): a single pathological interval (a sentinel
  * far-future `hi`) would make `sequence()` blow past Spark's array limit
  * and fail the query with an opaque error deep in the explode. Interval
  * lengths are data, so the bound can't be checked at analysis; instead the
  * expansion plants a per-interval assertion that raises a NAMED error
  * (`MaxBandsPerInterval` = 2²⁰ bands ≈ 32 MB of exploded rows for one
  * interval — already far beyond any sane length/band ratio) telling the
  * user to widen `bandMicros` or clip sentinel intervals.
  */
final case class BandedRangeJoin(
    left: LogicalPlan,            // probe side (points)
    right: LogicalPlan,           // interval side
    leftTsCol: String,
    loCol: String,
    hiCol: String,
    bandMicros: Long,
    keyCol: Option[String],
    carriedOut: Seq[Attribute])   // pre-minted output attrs for the interval payload
  extends BinaryNode {

  require(bandMicros > 0, s"range join: bandMicros must be positive, got $bandMicros")

  override def output: Seq[Attribute] =
    if (childrenResolved) left.output ++ carriedOut else Nil

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandedRangeJoin =
    copy(left = newLeft, right = newRight)
}

object BandedRangeJoin {

  /** Max `(hi-lo)/bandMicros` bands one interval may explode into before the
    * query raises a named error instead of dying inside `sequence()`. 2²⁰
    * bands per interval is already a pathological length/band ratio (the
    * design point is O(1)-O(100) bands per interval).
    */
  val MaxBandsPerInterval: Int = 1 << 20

  /** Factory: validates the column contract against ANALYZED children and
    * mints the carried-output attributes once (the [[AsOfJoin.build]]
    * discipline — plan copies never re-mint exprIds mid-analysis).
    */
  def build(left: LogicalPlan, right: LogicalPlan, leftTsCol: String,
            loCol: String, hiCol: String, bandMicros: Long,
            keyCol: Option[String]): BandedRangeJoin = {
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"range join: column '$n' not found on the $side side " +
            s"(${p.output.map(_.name).mkString(", ")})"))
    val lts = attr(left, leftTsCol, "probe")
    val lo = attr(right, loCol, "interval")
    val hi = attr(right, hiCol, "interval")
    require(lts.dataType == TimestampType && lo.dataType == TimestampType &&
      hi.dataType == TimestampType,
      s"range join: ts/lo/hi columns must be TimestampType (cast first): " +
        s"$leftTsCol=${lts.dataType}, $loCol=${lo.dataType}, $hiCol=${hi.dataType}")
    require(bandMicros > 0, s"range join: bandMicros must be positive, got $bandMicros")
    keyCol.foreach { k =>
      // payload excludes the key by NAME (it is carried once, from the probe
      // side) — a key that doubles as an interval bound would silently drop
      // the bound from the output; reject the aliasing before any other
      // key check (it needs no resolution, so it can always fire first).
      require(k != loCol && k != hiCol,
        s"range join: keyCol '$k' cannot also be an interval bound column — " +
          "project it under a second name first")
      val lk = attr(left, k, "probe"); val rk = attr(right, k, "interval")
      require(lk.dataType == rk.dataType,
        s"range join: key type mismatch: ${lk.dataType} vs ${rk.dataType}")
    }
    val payload = right.output.filterNot(a => keyCol.contains(a.name))
    val dup = payload.map(_.name).intersect(left.output.map(_.name))
    require(dup.isEmpty,
      s"range join: interval columns ${dup.mkString(", ")} collide with probe " +
        "columns — rename before joining")
    val carried = payload.map(a => AttributeReference(a.name, a.dataType, a.nullable)())
    BandedRangeJoin(left, right, leftTsCol, loCol, hiCol, bandMicros, keyCol, carried)
  }

  /** Expand to filter-degenerates → explode-bands → equi-join → exact-range
    * re-check — pure catalyst nodes, finishing with a Project that aliases
    * the interval payload onto the node's declared exprIds.
    */
  def expand(n: BandedRangeJoin): LogicalPlan = {
    // self-join safety: if the same analyzed plan sits on both sides their
    // attrs share exprIds, which a Join cannot carry — re-alias the
    // interval side fresh.
    val right0 =
      if (n.left.outputSet.intersect(n.right.outputSet).isEmpty) n.right
      else Project(n.right.output.map(a => Alias(a, a.name)()), n.right)

    val lAttrs = n.left.output
    val lTs = lAttrs.find(_.name == n.leftTsCol).get
    val rLo = right0.output.find(_.name == n.loCol).get
    val rHi = right0.output.find(_.name == n.hiCol).get
    val w = Literal(n.bandMicros)
    // floor(micros / w) via pmod, exact for negative timestamps too
    // (IntegralDivide alone truncates toward zero).
    def band(ts: Expression): Expression = {
      val us = UnixMicros(ts)
      new IntegralDivide(Subtract(us, new Pmod(us, w)), w)
    }

    val nonDegenerate = Filter(LessThanOrEqual(rLo, rHi), right0)
    val bandAttr = AttributeReference("__rj_band", LongType, nullable = false)()
    // per-interval band-count guard (ADVICE r6 #3): raise a named,
    // actionable error BEFORE sequence() materializes an absurd array. The
    // guard is a scalar compare per interval — free next to the explode.
    val loB = band(rLo)
    val hiB = band(rHi)
    val guardMsg = Literal(
      s"range_join: an interval spans more than $MaxBandsPerInterval bands " +
        s"at bandMicros=${n.bandMicros} — widen bandMicros toward the typical " +
        "interval length, or clip open-ended sentinel intervals before joining " +
        "(banding cost is O(length/band) exploded rows per interval)")
    val hiGuarded = If(
      LessThan(Subtract(hiB, loB), Literal(MaxBandsPerInterval.toLong)),
      hiB, Cast(new RaiseError(guardMsg), LongType))
    val intervals = Generate(
      Explode(new Sequence(loB, hiGuarded, Literal(1L))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bandAttr), child = nonDegenerate)

    val pBand = Alias(band(lTs), "__rj_pband")()
    val probe = Project(lAttrs :+ pBand, n.left)
    val bandEq: Expression = EqualTo(pBand.toAttribute, bandAttr)
    val cond = n.keyCol.fold(bandEq) { k =>
      And(bandEq, EqualTo(
        lAttrs.find(_.name == k).get, right0.output.find(_.name == k).get))
    }
    val joined = Join(probe, intervals, Inner, Some(cond), JoinHint.NONE)
    val exact = Filter(And(
      GreaterThanOrEqual(lTs, rLo), LessThanOrEqual(lTs, rHi)), joined)

    val payload = right0.output.filterNot(a => n.keyCol.contains(a.name))
    val finalExprs: Seq[NamedExpression] =
      lAttrs ++ n.carriedOut.zip(payload).map { case (tgt, src) =>
        Alias(src, tgt.name)(exprId = tgt.exprId)
      }
    Project(finalExprs, exact)
  }
}

/** SQL-surface form of the banded range join — what the `range_join(...)`
  * table-valued function parses to. Stays permanently unresolved until
  * [[RangeJoinRewrite]] sees resolved children, runs [[BandedRangeJoin.build]]
  * validation, and expands in one step (the [[UnresolvedAsOfJoin]] pattern).
  */
final case class UnresolvedRangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftTsCol: String,
    loCol: String,
    hiCol: String,
    bandMicros: Long,
    keyCol: Option[String])
  extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedRangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Argument parsing for the `range_join` table-valued function, registered by
  * [[graft.GraftExtensions]]:
  *
  * {{{
  * SELECT * FROM range_join(
  *   'points_table', 'intervals_table',   -- any resolvable table/view names
  *   'ts', 'lo', 'hi',                    -- point column; interval bounds
  *   <band_micros>                        -- integer literal band width
  *   [, 'key'])                           -- optional equality key on both sides
  * }}}
  *
  * All contract violations raise at analysis with the same named errors as
  * the Scala API ([[BandedRangeJoin.build]]).
  */
object RangeJoinTvf {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

  def apply(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6 || args.length == 7,
      "range_join expects 6-7 arguments: points, intervals, ts, lo, hi, " +
        s"band_micros[, key]; got ${args.length}")
    def str(i: Int, what: String): String = args(i) match {
      case Literal(v, StringType) if v != null => v.toString
      case o => throw new IllegalArgumentException(
        s"range_join: $what (argument ${i + 1}) must be a string literal, got $o")
    }
    val band = args(5) match {
      case Literal(v, ByteType | ShortType | IntegerType | LongType) if v != null =>
        v.asInstanceOf[Number].longValue
      case o => throw new IllegalArgumentException(
        s"range_join: band_micros (argument 6) must be an integer literal, got $o")
    }
    val key = if (args.length == 7) Some(str(6, "key")) else None
    def rel(i: Int, what: String): LogicalPlan =
      UnresolvedRelation(str(i, what).split('.').toSeq)
    UnresolvedRangeJoin(rel(0, "points table"), rel(1, "intervals table"),
      str(2, "ts"), str(3, "lo"), str(4, "hi"), band, key)
  }
}

/** Resolution rule: expands every [[BandedRangeJoin]] once its children are
  * resolved, and validates-then-expands the SQL-surface
  * [[UnresolvedRangeJoin]] in one step. Registered by
  * [[graft.GraftExtensions]].
  */
final case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case n: BandedRangeJoin if n.childrenResolved => BandedRangeJoin.expand(n)
    case u: UnresolvedRangeJoin if u.childrenResolved =>
      BandedRangeJoin.expand(BandedRangeJoin.build(u.left, u.right,
        u.leftTsCol, u.loCol, u.hiCol, u.bandMicros, u.keyCol))
  }
}
