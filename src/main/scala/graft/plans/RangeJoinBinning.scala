package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure range join (point-within-interval, no
  * equi keys) into a binned equi-join.
  *
  * Open-source Spark plans an inner join whose only condition is
  * `p.x BETWEEN i.lo AND i.hi` as BroadcastNestedLoopJoin (or a cartesian
  * product) — O(|points|·|intervals|) comparisons, and impossible once
  * both sides outgrow a broadcast. This rule rewrites it to the classic
  * binning shape:
  *
  *   points'    = points    + bin  = floor(x  / W)
  *   intervals' = intervals × bins = explode(sequence(floor(lo/W), floor(hi/W)))
  *   join on point.bin = interval.bin  AND  <original condition>
  *
  * Each point falls in exactly one bin and an interval is replicated into
  * every bin it touches, so every qualifying pair meets in exactly one
  * bin: no duplicate elimination is needed, and the original predicate is
  * kept as the join residual so the bin pre-filter can never change
  * semantics — it only prunes the candidate space from |L|·|R| to pairs
  * sharing a bin. The equi-join then hash-partitions both sides by bin:
  * shuffle-parallel at any scale, skew-handled by AQE like every other
  * equi-join in the engine.
  *
  * Correctness of the bin map under floating-point: bins are computed as
  * floor(cast(e as double) / W) on BOTH sides. Cast, IEEE division by a
  * positive constant, and floor are all weakly monotone, so lo <= x <= hi
  * implies bin(lo) <= bin(x) <= bin(hi) — a qualifying point can never
  * miss its interval's bin range even where double rounding shifts a
  * value across a bin boundary (both sides shift identically or
  * adjacently, and the interval covers the whole closed bin range).
  *
  * Scope guards (each bails to the untouched plan):
  *  - inner joins only, condition deterministic, no equi-key conjunct
  *    (if an equi key exists the ordinary hash join is already the right
  *    plan — and the rewritten join's own bin equality makes the rule a
  *    no-op on its output, so the fixed-point optimizer batch terminates);
  *  - point and both bounds are numeric (ints, longs, doubles, decimals;
  *    timestamp joins in this engine go through `unix_micros` longs);
  *  - the point expression references exactly one join side and both
  *    bound expressions the other.
  *
  * Sizing: `spark.graft.rangeJoin.binWidth` (double, default 1024) should
  * be set near the typical interval length — each interval explodes into
  * ~len/W + 1 rows, each point into exactly 1. Any W > 0 is correct (the
  * residual re-checks the real predicate); W only tunes replication
  * volume, so pick it from the known interval-length distribution
  * (session length, price-band width, ...). A pathological interval
  * spanning more than `sequence()`'s max array length fails fast at
  * runtime rather than silently exploding the cluster.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`; disable with
  * `spark.graft.rangeJoin.enabled=false`.
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  private def binWidth: Double =
    conf.getConfString("spark.graft.rangeJoin.binWidth", "1024.0").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || !(binWidth > 0) || !binWidth.isFinite) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && cond.deterministic && !hasEquiKey(cond, left, right) =>
        rewrite(j, cond).getOrElse(j)
    }
  }

  /** True if any conjunct is a binary equality between the two sides —
    * then Spark already plans a hash join and we must not touch it (this
    * is also the fixed-point terminator: our own output joins on bin
    * equality). */
  private def hasEquiKey(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b)       => splitsSides(a, b, left, right)
      case EqualNullSafe(a, b) => splitsSides(a, b, left, right)
      case _                   => false
    }

  private def splitsSides(a: Expression, b: Expression,
                          left: LogicalPlan, right: LogicalPlan): Boolean =
    a.references.nonEmpty && b.references.nonEmpty &&
      ((canEvaluate(a, left) && canEvaluate(b, right)) ||
        (canEvaluate(a, right) && canEvaluate(b, left)))

  /** A one-sided comparison `point (>=|>) bound` or `point (<=|<) bound`,
    * normalized so `lower=true` means bound is a lower bound of point. */
  private final case class RangeBound(point: Expression, bound: Expression, lower: Boolean)

  private def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  private def asBound(conjunct: Expression): Seq[RangeBound] = conjunct match {
    case GreaterThanOrEqual(a, b) => Seq(RangeBound(a, b, lower = true), RangeBound(b, a, lower = false))
    case GreaterThan(a, b)        => Seq(RangeBound(a, b, lower = true), RangeBound(b, a, lower = false))
    case LessThanOrEqual(a, b)    => Seq(RangeBound(a, b, lower = false), RangeBound(b, a, lower = true))
    case LessThan(a, b)           => Seq(RangeBound(a, b, lower = false), RangeBound(b, a, lower = true))
    case _                        => Seq.empty
  }

  /** Side classification: Some(true) = evaluable on left only, Some(false)
    * = right only, None = neither/both/no refs. */
  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else (canEvaluate(e, left), canEvaluate(e, right)) match {
      case (true, false) => Some(true)
      case (false, true) => Some(false)
      case _             => None
    }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val bounds = conjuncts.flatMap(asBound).filter(b =>
      numeric(b.point) && numeric(b.bound))

    // Find (lower, upper) bound pair: same point expression, point on one
    // side, both bounds on the other.
    val candidates = for {
      lo <- bounds if lo.lower
      hi <- bounds if !hi.lower && hi.point.semanticEquals(lo.point)
      pointSide <- sideOf(lo.point, j.left, j.right)
      loSide <- sideOf(lo.bound, j.left, j.right)
      hiSide <- sideOf(hi.bound, j.left, j.right)
      if loSide != pointSide && hiSide != pointSide
    } yield (lo.point, lo.bound, hi.bound, pointSide)

    candidates.headOption.map { case (point, lo, hi, pointOnLeft) =>
      val w = Literal(binWidth, DoubleType)
      def binOf(e: Expression): Expression =
        Cast(Floor(new Divide(Cast(e, DoubleType), w)), LongType)

      val (pointPlan, intervalPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      val pointBin = Alias(binOf(point), "graft_bin_point")()
      val newPointPlan = Project(pointPlan.output :+ pointBin, pointPlan)

      // sequence(binLo, binHi) errors on reversed boundaries, so an empty
      // interval (lo > hi) degrades to a NULL array -> explode drops the
      // row, exactly what the inner join would have done.
      val binLo = binOf(lo)
      val binHi = binOf(hi)
      // Sequence is TimeZoneAwareExpression — it only resolves with a
      // timezone attached (irrelevant for longs, but required).
      val seq = If(LessThanOrEqual(binLo, binHi),
        Sequence(binLo, binHi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(null, ArrayType(LongType, containsNull = false)))
      val gen = Explode(seq)
      val elem = gen.elementSchema.head
      val intervalBin = AttributeReference("graft_bin_interval", elem.dataType, elem.nullable)()
      val newIntervalPlan =
        Generate(gen, unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(intervalBin), child = intervalPlan)

      val (newLeft, newRight) =
        if (pointOnLeft) (newPointPlan, newIntervalPlan) else (newIntervalPlan, newPointPlan)
      val newCond = And(EqualTo(pointBin.toAttribute, intervalBin), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
