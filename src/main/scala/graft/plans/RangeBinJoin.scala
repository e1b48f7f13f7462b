package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite a point-in-interval join into a binned
  * equi-join (the same shape `operators.RangeJoin.pointInInterval`
  * builds by hand — see its scaladoc for the scale argument).
  *
  * Spark plans `p.t BETWEEN i.lo AND i.hi` with no equality conjunct
  * as a BroadcastNestedLoopJoin (or a cartesian product): every point
  * row is tested against every interval row. This rule makes the
  * containment an equi-join the planner can hash/sort-merge: the point
  * maps to one `width`-sized bin, the interval explodes to each bin it
  * touches, the join runs on bin equality, and the original exact
  * bounds stay as residual conjuncts. Inner joins only — an outer
  * interval side would be duplicated per bin.
  *
  * Off by default; enabled per session by setting
  * `spark.graft.rangeJoin.binWidth` to a positive long: bin width in
  * the point column's own units for integral columns, in SECONDS for
  * timestamp columns (binning truncates timestamps to epoch seconds;
  * the residual predicates keep full precision). Pick it near the
  * typical interval length, exactly as with the manual operator.
  *
  * Fires only when the join has NO cross-side equality conjunct: if
  * one exists the join is already hashable and binning would only add
  * fan-out (this also makes the rule idempotent — the rewritten join
  * gains a bin-equality conjunct and is never matched again).
  *
  * Registered by [[GraftExtensions]]; usable standalone via
  * `spark.experimental.extraOptimizations`.
  */
case class RangeBinJoin(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  /** One inequality conjunct read as "point compared to bound". */
  private case class Bound(point: Expression, bound: Expression, lower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a typo'd value ("60s", "") must disable the rewrite, not throw
    // NumberFormatException from the optimizer on EVERY query in the
    // session (this rule runs on every plan)
    val width = scala.util.Try(
      conf.getConfString(WidthKey, "0").toLong).getOrElse(0L)
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def crossSide(a: Expression, b: Expression): Boolean =
          a.deterministic && b.deterministic &&
            a.references.nonEmpty && b.references.nonEmpty &&
            ((a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet)) ||
             (a.references.subsetOf(right.outputSet) &&
              b.references.subsetOf(left.outputSet)))
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) => crossSide(a, b)
          case EqualNullSafe(a, b) => crossSide(a, b)
          case _ => false
        }
        if (hasEqui) j
        else {
          // Read every cross-side inequality both ways: a >= b is a
          // lower bound on point a AND an upper bound on point b.
          val bounds = conjuncts.flatMap {
            case GreaterThanOrEqual(a, b) if crossSide(a, b) =>
              Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
            case GreaterThan(a, b) if crossSide(a, b) =>
              Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
            case LessThanOrEqual(a, b) if crossSide(a, b) =>
              Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
            case LessThan(a, b) if crossSide(a, b) =>
              Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
            case _ => Nil
          }
          val pair = bounds.collectFirst(Function.unlift { lo =>
            if (!lo.lower || !binnable(lo.point.dataType)) None
            else bounds.find(hi => !hi.lower &&
              hi.point.semanticEquals(lo.point) &&
              hi.bound.dataType == lo.bound.dataType).map(hi => (lo, hi))
          })
          pair match {
            case None => j
            case Some((lo, hi)) =>
              rewrite(j, left, right, cond, hint, lo.point, lo.bound,
                hi.bound, width)
          }
        }
    }
  }

  /** Exact long bin: floor(x / w) via pmod so negatives floor, not
    * truncate toward zero. LEGACY eval keeps the arithmetic
    * ANSI-independent (w is a nonzero literal). */
  private def binOf(e: Expression, w: Long): Expression = {
    val x = e.dataType match {
      case LongType => e
      // TIMESTAMP_NTZ has no direct Cast to BIGINT in Spark 4
      // (Cast.canCast rejects it) — route through TimestampType first.
      // The session-tz reinterpretation is monotone non-decreasing, and
      // both join sides shift identically, so bin containment is
      // preserved; the residual predicates keep exact NTZ semantics.
      case TimestampNTZType =>
        Cast(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)),
          LongType, Some(conf.sessionLocalTimeZone))
      // timestamp→long casts to epoch seconds, integrals widen
      case _ => Cast(e, LongType, Some(conf.sessionLocalTimeZone))
    }
    val width = Literal(w)
    IntegralDivide(
      Subtract(x, Pmod(x, width, EvalMode.LEGACY), EvalMode.LEGACY),
      width, EvalMode.LEGACY)
  }

  private def binnable(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      point: Expression, lo: Expression, hi: Expression, w: Long): LogicalPlan = {
    val pointOnLeft = point.references.subsetOf(left.outputSet)
    val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)

    val pBin = Alias(binOf(point, w), "__graft_bin_p")()
    val pProj = Project(pSide.output :+ pBin, pSide)

    // No explicit step: sequence(a, b) tolerates a > b (reversed or
    // empty intervals yield bins the residual predicates reject);
    // sequence(a, b, 1) would throw on them.
    val explode = Explode(Sequence(binOf(lo, w), binOf(hi, w), None,
      Some(conf.sessionLocalTimeZone)))
    val elem = explode.elementSchema.head
    val iBin = AttributeReference("__graft_bin_i", elem.dataType, elem.nullable)()
    val gen = Generate(explode, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(iBin), child = iSide)

    val newCond = And(EqualTo(pBin.toAttribute, iBin), cond)
    val joined =
      if (pointOnLeft) Join(pProj, gen, Inner, Some(newCond), hint)
      else Join(gen, pProj, Inner, Some(newCond), hint)
    Project(j.output, joined)
  }
}
