package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: rewrite a naive bounded-interval join into the
  * bucketed equi-join shape AUTOMATICALLY (SURVEY.md §2 row 91 made a
  * planner citizen). A user writing the natural form —
  *
  *   probe.join(windows, probe("t") >= windows("lo")
  *                    && probe("t") <  windows("lo") + SPAN)
  *
  * gets a BroadcastNestedLoopJoin from Spark: probe × windows work,
  * the scale-killer `RangeJoin.bucketed` exists to avoid — but only
  * for callers who know to reach for it. This rule performs the same
  * rewrite inside Catalyst (the planner-side analog of Databricks'
  * range-join bin hint), so the naive formulation and the expert one
  * produce the same scalable plan.
  *
  * Matched shape: an INNER join whose condition conjuncts contain
  * `t >= lo` and `t < lo + K` (either literal-commuted orientation)
  * where `t` references exactly one side, `lo` exactly the other,
  * both are deterministic, and K is a positive literal — either LONG
  * arithmetic (`unix_micros` pre-applied by the user) or TIMESTAMP
  * with a pure-microseconds day-time interval (months/days would be
  * session-TZ-dependent spans, not fixed widths). Joins that already
  * carry a cross-side equality conjunct are left alone: they hash-
  * partition fine without help (and the rewritten join's own
  * `__pb = __wb` conjunct makes the rule self-terminating under the
  * optimizer's fixed point).
  *
  * Rewrite (bucket width = K, mirroring `RangeJoin.bucketed`): probe
  * gains bucket `t div K` (one bucket per row), each window EXPLODES
  * to `sequence(lo div K, (lo+K) div K)` (≤ 2 rows by construction —
  * the explode factor is bounded because the span is the width), the
  * join becomes bucket-equality plus the ORIGINAL predicate as
  * residual. Truncating division is monotone, so `lo ≤ t < lo+K`
  * implies t's bucket lies inside the window's bucket range for
  * negative epochs too; each matching pair meets in exactly one
  * bucket (the probe's), so no dedup. Null endpoints explode to no
  * rows / a null bucket — exactly the naive join's no-match. The
  * result is one hash shuffle on a uniform integer key at any scale.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** t >= lo (modulo orientation), cross-side. */
  private def asLowerBound(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(t, lo) => Some((t, lo))
    case LessThanOrEqual(lo, t)    => Some((t, lo))
    case _                         => None
  }

  /** t < lo + K (modulo orientation and Add commutation): returns
    * (t, lo, spanMicros). LONG form takes a long literal; TIMESTAMP
    * form takes a pure-micros day-time interval via TimeAdd. */
  private def asUpperBound(e: Expression): Option[(Expression, Expression, Long)] = {
    def fromAdd(t: Expression, hi: Expression): Option[(Expression, Expression, Long)] =
      hi match {
        case Add(lo, Literal(k: Long, LongType), _) if t.dataType == LongType =>
          Some((t, lo, k))
        case Add(Literal(k: Long, LongType), lo, _) if t.dataType == LongType =>
          Some((t, lo, k))
        case TimestampAddInterval(lo, Literal(k: Long, DayTimeIntervalType(_, _)), _)
            if t.dataType == TimestampType =>
          Some((t, lo, k))
        case _ => None
      }
    e match {
      case LessThan(t, hi)    => fromAdd(t, hi)
      case GreaterThan(hi, t) => fromAdd(t, hi)
      case _                  => None
    }
  }

  /** The probe/window expression pair is cross-side and deterministic. */
  private def crossSide(t: Expression, lo: Expression,
                        left: LogicalPlan, right: LogicalPlan): Boolean = {
    val tl = t.references.subsetOf(left.outputSet)
    val tr = t.references.subsetOf(right.outputSet)
    val ll = lo.references.subsetOf(left.outputSet)
    val lr = lo.references.subsetOf(right.outputSet)
    t.deterministic && lo.deterministic &&
      t.references.nonEmpty && lo.references.nonEmpty &&
      ((tl && lr) || (tr && ll))
  }

  private def hasCrossEquality(conjuncts: Seq[Expression],
                               left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _                   => false
    }

  /** Microsecond view of a bound endpoint (identity for LONG). */
  private def micros(e: Expression): Expression =
    if (e.dataType == TimestampType) UnixMicros(e) else e

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasCrossEquality(conjuncts, left, right)) j
      else {
        val rewrite = (for {
          geC <- conjuncts; (t, lo) <- asLowerBound(geC).toSeq
          if crossSide(t, lo, left, right)
          ltC <- conjuncts; (t2, lo2, k) <- asUpperBound(ltC).toSeq
          if k > 0 && t2.semanticEquals(t) && lo2.semanticEquals(lo)
        } yield (t, lo, k)).headOption
        rewrite match {
          case None => j
          case Some((t, lo, k)) =>
            val w = Literal(k, LongType)
            val probeIsLeft = t.references.subsetOf(left.outputSet)
            val (probePlan, windowPlan) = if (probeIsLeft) (left, right) else (right, left)
            val pb = Alias(IntegralDivide(micros(t), w), "__pb")()
            val probeProj = Project(probePlan.output :+ pb, probePlan)
            // Sequence is TimeZoneAware (resolution requires a zone id
            // even for integral sequences)
            val buckets = new Sequence(
              IntegralDivide(micros(lo), w),
              IntegralDivide(Add(micros(lo), w), w),
              None, Some(conf.sessionLocalTimeZone))
            val wb = AttributeReference("__wb", LongType, nullable = false)()
            val gen = Generate(Explode(buckets), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(wb),
              child = windowPlan)
            val newCond = (EqualTo(pb.toAttribute, wb) +: conjuncts).reduce(And)
            val (nl, nr) = if (probeIsLeft) (probeProj, gen) else (gen, probeProj)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
        }
      }
  }
}
