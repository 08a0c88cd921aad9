package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: plan a naturally-written range join scalably.
  *
  * A user writing the obvious thing —
  * {{{ points.join(intervals, $"p" >= $"s" && $"p" < $"e") }}}
  * — gives Catalyst no equi-join key, so the planner falls back to
  * BroadcastNestedLoopJoin: broadcast-only, O(|points|·|intervals|)
  * compares, and a driver OOM once neither side fits in a broadcast.
  * [[graft.ops.Ranges.pointInInterval]] is the scalable shape, but the
  * caller has to know it exists and restructure the query by hand.
  *
  * This rule closes that gap AT THE LOGICAL LEVEL: when a join's only
  * cross-side predicates are one lower and one upper bound on the same
  * integral point expression, it injects the bucketize-explode-equi
  * shape (`Ranges`' plan, built from standard operators — Project,
  * Generate(Explode(Sequence)), equi Join, Filter), and keeps the
  * ORIGINAL predicates as the exact containment filter, so open/closed
  * boundary semantics are preserved verbatim. Catalyst then plans a
  * hash/sort-merge join on the bucket key with shuffle, AQE and
  * skew-split all applying as usual — the nested-loop fallback and its
  * broadcast ceiling are gone.
  *
  * Enable by setting `spark.graft.rangeJoin.bucketWidth` to a positive
  * bucket width in the point domain's units (0 = off, the default: the
  * width is a data-dependent knob — see Ranges' scaladoc — so the rule
  * never guesses silently). Registered by
  * [[graft.functions.GraftExtensions]]; see RangeJoinRewriteSpec.
  *
  * Conservative by construction:
  *  - inner joins only, and only when NO cross-side equality key
  *    exists (if one does, the equi-join planner already has a
  *    shuffle key and the join is not nested-loop-bound);
  *  - the exploded bucket range uses the interval's raw [s div w,
  *    e div w] span — at most one bucket wider than the half-open
  *    optimum, and valid for every boundary-openness combination
  *    because the original predicates re-filter exactly;
  *  - inverted intervals (e < s) explode into Sequence's descending
  *    range — rows the exact filter then drops; correctness is
  *    unaffected (Ranges drops them early as an optimization, which
  *    a logical rewrite of a general predicate cannot assume).
  */
case class RangeJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (point, lower, upper) with point drawn wholly from one child and
    * both bounds wholly from the other — or None. */
  private def rangeStructure(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def side(e: Expression): Option[Boolean] = { // true = left
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // no cross-side equality: Catalyst already has a shuffle key then
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (side(a), side(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case _ => false
    }
    if (hasEqui) return None
    // normalize every cross-side comparison to point-on-one-side form:
    // lower = (point, bound) from `point >/>= bound`; upper from `</<=`
    var lowers = List.empty[(Expression, Expression)]
    var uppers = List.empty[(Expression, Expression)]
    conjuncts.foreach { c =>
      val pair = c match {
        case GreaterThanOrEqual(a, b) => Some((a, b, true))
        case GreaterThan(a, b)        => Some((a, b, true))
        case LessThanOrEqual(a, b)    => Some((a, b, false))
        case LessThan(a, b)           => Some((a, b, false))
        case _                        => None
      }
      pair.foreach { case (a, b, aboveB) =>
        (side(a), side(b)) match {
          case (Some(x), Some(y)) if x != y =>
            if (aboveB) { lowers ::= (a, b); uppers ::= (b, a) }
            else        { uppers ::= (a, b); lowers ::= (b, a) }
          case _ => ()
        }
      }
    }
    // a point expr bounded below and above by the OTHER side, all integral
    val hits = for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2)
      if side(lo) == side(hi) && side(p1) != side(lo)
      if integral(p1) && integral(lo) && integral(hi)
    } yield (p1, lo, hi)
    hits.headOption
  }

  private def bucketOf(e: Expression, w: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = session.conf.get(WidthKey, "0")
    val w = raw.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"$WidthKey must be a long (0 disables the rewrite), got '$raw'"))
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && rangeStructure(cond, left, right).isDefined =>
        val (point, lo, hi) = rangeStructure(cond, left, right).get
        val pointOnLeft = point.references.subsetOf(left.outputSet)
        val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)
        // point side: one bucket column
        val pb = Alias(bucketOf(point, w), "_graft_pb")()
        val pProj = Project(pSide.output :+ pb, pSide)
        // interval side: explode the touched-bucket range
        val ibAttr = AttributeReference("_graft_ib", LongType, nullable = true)()
        // Sequence is TimeZoneAwareExpression: without an explicit zone
        // it stays unresolved and the optimizer rejects the plan
        val seq = new Sequence(bucketOf(lo, w), bucketOf(hi, w))
          .withTimeZone(session.sessionState.conf.sessionLocalTimeZone)
        val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(ibAttr), child = iSide)
        val (newLeft, newRight) =
          if (pointOnLeft) (pProj, gen) else (gen, pProj)
        val newCond = And(EqualTo(pb.toAttribute, ibAttr), cond)
        Project(left.output ++ right.output,
          Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
