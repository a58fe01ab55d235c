package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrites an inequality-only inner range
  * join into the bucketed equi-join form of
  * [[graft.operators.RangeJoin]], automatically.
  *
  * A user who writes the natural thing —
  *
  * {{{ points.join(intervals, $"p" >= $"lo" && $"p" < $"hi") }}}
  *
  * gets a BroadcastNestedLoopJoin from vanilla Spark: O(|points| x
  * |intervals|) compares and a full broadcast of one side, which is a
  * scale killer long before 100 TB. With this rule injected (via
  * [[graft.functions.GraftExtensions]]) and
  * `spark.graft.rangeJoin.bucketWidth` set, the same query plans as:
  *
  *   - intervals: explode to the fixed-width buckets each covers
  *     (`sequence(floor(lo/w), greatest(floor(lo/w), ceil(hi/w)-1))`)
  *   - points: tag with `floor(p/w)`
  *   - hash equi-join on the bucket id, original predicate kept as a
  *     residual filter, final project back to the original output
  *
  * i.e. one shuffle and work proportional to |points| +
  * sum(interval widths)/w — the plan a Spark expert would hand-write.
  * This is the (c) tier of the custom-operator preference order: a
  * `Rule[LogicalPlan]` that rewrites into plans built from existing
  * operators, so Tungsten/AQE/codegen all still apply downstream.
  *
  * Semantics notes:
  *   - fires only on INNER joins whose condition has a lower and an
  *     upper bound on the same point expression and NO cross-side
  *     equality conjunct (equalities make the join hash-plannable
  *     already — and the guard also makes the rewrite a fixpoint,
  *     since the rewritten join contains a bucket equality);
  *   - NULL bounds/points: `sequence` of a NULL bound yields no rows
  *     and the residual filter rejects NULL comparisons — identical
  *     to the original condition's NULL semantics;
  *   - extra non-equality conjuncts ride along in the residual filter;
  *   - opt-in by conf: without a bucket width the rule is inert (a
  *     width near the median interval width is the right setting, and
  *     only the user knows it).
  *
  * Reference behavior context: the reference engine delegates all
  * join planning to its host engine (`datafusion` — e.g.
  * `remote-table/src/transform.rs` never touches joins); this rule is
  * part of the beyond-reference scale surface, like the LSH dedup
  * family.
  */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  import RangeJoinRewrite._

  private def widthConf: Option[Long] =
    Option(conf.getConfString(WidthKey, null))
      .flatMap(s => scala.util.Try(s.toLong).toOption).filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = widthConf match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(cond), _) =>
          rewrite(j, cond, w).getOrElse(j)
      }
  }

  /** One bound conjunct, normalized to point-side vs interval-side. */
  private case class Bound(point: Expression, bound: Expression,
      pointOnLeft: Boolean, inclusive: Boolean)

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
    else None

  private def rewrite(j: Join, cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // any cross-side equality → Spark already plans a hash join; also the
    // fixpoint guard (our own output contains a bucket equality)
    val hasEquality = conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, j.left, j.right); sb <- sideOf(b, j.left, j.right))
          yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) =>
        (for (sa <- sideOf(a, j.left, j.right); sb <- sideOf(b, j.left, j.right))
          yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEquality) return None

    // Classify each conjunct as lower/upper bound candidates. A cross-side
    // comparison reads BOTH ways (`lo <= p` is "p's inclusive lower bound
    // lo" and "lo's inclusive upper bound p"), so emit both and let the
    // pairing step find a lower+upper that agree on the point expression.
    def asBound(c: Expression): Seq[(Bound, Boolean)] = {
      // (bound, isLower) with bound.point on the side holding the point
      def mk(p: Expression, b: Expression, incl: Boolean, isLower: Boolean) =
        (for {
          sp <- sideOf(p, j.left, j.right)
          sb <- sideOf(b, j.left, j.right)
          if sp != sb && numeric(p) && numeric(b)
        } yield (Bound(p, b, sp, incl), isLower)).toSeq
      c match {
        case GreaterThanOrEqual(a, b) => // a >= b
          mk(a, b, incl = true, isLower = true) ++
            mk(b, a, incl = true, isLower = false)
        case GreaterThan(a, b) => // a > b
          mk(a, b, incl = false, isLower = true) ++
            mk(b, a, incl = false, isLower = false)
        case LessThanOrEqual(a, b) => // a <= b
          mk(a, b, incl = true, isLower = false) ++
            mk(b, a, incl = true, isLower = true)
        case LessThan(a, b) => // a < b
          mk(a, b, incl = false, isLower = false) ++
            mk(b, a, incl = false, isLower = true)
        case _ => Nil
      }
    }

    val classified = conjuncts.flatMap(asBound)
    val lowers = classified.collect { case (b, true) => b }
    val uppers = classified.collect { case (b, false) => b }

    // need one lower and one upper on the SAME point expr, same point side
    val pair = (for {
      lo <- lowers; hi <- uppers
      if lo.point.semanticEquals(hi.point) && lo.pointOnLeft == hi.pointOnLeft
    } yield (lo, hi)).headOption

    pair.map { case (lo, hi) =>
      val pointOnLeft = lo.pointOnLeft
      val (pointSide, intervalSide) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // floor(x/w), EXACT for integral inputs: a double-rounded division
      // misplaces buckets beyond 2^53 and silently drops matches, so
      // integral types use (x - pmod(x, w)) div w (pmod >= 0 makes the
      // truncating div a true floor); fractional types use double floor
      def bucket(e: Expression): Expression = e.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          val x = Cast(e, LongType)
          IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))
        case _ =>
          Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))) // LongType
      }

      // lower bound: bucket(lo) covers p >= lo and p > lo alike (overshoot
      // at the boundary is removed by the residual filter)
      val startB = bucket(lo.bound)
      // upper bound: exclusive hi ends at floor((hi-ulp)/w) — for integral
      // hi that is bucket(hi-1), for fractional ceil(hi/w)-1; inclusive hi
      // ends at bucket(hi). greatest() keeps sequence() well-formed when
      // hi <= lo
      val endRaw =
        if (hi.inclusive) bucket(hi.bound)
        else hi.bound.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            bucket(Subtract(Cast(hi.bound, LongType), Literal(1L)))
          case _ =>
            Subtract(Ceil(Divide(Cast(hi.bound, DoubleType),
              Literal(w.toDouble))), Literal(1L))
        }
      val endB = Greatest(Seq(startB, endRaw))

      // Sequence is TimeZoneAwareExpression: a concrete zone id is part of
      // being "resolved", even for a pure-long sequence
      val seqExpr = new Sequence(startB, endB, Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val bucketR = AttributeReference(BucketCol + "_iv", LongType, nullable = false)()
      val exploded = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bucketR),
        child = intervalSide)

      val bucketP = Alias(bucket(lo.point), BucketCol + "_pt")()
      val tagged = Project(pointSide.output :+ bucketP, pointSide)

      val bucketJoin = Join(tagged, exploded, Inner,
        Some(EqualTo(bucketP.toAttribute, bucketR)), JoinHint.NONE)
      // the full original condition is the residual — bucket equality only
      // narrows the candidate set, it never replaces the exact predicate
      val residual = Filter(cond, bucketJoin)
      Project(j.output, residual)
    }
  }
}

object RangeJoinRewrite {
  /** Bucket width (in point units) for the automatic range-join rewrite.
    * Unset/non-positive = rule inert. */
  val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  private val BucketCol = "__graft_bucket"
}
