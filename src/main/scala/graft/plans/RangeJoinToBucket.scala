package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Opt-in optimizer rule (SURVEY §7 tier (c) — the custom-Catalyst
  * escape hatch): rewrite a naturally-written band join
  *
  * {{{ left JOIN right ON  l > x * c1  AND  l < x * c2 }}}
  *
  * into the interval-bucket equi-join (the plan `Joins.rangeBucketJoin`
  * builds by hand): bucket the value domain with width `width`, explode
  * the right side's interval over the buckets it covers, equi-join on
  * the bucket, re-apply the exact band predicate as a residual filter.
  * Without the rewrite Spark plans a nested loop (broadcast or
  * cartesian) — fatal when neither side broadcasts; with it, the join
  * is ONE hash shuffle on an 8-byte key at any size.
  *
  * Deliberately conservative: fires only on an INNER join whose entire
  * condition is exactly the two-sided band above, with `l` strictly from
  * the left, `x` strictly from the right, numeric types, literal
  * factors, and a deterministic condition. Everything else passes
  * through untouched. Result equality is guaranteed by construction
  * (each left row maps to exactly one bucket, so no duplicates; the
  * residual filter restores exact semantics) and asserted in
  * RangeJoinRuleSpec against the unrewritten join.
  *
  * Activate per session via
  * `spark.experimental.extraOptimizations :+= RangeJoinToBucket()` or
  * through [[graft.GraftExtensions]] (injectOptimizerRule).
  */
case class RangeJoinToBucket(width: Double = 100.0) extends Rule[LogicalPlan] {

  private def bucketOf(e: Expression): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

  /** Either strict or inclusive lower bound: `a > bound` / `a >= bound`. */
  private object LowerBound {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThan(a, b)        => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case _                        => None
    }
  }

  /** Either strict or inclusive upper bound: `a < bound` / `a <= bound`. */
  private object UpperBound {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(a, b)        => Some((a, b))
      case LessThanOrEqual(a, b) => Some((a, b))
      case _                     => None
    }
  }

  /** A bound of the supported shape `x * literal` (factor of a
    * right-side expression) — the scaled-band pattern. */
  private def scaledBand(e: Expression): Option[Expression] = e match {
    case Multiply(x, Literal(_, _), _) => Some(x)
    case _                             => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond @ And(
          LowerBound(a1, lo), UpperBound(a2, hi))), hint)
        if a1.semanticEquals(a2) &&
          scaledBand(lo).isDefined && scaledBand(hi).isDefined &&
          scaledBand(lo).get.semanticEquals(scaledBand(hi).get) &&
          a1.dataType.isInstanceOf[NumericType] &&
          scaledBand(lo).get.dataType.isInstanceOf[NumericType] &&
          a1.references.nonEmpty && a1.references.subsetOf(left.outputSet) &&
          scaledBand(lo).get.references.nonEmpty &&
          scaledBand(lo).get.references.subsetOf(right.outputSet) &&
          cond.deterministic =>
      // left: one bucket per row
      val lBucket = Alias(bucketOf(a1), "__bucket_l")()
      val newLeft = Project(left.output :+ lBucket, left)
      // right: explode the interval's covered bucket range
      // Sequence is TimeZoneAwareExpression: it is unresolved without a
      // timezone even for purely numeric ranges
      val gen = Explode(Sequence(bucketOf(lo), bucketOf(hi), None,
        Some(conf.sessionLocalTimeZone)))
      val rBucket = AttributeReference("__bucket_r", LongType, nullable = false)()
      val newRight = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(rBucket), right)
      val bucketJoin =
        Join(newLeft, newRight, Inner, Some(EqualTo(lBucket.toAttribute, rBucket)), hint)
      // residual exact band predicate (strict vs inclusive preserved
      // verbatim), then drop the helper columns
      Project(j.output, Filter(cond, bucketJoin))
  }
}
