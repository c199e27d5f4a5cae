package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule (SURVEY §7 tier (c) — the custom-Catalyst escape
  * hatch): rewrite a naturally-written band join
  *
  * {{{ left JOIN right ON  l > x * c1  AND  l < x * c2 }}}
  *
  * into an interval-bucket equi-join: bucket the value domain, explode
  * the right side's interval over the buckets it covers, equi-join on
  * the bucket, re-apply the exact band predicate as a residual filter.
  * Without the rewrite Spark plans a nested loop (broadcast or
  * cartesian) — fatal when neither side broadcasts; with it, the join
  * is ONE hash shuffle on an 8-byte key at any size.
  *
  * Buckets live in LOG space, not linear space. For the scaled-band
  * pattern the interval is multiplicative — `(x*c1, x*c2)` spans a
  * constant RATIO c2/c1 whatever x is — so with `bucket(v) =
  * floor(ln v / lnBase)` every right row covers at most
  * `ln(c2/c1)/lnBase + 1` buckets: a STATIC bound computed from the
  * literal factors, for any data distribution. A fixed linear width (the
  * round-2 form) had no such bound: a large x exploded `Sequence` past
  * MAX_ROUNDED_ARRAY_LENGTH (hard error on queries that used to run as
  * BNLJ), and a narrow value domain collapsed into one hot bucket.
  * `lnBase` is derived from the factors: `ln(c2/c1) /
  * targetBucketsPerRow`, so the span is ≈ the configured target
  * regardless of the factor spread.
  *
  * Sign handling: the rewrite fires only for factors `0 < c1 < c2`.
  * Then rows with `x < 0` have an empty band (x*c1 > x*c2) and rows
  * with `l < 0` can never land in a positive band, so both sides are
  * pre-filtered to positive values — semantics-preserving for an INNER
  * join. The one degenerate match `l = 0 ∧ x = 0` (possible only when
  * BOTH bounds are inclusive) is kept by filtering with `>= 0` and
  * mapping non-positive values to a dedicated sentinel bucket.
  *
  * Session confs:
  *  - `spark.graft.rangeJoin.enabled` (default `true`): opt out of the
  *    rewrite entirely.
  *  - `spark.graft.rangeJoin.targetBucketsPerRow` (default `8`): how
  *    many buckets a right row's interval should span — the
  *    fan-out/skew trade (more buckets = finer candidate pruning, more
  *    duplicate right rows).
  *
  * Everything else about the trigger is deliberately conservative: an
  * INNER join whose entire condition is exactly the two-sided band,
  * with `l` strictly from the left, `x` strictly from the right,
  * numeric types, positive literal factors, and a deterministic
  * condition. Result equality is guaranteed by construction (each left
  * row maps to exactly one bucket, so no duplicates; the residual
  * filter restores exact semantics) and asserted in RangeJoinRuleSpec
  * against the unrewritten join.
  *
  * Activate per session via
  * `spark.experimental.extraOptimizations :+= RangeJoinToBucket()` or
  * through [[graft.GraftExtensions]] (injectOptimizerRule).
  */
case class RangeJoinToBucket() extends Rule[LogicalPlan] {

  private val SentinelBucket = Literal(Long.MinValue)

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean

  private def targetBuckets: Int = {
    val raw = conf.getConfString("spark.graft.rangeJoin.targetBucketsPerRow", "8")
    try math.max(1, raw.toInt) catch { case _: NumberFormatException => 8 }
  }

  /** floor(ln(v) / lnBase) for v > 0; sentinel for v <= 0 (reachable
    * only in the both-inclusive variant, where v = 0 rows survive the
    * positivity filter). The If guard keeps Log away from non-positive
    * input (ANSI-safe: branches evaluate lazily). */
  private def bucketOf(e: Expression, lnBase: Double, keepZero: Boolean): Expression = {
    val v = Cast(e, DoubleType)
    val logBucket =
      Cast(Floor(Divide(Log(v), Literal(lnBase))), LongType)
    if (keepZero) If(LessThanOrEqual(v, Literal(0.0)), SentinelBucket, logBucket)
    else logBucket
  }

  /** Strict or inclusive lower bound: `a > bound` / `a >= bound`;
    * the Boolean is `true` when inclusive. */
  private object LowerBound {
    def unapply(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      case GreaterThan(a, b)        => Some((a, b, false))
      case GreaterThanOrEqual(a, b) => Some((a, b, true))
      case _                        => None
    }
  }

  /** Strict or inclusive upper bound: `a < bound` / `a <= bound`. */
  private object UpperBound {
    def unapply(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      case LessThan(a, b)        => Some((a, b, false))
      case LessThanOrEqual(a, b) => Some((a, b, true))
      case _                     => None
    }
  }

  /** A bound of the supported shape `x * literal` with a finite,
    * strictly positive factor — the scaled-band pattern. */
  private object ScaledBand {
    def unapply(e: Expression): Option[(Expression, Double)] = e match {
      case Multiply(x, Literal(v, _: NumericType), _) =>
        val d = v match {
          case n: java.lang.Number => Some(n.doubleValue())
          case dec: org.apache.spark.sql.types.Decimal => Some(dec.toDouble)
          case _ => None
        }
        d.filter(dd => java.lang.Double.isFinite(dd) && dd > 0).map(x -> _)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond @ And(
            LowerBound(a1, ScaledBand(x1, c1), loInc),
            UpperBound(a2, ScaledBand(x2, c2), hiInc))), hint)
          if a1.semanticEquals(a2) && x1.semanticEquals(x2) &&
            c1 < c2 &&
            a1.dataType.isInstanceOf[NumericType] &&
            x1.dataType.isInstanceOf[NumericType] &&
            a1.references.nonEmpty && a1.references.subsetOf(left.outputSet) &&
            x1.references.nonEmpty && x1.references.subsetOf(right.outputSet) &&
            cond.deterministic =>
        val lnBase = math.log(c2 / c1) / targetBuckets
        // l = 0 can only ever match x = 0, and only when both bounds
        // admit equality; everything non-positive is otherwise dead
        // weight on an inner join and is filtered before bucketing.
        val keepZero = loInc && hiInc
        def positive(e: Expression): Expression = {
          val v = Cast(e, DoubleType)
          if (keepZero) GreaterThanOrEqual(v, Literal(0.0))
          else GreaterThan(v, Literal(0.0))
        }
        val lBucket = Alias(bucketOf(a1, lnBase, keepZero), "__bucket_l")()
        val newLeft = Project(left.output :+ lBucket, Filter(positive(a1), left))
        // right: explode the interval's covered bucket range — by
        // construction ≤ targetBuckets + 1 elements, data-independent.
        // Sequence is TimeZoneAwareExpression: it is unresolved without
        // a timezone even for purely numeric ranges.
        val lo = Multiply(Cast(x1, DoubleType), Literal(c1))
        val hi = Multiply(Cast(x1, DoubleType), Literal(c2))
        val gen = Explode(Sequence(
          bucketOf(lo, lnBase, keepZero), bucketOf(hi, lnBase, keepZero),
          None, Some(conf.sessionLocalTimeZone)))
        val rBucket = AttributeReference("__bucket_r", LongType, nullable = false)()
        val newRight = Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(rBucket),
          Filter(positive(x1), right))
        val bucketJoin =
          Join(newLeft, newRight, Inner, Some(EqualTo(lBucket.toAttribute, rBucket)), hint)
        // residual exact band predicate (strict vs inclusive preserved
        // verbatim), then drop the helper columns
        Project(j.output, Filter(cond, bucketJoin))
    }
  }
}
