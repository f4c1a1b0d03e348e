package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.{ArrayType, DateType, LongType, TimestampType}

/** Catalyst optimizer rule: rewrite an INNER join whose only
  * cross-side predicates are a timestamp band
  * (`s <= p AND p <= e`, point on one side, bounds on the other)
  * into the bucketized equi-join of
  * [[graft.operators.RangeJoin.pointInInterval]] — automatically.
  *
  * Spark plans the inequality-only join as a
  * BroadcastNestedLoopJoin: O(|L|·|R|) comparisons and a full
  * broadcast of one side. The rewrite:
  *
  *  - projects `bucket(p)` onto the point side (integer division of
  *    the epoch micros — one extra codegen'd column);
  *  - explodes the bound side into every bucket its `[s, e]` interval
  *    spans (a `Generate` over `sequence(bucket(s), bucket(e))`,
  *    guarded so an inverted interval yields no buckets rather than a
  *    runtime error);
  *  - joins on bucket equality, KEEPING the original band predicate
  *    as the residual — each qualifying pair meets exactly once
  *    because the point has exactly one bucket.
  *
  * The rule fires only when: the join is Inner with both sides
  * resolved; no cross-side equality conjunct exists (if one does, the
  * join is already shuffleable and the band is a fine residual); the
  * matched point/bound expressions are deterministic TimestampType.
  * The added bucket equality makes the rewritten join fail this test,
  * so the rule cannot re-fire on its own output.
  *
  * Bucket width: `spark.graft.rangeJoin.bucketSeconds` (default 300).
  * Register per session via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or ad hoc via
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val bucketSecondsKey = "spark.graft.rangeJoin.bucketSeconds"

  /** (point, bound, pointIsLhs) readings of a single comparison:
    * `a >= b` is "a above lower bound b" AND "b below upper bound a".
    * Strict bounds read the same way — the bucket span arithmetic is
    * identical (`s < p` still implies `bucket(s) <= bucket(p)`) and
    * the ORIGINAL comparison is kept as the join residual, so
    * open/closed semantics are enforced there. `BETWEEN` needs no
    * case of its own: the analyzer desugars it into the >=/<= pair
    * before the optimizer runs (pinned in RangeJoinRuleSpec). */
  private case class Band(point: Expression, bound: Expression, isLower: Boolean)

  private def readings(e: Expression): Seq[Band] = e match {
    case GreaterThanOrEqual(a, b) => Seq(Band(a, b, isLower = true), Band(b, a, isLower = false))
    case LessThanOrEqual(a, b)    => Seq(Band(a, b, isLower = false), Band(b, a, isLower = true))
    case GreaterThan(a, b)        => Seq(Band(a, b, isLower = true), Band(b, a, isLower = false))
    case LessThan(a, b)           => Seq(Band(a, b, isLower = false), Band(b, a, isLower = true))
    case _ => Seq.empty
  }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** Timestamp bands bucket on epoch micros; date bands on epoch
    * days (type coercion has already made both comparison sides the
    * same type, casts included — a cast-wrapped band is just an
    * expression of the coerced type here). */
  private def usableBand(b: Band, left: LogicalPlan, right: LogicalPlan): Boolean =
    (b.point.dataType == TimestampType || b.point.dataType == DateType) &&
      b.bound.dataType == b.point.dataType &&
      b.point.deterministic && b.bound.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !hasCrossSideEquality(cond, left, right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bands = conjuncts.flatMap(readings)
        .filter(usableBand(_, left, right))
        .flatMap { b =>
          (sideOf(b.point, left, right), sideOf(b.bound, left, right)) match {
            case (Some(ps), Some(bs)) if ps != bs => Some((b, ps))
            case _ => None
          }
        }
      // a lower and an upper reading of the SAME point expression,
      // bounds both on the opposite side
      val hit = bands.collectFirst {
        case (lo, pointOnLeft) if lo.isLower &&
            bands.exists { case (up, ps2) =>
              !up.isLower && ps2 == pointOnLeft &&
                up.point.canonicalized == lo.point.canonicalized } =>
          val up = bands.collectFirst {
            case (u, ps2) if !u.isLower && ps2 == pointOnLeft &&
              u.point.canonicalized == lo.point.canonicalized => u
          }.get
          (lo.point, lo.bound, up.bound, pointOnLeft)
      }
      hit match {
        case None => j
        case Some((point, lower, upper, pointOnLeft)) =>
          val bucketSeconds = conf.getConfString(bucketSecondsKey, "300").toLong
          // dates bucket on epoch days (width at least one day)
          val isDate = point.dataType == DateType
          val width = Literal(
            if (isDate) math.max(1L, bucketSeconds / 86400L)
            else bucketSeconds * 1000000L)
          def bucket(e: Expression): Expression =
            if (isDate) IntegralDivide(Cast(UnixDate(e), LongType), width)
            else IntegralDivide(UnixMicros(e), width)

          val (pointSide, boundSide) = if (pointOnLeft) (left, right) else (right, left)
          // point side: one extra projected column
          val pAlias = Alias(bucket(point), "__rj_bucket")()
          val pointProj = Project(pointSide.output :+ pAlias, pointSide)
          // bound side: explode the spanned buckets; inverted
          // intervals produce an empty array (no rows), mirroring the
          // naive join's empty result instead of a sequence() error
          // timeZoneId must be supplied explicitly: ResolveTimeZone
          // has already run by the time an optimizer rule executes
          val seq = If(
            LessThanOrEqual(bucket(lower), bucket(upper)),
            Sequence(bucket(lower), bucket(upper), None,
              Some(conf.sessionLocalTimeZone)),
            Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
          val gen = Explode(seq)
          val genOut = DataTypeUtils.toAttributes(gen.elementSchema)
          val boundGen = Generate(gen, Nil, outer = false, None, genOut, boundSide)
          val bBucket = genOut.head

          val equi = EqualTo(pAlias.toAttribute, bBucket)
          val (newLeft, newRight) =
            if (pointOnLeft) (pointProj, boundGen) else (boundGen, pointProj)
          Project(j.output, Join(newLeft, newRight, Inner, Some(And(equi, cond)), hint))
      }
  }

  private def hasCrossSideEquality(
      cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (sideOf(a, left, right), sideOf(b, left, right)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (sideOf(a, left, right), sideOf(b, left, right)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _ => false
        }
      case _ => false
    }
}

/** Session-extension entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` injects the
  * graft optimizer rules into every session built with it. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    // SQL-callable table functions for the big operators (round-10
    // verdict task 4): graft_dedup_ngrams_hashed / graft_pack_shards /
    // graft_count_sum
    GraftTableFunctions.register(e)
  }
}
