package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: make declarative band joins scale-safe engine-wide.
  *
  * A join written naively as
  * {{{ a.join(b, a("k") === b("k") && b("t") - a("t") >= lo && b("t") - a("t") <= hi) }}}
  * plans as an equi-join on `k` with the band as a residual filter —
  * quadratic inside every `k` group, which melts down the moment one
  * key is hot (one user with 10⁶ events → 10¹² merge-buffer pairs).
  * `graft.ops.Joins.joinRange` shows the manual fix: quantize time into
  * width-(hi−lo+1) buckets and equi-join on (k, bucket). This rule
  * performs that rewrite automatically on the logical plan, so ANY
  * band join in ANY query gets the bounded formulation without the
  * author knowing the trick:
  *
  *  - probe side (the `a` in `b.t − a.t ∈ [lo, hi]`) explodes to
  *    buckets `(a.t+lo) div w` and `+1` — an interval of length w spans
  *    at most two w-buckets (holds for truncating division too: div is
  *    monotone and its boundaries are ≥ w apart, so one interval
  *    crosses at most one boundary);
  *  - build side projects bucket `b.t div w`;
  *  - the bucket EQUALITY is appended to the join condition; the
  *    original band conjuncts remain as the exactness residual.
  *
  * The added key is IMPLIED by the band predicate, so the output set is
  * unchanged — a pair can match at most one of the two probe buckets,
  * so no duplicates either; and a NULL operand yields NULL buckets
  * whose rows the (unchanged) band residual drops exactly as before.
  * Guards: INNER join, LongType operands, literal bounds, and an
  * attribute-name marker for idempotence (the rule runs inside a
  * fixed-point batch).
  *
  * Registered by GraftExtensions; BandJoinRuleSpec asserts the rewrite
  * fires, stays idempotent, and changes no results.
  */
object BandJoinRule extends Rule[LogicalPlan] {
  private val marker = "__graft_band_bucket"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  /** (aExpr, bExpr, lo, hi): b − a ∈ [lo, hi] with a, b Long exprs. */
  private case class Band(a: Expression, b: Expression, lo: Long, hi: Long)

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** Find one upper and one matching lower bound among the conjuncts. */
  private def findBand(cs: Seq[Expression]): Option[Band] = {
    val uppers = cs.collect {
      case LessThanOrEqual(Subtract(b, a, _), l) if longLit(l).isDefined =>
        (a, b, longLit(l).get)
      case GreaterThanOrEqual(l, Subtract(b, a, _)) if longLit(l).isDefined =>
        (a, b, longLit(l).get)
      case LessThan(Subtract(b, a, _), l) if longLit(l).isDefined =>
        (a, b, longLit(l).get - 1)
    }
    uppers.flatMap { case (a, b, hi) =>
      if (a.dataType != LongType || b.dataType != LongType) Nil
      else cs.collectFirst {
        case GreaterThanOrEqual(Subtract(b2, a2, _), l)
            if longLit(l).isDefined &&
               a2.semanticEquals(a) && b2.semanticEquals(b) =>
          Band(a, b, longLit(l).get, hi)
        case LessThanOrEqual(a2, b2)
            if a2.semanticEquals(a) && b2.semanticEquals(b) =>
          Band(a, b, 0L, hi)
        case GreaterThanOrEqual(b2, a2)
            if a2.semanticEquals(a) && b2.semanticEquals(b) =>
          Band(a, b, 0L, hi)
        case LessThan(a2, b2)
            if a2.semanticEquals(a) && b2.semanticEquals(b) =>
          Band(a, b, 1L, hi)
      }.toSeq
    }.find(bd => bd.hi >= bd.lo)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(marker)) =>
      val cs = conjuncts(cond)
      findBand(cs) match {
        // only rewrite when an equi key already exists: with no equi key
        // the planner picks BNLJ and the bucket alone couldn't carry the
        // join; that case needs the full two-sided bucket join (manual)
        case Some(band)
            if cs.exists {
              case EqualTo(x, y) =>
                (x.references.subsetOf(left.outputSet) &&
                 y.references.subsetOf(right.outputSet)) ||
                (x.references.subsetOf(right.outputSet) &&
                 y.references.subsetOf(left.outputSet))
              case _ => false
            } =>
          val aOnLeft =
            band.a.references.subsetOf(left.outputSet) &&
            band.b.references.subsetOf(right.outputSet)
          val bOnLeft =
            band.b.references.subsetOf(left.outputSet) &&
            band.a.references.subsetOf(right.outputSet)
          if (!aOnLeft && !bOnLeft) j
          else {
            val w = band.hi - band.lo + 1
            // probe bucket (a side): (a + lo) div w, exploded to {k, k+1}
            val base = IntegralDivide(
              Add(band.a, Literal(band.lo)), Literal(w))
            val probeAttr =
              AttributeReference(marker + "_probe", LongType, nullable = true)()
            val probeGen = Generate(
              Explode(CreateArray(Seq(base, Add(base, Literal(1L))))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(probeAttr),
              child = if (aOnLeft) left else right)
            // build bucket (b side): b div w, projected
            val buildAlias =
              Alias(IntegralDivide(band.b, Literal(w)), marker + "_build")()
            val buildProj = Project(
              (if (aOnLeft) right else left).output :+ buildAlias,
              if (aOnLeft) right else left)
            val newCond = And(cond, EqualTo(probeAttr, buildAlias.toAttribute))
            val newJoin =
              if (aOnLeft) Join(probeGen, buildProj, Inner, Some(newCond), hint)
              else Join(buildProj, probeGen, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          }
        case _ => j
      }
  }
}
