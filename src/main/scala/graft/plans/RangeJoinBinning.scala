package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite point-in-interval theta joins into binned
  * equi-joins — the whole-plan form of what [[graft.operators.RangeJoin]]
  * does by hand at the DataFrame layer.
  *
  * Spark plans an inner join whose only cross-side predicates are range
  * comparisons (`p >= lo AND p <= hi`) as a BroadcastNestedLoopJoin (or a
  * cartesian product) — O(|points|·|intervals|), the non-starter shape at
  * scale. When `spark.graft.rangeJoin.binWidth` is set to a positive long
  * W, this rule rewrites such joins to the standard binning construction:
  * the point side gains `bin = floor(p / W)`, the interval side EXPLODES
  * to one row per bin in `[floor(lo/W), floor(hi/W)]`, the join becomes a
  * hash equi-join on the bin with the ORIGINAL predicate kept as the
  * residual, and a final Project restores the original output — so
  * results are bit-identical to the nested-loop plan while the work drops
  * to per-bin cross products.
  *
  * Scope guards (each keeps the rewrite semantics-exact):
  *  - inner joins only, with deterministic range expressions;
  *  - fires only when NO cross-side equi predicate exists (if one does,
  *    Spark already hash-joins and the bin adds nothing) — this also
  *    makes the rule idempotent, since the rewritten join carries an
  *    equi conjunct;
  *  - integral point/bound types only (bin arithmetic is exact:
  *    `floor(v/W)` computed as `(v − pmod(v, W)) div W`, correct for
  *    negatives where a truncating DIV is not);
  *  - strict bounds (`<`, `>`) bin like their inclusive forms — bins are
  *    a superset and the residual keeps exactness.
  *
  * Registered by [[graft.GraftExtensions]]; OFF by default (binWidth
  * unset). Width choice is the operator's: ~the typical interval span, so
  * intervals explode to O(1) bins.
  */
object RangeJoinBinning extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Long =
    try SQLConf.get.getConfString(BinWidthKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(v / w), exact on longs including negatives. */
  private def floorBin(v: Expression, w: Long): Expression = {
    val vl = asLong(v)
    IntegralDivide(Subtract(vl, Pmod(vl, Literal(w))), Literal(w))
  }

  /** A conjunct normalized to (point, bound, isLowerBound). */
  private def asBound(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo, true))
      case GreaterThan(p, lo) => Some((p, lo, true))
      case LessThanOrEqual(p, hi) => Some((p, hi, false))
      case LessThan(p, hi) => Some((p, hi, false))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conj = conjuncts(cond)
        def sideOnly(e: Expression, s: LogicalPlan): Boolean =
          e.deterministic && e.references.nonEmpty &&
            e.references.subsetOf(s.outputSet)
        val hasEqui = conj.exists {
          case EqualTo(a, b) =>
            (sideOnly(a, left) && sideOnly(b, right)) ||
              (sideOnly(a, right) && sideOnly(b, left))
          case EqualNullSafe(a, b) =>
            (sideOnly(a, left) && sideOnly(b, right)) ||
              (sideOnly(a, right) && sideOnly(b, left))
          case _ => false
        }
        if (hasEqui) j
        else {
          val bounds = conj.flatMap(asBound)
          // a usable pair: same point expression bounded below AND above,
          // point on one side, both bounds on the other, all integral
          val pair = (for {
            (p1, lo, true) <- bounds
            (p2, hi, false) <- bounds
            if p1.semanticEquals(p2)
            if integral(p1) && integral(lo) && integral(hi)
            pointOnLeft <- {
              if (sideOnly(p1, left) && sideOnly(lo, right) &&
                sideOnly(hi, right)) Seq(true)
              else if (sideOnly(p1, right) && sideOnly(lo, left) &&
                sideOnly(hi, left)) Seq(false)
              else Seq.empty[Boolean]
            }
          } yield (p1, lo, hi, pointOnLeft)).headOption
          pair match {
            case None => j
            case Some((p, lo, hi, pointOnLeft)) =>
              val pAlias = Alias(floorBin(p, w), "__graft_bin_p")()
              val iBinAttr =
                AttributeReference("__graft_bin_i", LongType,
                  nullable = false)()
              // Sequence is TimeZoneAware: without an explicit zone the
              // node is UNRESOLVED post-analysis and plan validation
              // rejects the rewrite (long bounds never consult it).
              // Inverted intervals (hi < lo) are legal no-match rows for
              // the original theta join, but Sequence(loBin, hiBin, 1)
              // THROWS when hiBin < loBin — guard with an empty bin list
              // so they stay no-match instead of crashing the query.
              val loBin = floorBin(lo, w)
              val hiBin = floorBin(hi, w)
              val seq = If(LessThanOrEqual(loBin, hiBin),
                new Sequence(loBin, hiBin, Some(Literal(1L)),
                  Some(SQLConf.get.sessionLocalTimeZone)),
                Literal.create(Array.empty[Long],
                  org.apache.spark.sql.types.ArrayType(LongType,
                    containsNull = false)))
              def binPoint(s: LogicalPlan) =
                Project(s.output :+ pAlias, s)
              def binInterval(s: LogicalPlan) =
                Generate(Explode(seq), unrequiredChildIndex = Nil,
                  outer = false, qualifier = None,
                  generatorOutput = Seq(iBinAttr), child = s)
              val (newLeft, newRight) =
                if (pointOnLeft) (binPoint(left), binInterval(right))
                else (binInterval(left), binPoint(right))
              val newCond = And(EqualTo(pAlias.toAttribute, iBinAttr), cond)
              Project((left.output ++ right.output).toSeq,
                Join(newLeft, newRight, Inner, Some(newCond), hint))
          }
        }
    }
  }
}
