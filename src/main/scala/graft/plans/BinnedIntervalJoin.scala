package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule for interval-overlap joins — the custom Catalyst
  * work called out in SURVEY.md §4: a pure range-predicate join
  * `a.start < b.end AND b.start < a.end` with no equi-conjunct is
  * planned by Spark as a broadcast-nested-loop/cartesian product,
  * O(|A|·|B|) per task. This rule rewrites the LOGICAL join into the
  * binned form (both sides exploded onto fixed-width coordinate bins,
  * equi-join on the bin, pair deduped by the bin owning
  * `greatest(aStart,bStart)`) — the same shape
  * `graft.operators.IntervalJoin.binned` builds by hand, but applied
  * automatically to any naive overlap join in the plan.
  *
  * Preconditions: long-typed bounds, non-empty intervals [s,e)
  * (e > s — the reference enforces the same invariant,
  * `sequence.py:302-308`). Bin width via
  * `spark.graft.intervalJoin.binWidth` (default 65536).
  *
  * Activate with `spark.experimental.extraOptimizations ++=
  * Seq(BinnedIntervalJoinRule)` or
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
object BinnedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val WIDTH_KEY = "spark.graft.intervalJoin.binWidth"

  private def width: Long =
    try conf.getConfString(WIDTH_KEY, "65536").toLong
    catch { case _: Exception => 65536L }

  /** a_start < b_end with sides on opposite children → (aStart, bEnd). */
  private def sideSplit(lt: LessThan, left: LogicalPlan, right: LogicalPlan):
      Option[(Expression, Expression, Boolean)] = {
    val lRefs = lt.left.references
    val rRefs = lt.right.references
    def from(p: LogicalPlan, s: AttributeSet) = s.nonEmpty && s.subsetOf(p.outputSet)
    if (from(left, lRefs) && from(right, rRefs)) Some((lt.left, lt.right, true))
    else if (from(right, lRefs) && from(left, rRefs)) Some((lt.left, lt.right, false))
    else None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        case _ => false
      }
      val lts = conjuncts.collect { case lt: LessThan => lt }
      val pairs = lts.flatMap(lt => sideSplit(lt, left, right).map(lt -> _))
      // need aStart < bEnd (left-side low vs right-side high) and
      // bStart < aEnd; both bounds long-typed
      val overlap = for {
        (lt1, (ls, re, _)) <- pairs.find(_._2._3 == true).toSeq
        (lt2, (rs, le, _)) <- pairs.find(_._2._3 == false).toSeq
        if Seq(ls, re, rs, le).forall(_.dataType == LongType)
      } yield (lt1, lt2, ls, le, rs, re)

      overlap.headOption match {
        case Some((lt1, lt2, aStart, aEnd, bStart, bEnd)) if !hasEqui =>
          val w = Literal(width, LongType)
          def bin(e: Expression) = Cast(Floor(Divide(Cast(e, org.apache.spark.sql.types.DoubleType),
            Cast(w, org.apache.spark.sql.types.DoubleType))), LongType)
          // Sequence is TimeZoneAware — post-analysis it must carry a tz
          def binsOf(s: Expression, e: Expression) =
            Sequence(bin(s), bin(Subtract(e, Literal(1L))), None,
              Some(conf.sessionLocalTimeZone))
          val lBin = AttributeReference("__lbin", LongType, nullable = false)()
          val rBin = AttributeReference("__rbin", LongType, nullable = false)()
          val lGen = Generate(Explode(binsOf(aStart, aEnd)), Nil,
            outer = false, None, Seq(lBin), left)
          val rGen = Generate(Explode(binsOf(bStart, bEnd)), Nil,
            outer = false, None, Seq(rBin), right)
          val dedup = EqualTo(lBin, bin(Greatest(Seq(aStart, bStart))))
          val newCond = And(And(EqualTo(lBin, rBin), cond), dedup)
          Project(j.output,
            Join(lGen, rGen, Inner, Some(newCond), JoinHint.NONE))
        case _ => j
      }
  }
}

/** Session-extension hook: register via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BinnedIntervalJoinRule)
    e.injectPlannerStrategy(_ => IndexedIntervalJoinStrategy)
  }
}
