package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule for interval-overlap joins — the custom Catalyst
  * work called out in SURVEY.md §4: a pure range-predicate join
  * `a.start < b.end AND b.start < a.end` with no equi-conjunct is
  * planned by Spark as a broadcast-nested-loop/cartesian product,
  * O(|A|·|B|) per task. This rule rewrites the LOGICAL join into the
  * MULTI-RESOLUTION binned form — the same shape
  * `graft.operators.IntervalJoin.binnedMulti` builds by hand, applied
  * automatically to any naive overlap join in the plan:
  *
  * Levels l = 0..levels-1 carry bin width `binWidth · fanout^l`. Each
  * interval OWNS the smallest level whose width ≥ its length (≤ 2
  * bins there) and re-emits its ≤ 2 covering bins at every COARSER
  * level, so an interval costs at most `2·levels` exploded rows
  * REGARDLESS of length — the containment case pygr's NCList sublist
  * hoist exists for (`intervaldb.c:222-306`): a whole-axis span must
  * not explode into every fine bin (the single-level rewrite this
  * rule previously emitted did exactly that, O(axis/binWidth) rows).
  * Two overlapping intervals always share the bin holding
  * `greatest(aStart, bStart)` at the coarser of their own levels, and
  * the join keeps each pair exactly THERE — equi on (level, bin) plus
  * the ownership filter — so no distinct/shuffle is needed.
  *
  * Preconditions: long-typed bounds, non-empty intervals [s,e)
  * (e > s — the reference enforces the same invariant,
  * `sequence.py:302-308`). Tuning via
  * `spark.graft.intervalJoin.binWidth` (default 65536),
  * `spark.graft.intervalJoin.fanout` (16),
  * `spark.graft.intervalJoin.levels` (4); `levels=1` restores the
  * single-level rewrite.
  *
  * Activate with `spark.experimental.extraOptimizations ++=
  * Seq(BinnedIntervalJoinRule)` or
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
object BinnedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val WIDTH_KEY = "spark.graft.intervalJoin.binWidth"
  private val FANOUT_KEY = "spark.graft.intervalJoin.fanout"
  private val LEVELS_KEY = "spark.graft.intervalJoin.levels"

  private def confLong(key: String, dflt: Long): Long =
    try conf.getConfString(key, dflt.toString).toLong
    catch { case _: Exception => dflt }

  /** widths(l) = binWidth · fanout^l, overflow-clamped. */
  private def widthsNow: Array[Long] = {
    val base = math.max(1L, confLong(WIDTH_KEY, 65536L))
    val fanout = math.max(2L, confLong(FANOUT_KEY, 16L))
    val levels = math.max(1L, confLong(LEVELS_KEY, 4L)).toInt
    val buf = scala.collection.mutable.ArrayBuffer(base)
    while (buf.size < levels && buf.last <= Long.MaxValue / fanout)
      buf += buf.last * fanout
    buf.toArray
  }

  /** floor(e / w) as a long — double division like the DataFrame
    * `floor(col / w)` the explicit operators use (exact below 2^53,
    * i.e. any real coordinate axis). */
  private def divFloor(e: Expression, w: Expression): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Cast(w, DoubleType))), LongType)

  /** Smallest level whose width ≥ the interval's length, capped at the
    * coarsest (levels-1). Null-safe: a null length falls through every
    * branch to the cap, and the null bounds then produce a null bin
    * sequence → zero exploded rows, matching inner-join null drop. */
  private def ownLevel(len: Expression, widths: Array[Long]): Expression =
    widths.indices.init.foldRight(
      Literal((widths.length - 1).toLong): Expression) { (l, acc) =>
      If(LessThanOrEqual(len, Literal(widths(l))), Literal(l.toLong), acc)
    }

  /** The bin width of level `lvl` as a literal decision chain (codegen
    * to a flat conditional; avoids array/element_at nullability). */
  private def widthAt(lvl: Expression, widths: Array[Long]): Expression =
    widths.indices.init.foldRight(Literal(widths.last): Expression) {
      (l, acc) => If(EqualTo(lvl, Literal(l.toLong)), Literal(widths(l)), acc)
    }

  /** Explode `child` onto (level, bin) rows: the interval's own level
    * through the coarsest, with the bins it touches at each level's
    * width (≤ 2 per level ≥ own by construction). */
  private def explodeLevels(child: LogicalPlan, s: Expression, e: Expression,
                            widths: Array[Long], tag: String):
      (LogicalPlan, Attribute, Attribute, Expression) = {
    val tz = Some(conf.sessionLocalTimeZone)
    val own = ownLevel(Subtract(e, s), widths)
    val lvl = AttributeReference(s"__${tag}lvl", LongType, nullable = false)()
    // Sequence is TimeZoneAware — post-analysis it must carry a tz
    val g1 = Generate(
      Explode(Sequence(own, Literal((widths.length - 1).toLong), None, tz)),
      Nil, outer = false, None, Seq(lvl), child)
    val w = widthAt(lvl, widths)
    val bin = AttributeReference(s"__${tag}bin", LongType, nullable = false)()
    val g2 = Generate(
      Explode(Sequence(divFloor(s, w),
        divFloor(Subtract(e, Literal(1L)), w), None, tz)),
      Nil, outer = false, None, Seq(bin), g1)
    (g2, lvl, bin, own)
  }

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
        case Some((_, _, aStart, aEnd, bStart, bEnd)) if !hasEqui =>
          val widths = widthsNow
          val (lp, lLvl, lBin, ownA) =
            explodeLevels(left, aStart, aEnd, widths, "l")
          val (rp, rLvl, rBin, ownB) =
            explodeLevels(right, bStart, bEnd, widths, "r")
          // exactly-once: the coarser of the two own levels, in the bin
          // containing the later start (inside both intervals, so both
          // sides emitted it there)
          val dedup = And(
            EqualTo(lLvl, Greatest(Seq(ownA, ownB))),
            EqualTo(lBin,
              divFloor(Greatest(Seq(aStart, bStart)), widthAt(lLvl, widths))))
          val newCond = And(
            And(And(EqualTo(lLvl, rLvl), EqualTo(lBin, rBin)), cond), dedup)
          Project(j.output,
            Join(lp, rp, Inner, Some(newCond), JoinHint.NONE))
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
