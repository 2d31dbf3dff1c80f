package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

import graft.operators.IntervalIndex

/** Logical interval×point index join — the whole-operator custom
  * plan of SURVEY.md §4 preference order (c): a `LogicalPlan` node +
  * `SparkStrategy` + `SparkPlan` for the NCList-class probe that the
  * built-in operators can only approximate (bin-explode multiplies
  * interval rows by their bin span and re-filters; the index probe
  * touches each row once and answers each point in O(log n + k)).
  *
  * Semantics: inner join of `intervals` (key, [start, end)) with a
  * probe side (key, [pStart, pEnd)) on key equality AND range
  * overlap; a point probe is the `[p, p+1)` special case. Output =
  * interval columns ++ probe columns.
  */
case class IndexedIntervalJoin(
    intervals: LogicalPlan, points: LogicalPlan,
    iKey: Expression, iStart: Expression, iEnd: Expression,
    pKey: Expression, pStart: Expression, pEnd: Expression) extends BinaryNode {

  override def left: LogicalPlan = intervals
  override def right: LogicalPlan = points
  override def output: Seq[Attribute] = intervals.output ++ points.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IndexedIntervalJoin =
    copy(intervals = newLeft, points = newRight)
}

/** Plans the logical node into the physical index join. */
object IndexedIntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: IndexedIntervalJoin =>
      IndexedIntervalJoinExec(j.iKey, j.iStart, j.iEnd, j.pKey, j.pStart,
        j.pEnd, planLater(j.intervals), planLater(j.points)) :: Nil
    case _ => Nil
  }
}

/** Physical index join: both children hash-cluster on their key
  * (EnsureRequirements inserts compatible exchanges), then each task
  * builds one `IntervalIndex` per key from its interval rows and
  * probes it with its point rows — per-task memory is the task's
  * interval slice, per-probe cost O(log n + k), and NO row
  * multiplication ever enters a shuffle (the bin-explode path
  * shuffles interval copies per touched bin).
  */
case class IndexedIntervalJoinExec(
    iKey: Expression, iStart: Expression, iEnd: Expression,
    pKey: Expression, pStart: Expression, pEnd: Expression,
    left: SparkPlan, right: SparkPlan) extends SparkPlan {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def children: Seq[SparkPlan] = Seq(left, right)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(iKey)), ClusteredDistribution(Seq(pKey)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "build side rows"),
    "buildKeys" -> SQLMetrics.createMetric(sparkContext, "build side distinct keys"))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): IndexedIntervalJoinExec =
    copy(left = newChildren(0), right = newChildren(1))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val buildRowsMetric = longMetric("buildRows")
    val buildKeysMetric = longMetric("buildKeys")
    // The per-task build side is plain heap with no spill: guard with a
    // clear error instead of letting a skewed task die as an opaque
    // executor OOM. ~50M rows ≈ 2.5 GB of copied rows — past any sane
    // task share; such shapes belong on the binned path.
    val maxBuildRows = conf.getConfString(
      "spark.graft.indexedJoin.maxBuildRows", "50000000").toLong
    val kEval = BindReferences.bindReference(iKey, left.output)
    val sEval = BindReferences.bindReference(iStart, left.output)
    val eEval = BindReferences.bindReference(iEnd, left.output)
    val pkEval = BindReferences.bindReference(pKey, right.output)
    val psEval = BindReferences.bindReference(pStart, right.output)
    val peEval = BindReferences.bindReference(pEnd, right.output)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // build: one index per key over this task's interval slice
      val byKey = mutable.HashMap.empty[Any, mutable.ArrayBuffer[(Long, Long, InternalRow)]]
      var taskBuildRows = 0L
      li.foreach { r0 =>
        val r = r0.copy()
        val k = kEval.eval(r)
        if (k != null) {
          taskBuildRows += 1
          if (taskBuildRows > maxBuildRows)
            throw new IllegalStateException(
              s"IndexedIntervalJoinExec build side exceeded $maxBuildRows rows " +
                "in one task (spark.graft.indexedJoin.maxBuildRows); this key " +
                "distribution is too skewed for the in-heap index — use the " +
                "binned interval join for this shape")
          byKey.getOrElseUpdate(k, mutable.ArrayBuffer.empty)
            .append((sEval.eval(r).asInstanceOf[Long],
                     eEval.eval(r).asInstanceOf[Long], r))
        }
      }
      buildRowsMetric += taskBuildRows
      buildKeysMetric += byKey.size
      val built = byKey.map { case (k, arr) =>
        val idx = IntervalIndex.build(
          arr.iterator.zipWithIndex.map { case ((s, e, _), i) => (s, e, i) }.toSeq)
        k -> ((idx, arr))
      }
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      ri.flatMap { p =>
        val k = pkEval.eval(p)
        built.get(k) match {
          case Some((idx, rows)) =>
            val ps = psEval.eval(p).asInstanceOf[Long]
            val pe = peEval.eval(p).asInstanceOf[Long]
            idx.query(ps, pe).iterator.map { i =>
              numOutputRows += 1
              proj(joined(rows(i)._3, p))
            }
          case _ => Iterator.empty
        }
      }
    }
  }
}
