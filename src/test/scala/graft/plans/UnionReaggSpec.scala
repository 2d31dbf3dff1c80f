package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Pins the m7 merge plan's exchange count: the re-aggregate over the
  * union of two custkey-partitioned partial aggregates must NOT
  * introduce a shuffle — Spark 4.1 propagates the co-partitioned
  * children's hash partitioning through the Union, so the whole merge
  * costs exactly three exchanges (two child hash shuffles + the final
  * orderBy range exchange). If a planner change ever breaks the
  * propagation this fails, and the m7 comment needs re-verifying.
  */
class UnionReaggSpec extends SparkSuite {

  // recurse THROUGH adaptive wrappers: executedPlan is itself a
  // QueryStageExec whose subtree hides behind `.plan`, so a one-level
  // expansion silently scans nothing
  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
    case q: QueryStageExec        => q +: collectNodes(q.plan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  test("m7 union + re-aggregate plans exactly 3 exchanges (2 hash + 1 range)") {
    val df = graft.SparkEntry.queries("m7_incremental_agg")(
      spark, "/root/testdata/sf0.001")
    df.collect() // finalize adaptive stages
    val ex = collectNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(ex.size === 3,
      s"expected 3 exchanges, found ${ex.size}:\n${df.queryExecution.executedPlan}")
    val kinds = ex.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(kinds.count(_.startsWith("HashPartitioning")) === 2 &&
      kinds.count(_.startsWith("RangePartitioning")) === 1,
      s"unexpected exchange kinds: $kinds")
  }
}
