package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Suite-wide structural audit over EVERY registered query's executed
  * physical plan at sf0.001. Catches scale-killers that correctness
  * gates can't see and per-operator specs only pin for the operator
  * they were written for — the r6→r7 lesson (c13/t12/t11 all carried
  * global windows for three rounds while hash-matching their oracles):
  *
  *  1. No WindowExec with an empty partitionSpec (single-partition
  *     global window — the whole input through one task at 100 TB),
  *     except where the window input is already bounded by a LIMIT:
  *     b1/b3/k1 rank ≤30 TakeOrdered survivors, which is O(k) work
  *     wherever it lands.
  *  2. No CartesianProductExec anywhere. The tiny broadcast crossJoins
  *     (1-row corpus stats against the corpus) plan as
  *     BroadcastNestedLoopJoin over a broadcast side, never a
  *     partitioned cartesian.
  *
  * One execution pass collects both properties; failures name the
  * query and print its plan.
  */
class PlanAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Global windows over inputs bounded by an upstream LIMIT — the
    * rank-the-top-k shape; O(k) rows reach the window regardless of
    * corpus size. Anything else in this set is a bug. */
  private val boundedGlobalWindow = Set(
    "b1_bm25_topk",     // ranks the 10 TakeOrdered survivors
    "b3_hybrid_rrf",    // ranks ≤40 fused rows from two top-20 legs
    "b4_prf_expand",    // ranks the 10 TakeOrdered re-scored survivors
    "b6_bm25f",         // ranks the 10 TakeOrdered field-weighted survivors
    "k1_kmer_spectrum"  // ranks the 30 TakeOrdered k-mers
  )

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
    case q: QueryStageExec        => q +: collectNodes(q.plan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  private def nodesOf(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // finalize AQE so the real stages are visible
    collectNodes(df.queryExecution.executedPlan)
  }

  test("no query plans an unbounded global window or a cartesian product") {
    val offenders = Seq.newBuilder[String]
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, dir)
      val nodes = nodesOf(df)
      val gw = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (gw.nonEmpty && !boundedGlobalWindow.contains(name))
        offenders += s"$name: ${gw.size} global window(s)\n" +
          df.queryExecution.executedPlan.toString
      val cp = nodes.collect { case c: CartesianProductExec => c }
      if (cp.nonEmpty)
        offenders += s"$name: ${cp.size} CartesianProductExec\n" +
          df.queryExecution.executedPlan.toString
    }
    val bad = offenders.result()
    assert(bad.isEmpty, s"${bad.size} plan-audit offender(s):\n" +
      bad.mkString("\n---\n"))
  }

  test("the bounded-global-window allowlist is still needed (no stale entries)") {
    // if an allowlisted query stops planning a global window, drop it
    // from the set so the audit tightens instead of rotting
    for (name <- boundedGlobalWindow.toSeq.sorted) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val gw = nodesOf(df).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(gw.nonEmpty,
        s"$name no longer plans a global window — remove it from the allowlist")
    }
  }
}
