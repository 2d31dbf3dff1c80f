package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Plan-shape pin for the round-7 d4/d6 rewrite: embedding near-dup
  * candidate generation must be JOIN-FREE — the sign-LSH bucket is a
  * projection over the corpus (n · nPlanes dot products), so the only
  * join in the whole query is the within-bucket pair self-join. The
  * pre-round-7 shape (nearest-centroid IVF assignment) planned an
  * n × √n joinless-condition broadcast join before the pair join —
  * the n^1.5 stage the sf1 audit measured at 16x for 10x data.
  */
class NeardupPlanSpec extends SparkSuite {

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
    case q: QueryStageExec        => q +: collectNodes(q.plan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  private def joins(df: DataFrame): Seq[BaseJoinExec] = {
    df.collect() // finalize AQE so the real stages are visible
    collectNodes(df.queryExecution.executedPlan)
      .collect { case j: BaseJoinExec => j }
  }

  test("d4 plans exactly one join: the within-bucket pair self-join") {
    val df = graft.SparkEntry.queries("d4_embed_neardup")(
      spark, "/root/testdata/sf0.001")
    val js = joins(df)
    assert(js.length === 1,
      s"expected only the pair self-join, got ${js.length}:\n" +
        js.map(_.nodeName).mkString("\n"))
    // and it is an equi-join on the bucket key, not a cartesian/NLJ
    assert(js.head.leftKeys.nonEmpty,
      s"pair join must be an equi-join on the block key: ${js.head}")
  }
}
