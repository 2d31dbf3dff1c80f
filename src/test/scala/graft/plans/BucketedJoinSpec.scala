package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The m5 layout claim, asserted on the physical plan: a sort-merge
  * join of two tables bucketed (and sorted) by the join key plans
  * with ZERO shuffle exchange under the join — the co-located-join
  * property bucketing exists to buy at 100 TB.
  */
class BucketedJoinSpec extends SparkSuite {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/${name}_${spark.sparkContext.applicationId}"

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    expanded +: expanded.children.flatMap(collectNodes)
  }

  test("bucketed-by-key join has no exchange under the sort-merge join") {
    import spark.implicits._
    val left = (1L to 1000L).map(k => (k, s"p${k % 5}")).toDF("k", "attr")
    val right = (1L to 5000L).map(i => (i % 1000L + 1L, i.toDouble)).toDF("k2", "v")
    val lt = "graft_spec_bkt_left"
    val rt = "graft_spec_bkt_right"
    spark.sql(s"DROP TABLE IF EXISTS $lt")
    spark.sql(s"DROP TABLE IF EXISTS $rt")
    left.write.format("parquet").bucketBy(4, "k").sortBy("k")
      .option("path", tmp(lt)).mode("overwrite").saveAsTable(lt)
    right.write.format("parquet").bucketBy(4, "k2").sortBy("k2")
      .option("path", tmp(rt)).mode("overwrite").saveAsTable(rt)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps the tree in query stages; the un-adaptive plan is the
    // same join and simpler to assert on
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table(lt).join(spark.table(rt),
        org.apache.spark.sql.functions.col("k") ===
          org.apache.spark.sql.functions.col("k2"))
      j.collect() // finalize any adaptive plan
      val nodes = collectNodes(j.queryExecution.executedPlan)
      val smj = nodes.collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, s"expected a SortMergeJoin in:\n${j.queryExecution.executedPlan}")
      val shufflesUnderJoin = smj.flatMap(collectNodes)
        .collect { case e: ShuffleExchangeExec => e }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join should not shuffle:\n${j.queryExecution.executedPlan}")
      // and the result is the join result
      assert(j.count() === 5000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
