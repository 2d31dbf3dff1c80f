package graft.plans

import graft.SparkSuite
import graft.operators.ZipIndex
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** The single-partition-window ban, asserted on physical plans: the
  * global-sequencing queries (c13 curriculum, t12 zipf rank) must
  * compute total-order positions through ZipIndex's range-shuffled
  * zipWithIndex shape — NEVER through `row_number().over(Window
  * .orderBy(...))`, which funnels the whole input through one task
  * (the "No Partition Defined for Window" scale-killer at 100 TB).
  */
class ZipIndexSpec extends SparkSuite {

  // recurse THROUGH adaptive wrappers: executedPlan is itself a
  // QueryStageExec whose subtree hides behind `.plan`, so a one-level
  // expansion silently scans nothing (the negative-control test below
  // proves this traversal sees global windows)
  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
    case q: QueryStageExec        => q +: collectNodes(q.plan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  /** WindowExec nodes whose partitionSpec is empty = global windows. */
  private def globalWindows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] = {
    df.collect() // finalize adaptive stages so the real plan is visible
    collectNodes(df.queryExecution.executedPlan)
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
  }

  test("withPosition matches a global sort's row order") {
    import spark.implicits._
    // keys chosen so ties exist on v (broken by unique id) and values
    // span partitions unevenly
    val df = (1L to 997L).map(i => (i, (i * 7919L) % 13L)).toDF("id", "v")
    val got = ZipIndex.withPosition(df, Seq(col("v").desc, col("id").asc), "pos",
        numPartitions = 7)
      .orderBy("pos").select("id", "v", "pos").collect()
    val want = (1L to 997L).map(i => (i, (i * 7919L) % 13L))
      .sortBy { case (id, v) => (-v, id) }.zipWithIndex
    assert(got.length === want.length)
    want.foreach { case ((id, v), i) =>
      val r = got(i)
      assert(r.getLong(0) === id && r.getLong(1) === v && r.getLong(2) === i.toLong,
        s"row $i: expected ($id,$v,$i) got $r")
    }
  }

  test("negative control: the traversal DOES see a global window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 50L).toDF("id")
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(globalWindows(df).nonEmpty,
      "traversal failed to find a deliberately global window — the " +
        "no-global-window assertions below would pass vacuously")
  }

  test("withPosition plans with no global (single-partition) window") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 5L)).toDF("id", "v")
    val pos = ZipIndex.withPosition(df, Seq(col("v").asc, col("id").asc), "pos")
    assert(globalWindows(pos).isEmpty,
      s"ZipIndex must not plan a global window:\n${pos.queryExecution.executedPlan}")
  }

  test("c13/t12/t11 queries plan with no global window") {
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("c13_curriculum", "t12_zipf", "t11_bpe_merges")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val gw = globalWindows(df)
      assert(gw.isEmpty,
        s"$name plans ${gw.size} global window(s):\n${df.queryExecution.executedPlan}")
    }
  }
}
