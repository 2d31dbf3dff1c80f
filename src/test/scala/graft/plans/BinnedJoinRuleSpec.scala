package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.IntervalJoin

class BinnedJoinRuleSpec extends SparkSuite {

  test("naive range-overlap join is rewritten to a binned equi-join") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedIntervalJoinRule
    spark.conf.set("spark.graft.intervalJoin.binWidth", "128")

    val rnd = new scala.util.Random(11)
    val a = (1 to 200).map { i =>
      val s = rnd.nextInt(5000).toLong; (i.toLong, s, s + 1 + rnd.nextInt(300))
    }.toDF("a_id", "a_start", "a_end")
    val b = (1 to 200).map { i =>
      val s = rnd.nextInt(5000).toLong; (i.toLong, s, s + 1 + rnd.nextInt(300))
    }.toDF("b_id", "b_start", "b_end")

    // pure range condition — without the rule this is a nested-loop join
    val joined = a.join(b,
      a("a_start") < b("b_end") && b("b_start") < a("a_end"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("Generate explode"), s"no bin explode in:\n$plan")

    // results identical to the hand-built binned join (and thus to the
    // naive join semantics)
    val expected = IntervalJoin.binned(a, b, Seq.empty,
      "a_start", "a_end", "b_start", "b_end", 64)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val got = joined.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BinnedIntervalJoinRule)
  }
}
