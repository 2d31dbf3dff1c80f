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

  test("rule path is multi-resolution: whole-axis spans bounded at 2·levels rows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedIntervalJoinRule
    try {
      spark.conf.set("spark.graft.intervalJoin.binWidth", "16")
      spark.conf.set("spark.graft.intervalJoin.fanout", "16")
      spark.conf.set("spark.graft.intervalJoin.levels", "4")
      val axis = 100000L // coarsest bin = 16·16³ = 65536 < axis
      val rnd = new scala.util.Random(7)
      def fixture(n: Int, ids: String, ss: String, es: String) =
        (1 to n).map { i =>
          val len = rnd.nextInt(3) match {
            case 0 => 1L + rnd.nextInt(40)
            case 1 => 300L + rnd.nextInt(3000)
            case _ => axis / 2 + rnd.nextLong(axis / 2) // containment case
          }
          val s = rnd.nextLong(math.max(1L, axis - len))
          (i.toLong, s, s + len)
        }.toDF(ids, ss, es)
      val a = fixture(120, "a_id", "a_start", "a_end")
      val b = fixture(120, "b_id", "b_start", "b_end")
      val joined = a.join(b,
        a("a_start") < b("b_end") && b("b_start") < a("a_end"))
      val got = joined.select("a_id", "b_id").as[(Long, Long)]
        .collect().toSeq.sorted
      val want = IntervalJoin.binnedMulti(a, b, Seq.empty,
          "a_start", "a_end", "b_start", "b_end",
          binWidth = 64L, fanout = 8, levels = 6)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got === want, s"rule-path result diverged from naive semantics " +
        s"(got ${got.size} pairs, want ${want.size})")
      assert(got.distinct.size === got.size, "rule-path emitted duplicate pairs")
      // explosion bound: the bin Generates must emit ≤ 2·levels rows per
      // interval (+1 slack for spans longer than the coarsest width that
      // straddle 3 coarse bins); single-level 16-wide bins would emit up
      // to axis/16 = 6250 rows per whole-axis span
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case ap: AdaptiveSparkPlanExec => p +: allNodes(ap.executedPlan)
        case q: QueryStageExec => p +: allNodes(q.plan)
        case _ => p +: p.children.flatMap(allNodes)
      }
      val gens = allNodes(joined.queryExecution.executedPlan)
        .collect { case g: GenerateExec => g }
      assert(gens.size === 4, s"expected 2 Generates per side, got ${gens.size}")
      val binRows = gens
        .filter(_.generatorOutput.exists(_.name.endsWith("bin")))
        .map(_.metrics("numOutputRows").value).sum
      assert(binRows <= 2 * (2 * 4 + 1) * 120,
        s"bin explode emitted $binRows rows — not the multi-resolution form")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BinnedIntervalJoinRule)
      spark.conf.unset("spark.graft.intervalJoin.binWidth")
      spark.conf.unset("spark.graft.intervalJoin.fanout")
      spark.conf.unset("spark.graft.intervalJoin.levels")
    }
  }
}
