package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.IntervalJoin

/** The custom physical interval×point join (LogicalPlan + Strategy +
  * SparkPlan): parity with the binned path on seeded random data,
  * half-open boundary semantics, and the plan actually using the
  * custom exec (no Generate/bin-explode, no nested loop).
  */
class IndexedIntervalJoinSpec extends SparkSuite {

  private def randData = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val ivals = (1 to 400).map { i =>
      val k = s"k${rnd.nextInt(7)}"; val s = rnd.nextInt(10000).toLong
      (k, i.toLong, s, s + 1 + rnd.nextInt(400))
    }.toDF("key", "ival_id", "s", "e")
    val pts = (1 to 500).map { i =>
      (s"k${rnd.nextInt(7)}", 1000L + i, rnd.nextInt(10000).toLong)
    }.toDF("key", "p_id", "p")
    (ivals, pts)
  }

  test("matches the binned point join on seeded random data") {
    import spark.implicits._
    val (ivals, pts) = randData
    val viaIndex = IntervalJoin.shuffledIndexJoin(ivals, pts, "key", "s", "e", "p")
      .select("ival_id", "p_id").as[(Long, Long)].collect().toSet
    val viaBins = IntervalJoin.binnedPoints(ivals, pts, Seq("key"), "s", "e", "p", 128L)
      .select("ival_id", "p_id").as[(Long, Long)].collect().toSet
    assert(viaIndex === viaBins)
    assert(viaIndex.nonEmpty)
  }

  test("interval×interval form matches the binned join") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val a = (1 to 300).map { i =>
      val k = s"k${rnd.nextInt(5)}"; val s = rnd.nextInt(8000).toLong
      (k, i.toLong, s, s + 1 + rnd.nextInt(300))
    }.toDF("key", "a_id", "a_s", "a_e")
    val b = (1 to 300).map { i =>
      val k = s"k${rnd.nextInt(5)}"; val s = rnd.nextInt(8000).toLong
      (k, i.toLong, s, s + 1 + rnd.nextInt(300))
    }.toDF("key", "b_id", "b_s", "b_e")
    val viaIndex = IntervalJoin.shuffledIndexIntervalJoin(
        a, b, "key", "a_s", "a_e", "b_s", "b_e")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val viaBins = IntervalJoin.binned(a, b, Seq("key"),
        "a_s", "a_e", "b_s", "b_e", 128L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(viaIndex === viaBins)
    assert(viaIndex.nonEmpty)
  }

  test("half-open boundaries: start inclusive, end exclusive") {
    import spark.implicits._
    val ivals = Seq(("k", 1L, 10L, 20L)).toDF("key", "ival_id", "s", "e")
    val pts = Seq(("k", 1L, 9L), ("k", 2L, 10L), ("k", 3L, 19L), ("k", 4L, 20L))
      .toDF("key", "p_id", "p")
    val got = IntervalJoin.shuffledIndexJoin(ivals, pts, "key", "s", "e", "p")
      .select("p_id").as[Long].collect().toSet
    assert(got === Set(2L, 3L))
  }

  test("plan uses IndexedIntervalJoinExec with no Generate or nested loop") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val (ivals, pts) = randData
    val df = IntervalJoin.shuffledIndexJoin(ivals, pts, "key", "s", "e", "p")
    df.collect() // finalize the adaptive plan
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case q: QueryStageExec => p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[IndexedIntervalJoinExec]) === 1,
      nodes.map(_.nodeName).mkString(", "))
    val names = nodes.map(_.nodeName).mkString(", ")
    assert(!names.contains("Generate"), "bin-explode leaked into the plan")
    assert(!names.contains("NestedLoop"), "nested loop join leaked into the plan")
  }

  test("exec exposes SQLMetrics and guards oversized builds") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val (ivals, pts) = randData
    val df = IntervalJoin.shuffledIndexJoin(ivals, pts, "key", "s", "e", "p")
    df.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case q: QueryStageExec => p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val exec = allNodes(df.queryExecution.executedPlan)
      .collectFirst { case e: IndexedIntervalJoinExec => e }.get
    assert(exec.metrics("numOutputRows").value > 0)
    assert(exec.metrics("buildRows").value === 400)
    assert(exec.metrics("buildKeys").value === 7)
    // the row guard turns a would-be executor OOM into a clear error
    spark.conf.set("spark.graft.indexedJoin.maxBuildRows", "10")
    try {
      val ex = intercept[Exception] {
        IntervalJoin.shuffledIndexJoin(ivals, pts, "key", "s", "e", "p").collect()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("exceeded"), msgs)
    } finally spark.conf.unset("spark.graft.indexedJoin.maxBuildRows")
  }

  test("AlignmentStore.slice auto-selects indexed vs binned by key stats") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val blocks = (1 to 300).map { i =>
      val s = rnd.nextInt(5000).toLong
      (s"u${rnd.nextInt(20)}", s, s + 1 + rnd.nextInt(200),
        s"d${i % 7}", s + 10, s + 11 + rnd.nextInt(200), 1, i.toLong)
    }.toDF("src_id", "src_start", "src_end",
      "dest_id", "dest_start", "dest_end", "dest_ori", "block_id")
    val queries = (1 to 50).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, s"u${rnd.nextInt(20)}", s, s + 300)
    }.toDF("q_id", "src_id", "q_start", "q_end")
    val store = new graft.align.AlignmentStore(blocks)

    def planNames(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect()
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
        case q: QueryStageExec => p +: allNodes(q.plan)
        case _ => p +: p.children.flatMap(allNodes)
      }
      allNodes(df.queryExecution.executedPlan).map(_.nodeName)
    }

    // ~15 rows/key << default cap → auto picks the custom operator
    val auto = store.slice(queries, binWidth = 128L)
    assert(planNames(auto).exists(_.contains("IndexedIntervalJoin")),
      "auto should route small per-key builds through the indexed exec")
    // force the cap below avg rows/key → auto falls back to binned
    val binned = store.slice(queries, binWidth = 128L, maxIndexedKeyRows = 1L)
    val bn = planNames(binned)
    assert(!bn.exists(_.contains("IndexedIntervalJoin")),
      "hot-key shape must fall back to the binned join")
    assert(bn.exists(_.contains("Generate")), "binned path explodes bins via Generate")
    // both paths agree on the answer
    val key = Seq("q_id", "block_id", "src_start", "src_end", "dest_start", "dest_end")
    assert(auto.select(key.head, key.tail: _*).as[(Long, Long, Long, Long, Long, Long)].collect().toSet ===
      binned.select(key.head, key.tail: _*).as[(Long, Long, Long, Long, Long, Long)].collect().toSet)
  }
}
