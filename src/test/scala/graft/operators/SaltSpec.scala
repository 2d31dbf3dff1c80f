package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSuite

/** Salted aggregate / salted join: results must be bit-identical to the
  * unsalted forms, and the salted join must actually key on the salt
  * (the whole point is spreading a hot key across reduce tasks).
  */
class SaltSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private val dec = DecimalType(18, 2)

  private def skewed = {
    // hot key "a": 900 of 1000 rows
    val rows = (0 until 1000).map { i =>
      (if (i < 900) "a" else s"k${i % 7}", i.toLong, (i % 50) / 10.0)
    }
    rows.toDF("key", "id", "v")
  }

  test("saltedAgg matches direct groupBy exactly (count + decimal sum)") {
    val df = skewed.select(col("key"), col("id"), col("v").cast(dec).as("v"))
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").cast("double").as("s"))
      .orderBy("key").collect().toSeq
    val salted = Salt.saltedAgg(df, Seq("key"), buckets = 8)(
        count(lit(1)).as("__pn"), sum(col("v")).as("__ps"))(
        sum(col("__pn")).as("n"), sum(col("__ps")).cast("double").as("s"))
      .orderBy("key").collect().toSeq
    assert(salted === direct)
  }

  test("saltedJoin row-identical to plain join; join keys include the salt") {
    val fact = skewed
    val dim = Seq(("a", 10L), ("k0", 1L), ("k1", 2L), ("k3", 3L))
      .toDF("key", "w")
    val plain = fact.join(dim, Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum(col("id") * col("w")).as("ws"))
      .orderBy("key").collect().toSeq
    val saltedDf = Salt.saltedJoin(fact, dim.hint("shuffle_hash"),
      Seq("key"), col("id"), buckets = 8)
    val salted = saltedDf
      .groupBy("key").agg(count(lit(1)).as("n"), sum(col("id") * col("w")).as("ws"))
      .orderBy("key").collect().toSeq
    assert(salted === plain)
    // the executed join must carry __salt in its keys — otherwise the
    // operator silently degenerated into an unsalted join
    saltedDf.collect()
    val exec = saltedDf.queryExecution.executedPlan
    val joins = collectWithSubqueries(exec) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, s"no shuffled join found in:\n$exec")
    val keyed = joins.exists(_.toString.contains("__salt"))
    assert(keyed, s"__salt missing from join keys:\n$exec")
  }

  test("deterministic salt: same input → same salted assignment") {
    val fact = skewed
    val dim = Seq(("a", 1L)).toDF("key", "w")
    val a = Salt.saltedJoin(fact, dim, Seq("key"), col("id"), buckets = 4)
      .select(col("id")).as[Long].collect().sorted.toSeq
    val b = Salt.saltedJoin(fact, dim, Seq("key"), col("id"), buckets = 4)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(a === b)
    assert(a.size === 900)
  }
}
