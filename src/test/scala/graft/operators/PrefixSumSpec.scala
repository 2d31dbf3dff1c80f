package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins PrefixSum.withRunningTotal: value parity with a global
  * cumulative window (the shape it replaces), determinism across
  * re-evaluations of the returned frame, and the LongType guard.
  */
class PrefixSumSpec extends SparkSuite {

  test("running total equals the global-window cumsum") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 500).map(i => (i.toLong, 1L + rnd.nextInt(50)))
      .toDF("id", "wt")
    // deterministic pseudo-random order with a unique tiebreaker
    val keyed = df.withColumn("rk", md5(col("id").cast("string")))

    val got = PrefixSum
      .withRunningTotal(keyed, Seq(col("rk"), col("id")), "wt", "cum",
        numPartitions = 7)
      .select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    val want = keyed
      .withColumn("cum", sum("wt").over(Window.orderBy("rk", "id")))
      .select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(got == want)
  }

  test("re-evaluating the returned frame reproduces identical totals") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, (i % 9) + 1L)).toDF("id", "wt")
    val cum = PrefixSum.withRunningTotal(
      df, Seq(md5(col("id").cast("string")), col("id")), "wt", "cum",
      numPartitions = 5)
    val a = cum.select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = cum.select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
    // grand total = sum of weights
    assert(a.map(_._2).max == (0 until 200).map(i => (i % 9) + 1L).sum)
  }

  test("non-long value column is rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, 2.5)).toDF("id", "wt")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(df, Seq(col("id")), "wt", "cum")
    }
    assert(e.getMessage.contains("LongType"))
  }
}
