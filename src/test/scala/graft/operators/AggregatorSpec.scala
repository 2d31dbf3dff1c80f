package graft.operators

import graft.SparkSuite

class AggregatorSpec extends SparkSuite {

  test("typed session-merge aggregator matches the window sessionizer") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val data = (1 to 500).map { _ =>
      val k = s"k${rnd.nextInt(4)}"; val s = rnd.nextInt(2000).toLong
      (k, s, s + 1 + rnd.nextInt(40))
    }
    val df = data.toDF("key", "s", "e")

    val viaAgg = df.as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new SessionMergeAggregator(10L).toColumn)
      .collect()
      .flatMap { case (k, ivs) => ivs.map(iv => (k, iv.start, iv.end, iv.n)) }
      .toSet

    val viaWindow = Sessionize.merge(df, Seq("key"), "s", "e", 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"k${i % 3}", (i % 7).toLong)).toDF("key", "v")
    val direct = df.groupBy("key").count().as[(String, Long)].collect().toMap
    val salted = Salt.saltedCount(df, Seq("key"))
      .as[(String, Long)].collect().toMap
    assert(salted === direct)
    val directSum = df.groupBy("key").agg(org.apache.spark.sql.functions.sum("v"))
      .as[(String, Long)].collect().toMap
    val saltedSum = Salt.saltedSum(df, Seq("key"), "v")
      .as[(String, Long)].collect().toMap
    assert(saltedSum === directSum)
  }
}
