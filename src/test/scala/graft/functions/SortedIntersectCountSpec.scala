package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SortedIntersectCountSpec extends SparkSuite {

  test("merge kernel equals size(array_intersect) on random sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val a = (0 until rnd.nextInt(40)).map(_ => f"w${rnd.nextInt(60)}%02d").distinct.sorted
      val b = (0 until rnd.nextInt(40)).map(_ => f"w${rnd.nextInt(60)}%02d").distinct.sorted
      (i, a, b)
    }
    val out = rows.toDF("i", "a", "b")
      .select(col("i"),
        SortedIntersectCount.sorted_intersect_count(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getInt(0)}"))
  }

  test("empty, disjoint, identical, and unicode arrays") {
    import spark.implicits._
    val rows = Seq(
      (1, Seq.empty[String], Seq("a")),
      (2, Seq("a", "b"), Seq("c", "d")),
      (3, Seq("a", "b", "c"), Seq("a", "b", "c")),
      (4, Seq("a", "é", "日"), Seq("b", "é", "日"))
    ).toDF("i", "a", "b")
      .select(col("i"), sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
      .select(col("i"),
        SortedIntersectCount.sorted_intersect_count(col("a"), col("b")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows === Map(1 -> 0L, 2 -> 0L, 3 -> 3L, 4 -> 2L))
  }

  test("long kernel equals size(array_intersect) on random sorted long sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(60).toLong).distinct.sorted
      val b = (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(60).toLong).distinct.sorted
      (i, a, b)
    }
    val out = rows.toDF("i", "a", "b")
      .select(col("i"),
        SortedIntersectCount.sorted_intersect_count(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getInt(0)}"))
    // negative values and Long extremes keep the (x < y) branch honest
    val edge = Seq((Seq(Long.MinValue, -7L, 0L, Long.MaxValue),
                    Seq(-7L, Long.MaxValue)))
      .toDF("a", "b")
      .select(SortedIntersectCount.sorted_intersect_count(col("a"), col("b")))
      .collect()(0).getLong(0)
    assert(edge === 2L)
  }

  test("SQL registration works") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d'))")
      .collect()(0).getLong(0)
    assert(r === 2L)
  }
}
