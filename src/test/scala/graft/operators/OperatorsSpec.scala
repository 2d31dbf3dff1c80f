package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSuite

class OperatorsSpec extends SparkSuite {

  test("binned interval join matches range join on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val a = (1 to 300).map { i =>
      val k = s"k${rnd.nextInt(5)}"; val s = rnd.nextInt(10000).toLong
      (k, i.toLong, s, s + 1 + rnd.nextInt(500))
    }.toDF("key", "a_id", "a_start", "a_end")
    val b = (1 to 300).map { i =>
      val k = s"k${rnd.nextInt(5)}"; val s = rnd.nextInt(10000).toLong
      (k, i.toLong, s, s + 1 + rnd.nextInt(500))
    }.toDF("key", "b_id", "b_start", "b_end")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val viaRange = pairs(IntervalJoin.rangeJoin(a, b, Seq("key"),
      "a_start", "a_end", "b_start", "b_end"))
    val viaBins = pairs(IntervalJoin.binned(a, b, Seq("key"),
      "a_start", "a_end", "b_start", "b_end", binWidth = 128))
    assert(viaBins === viaRange)
    assert(viaRange.nonEmpty)
    // binned join emits each matching pair exactly once
    val cnt = IntervalJoin.binned(a, b, Seq("key"),
      "a_start", "a_end", "b_start", "b_end", 128).count()
    assert(cnt === viaBins.size)
  }

  test("binned point join: half-open semantics at boundaries") {
    import spark.implicits._
    val ivals = Seq(("k", 1L, 10L, 20L)).toDF("key", "i_id", "s", "e")
    val pts = Seq(("k", 1L, 9L), ("k", 2L, 10L), ("k", 3L, 19L), ("k", 4L, 20L))
      .toDF("key", "p_id", "p")
    val hits = IntervalJoin.binnedPoints(ivals, pts, Seq("key"), "s", "e", "p", 7L)
      .select("p_id").as[Long].collect().toSet
    assert(hits === Set(2L, 3L)) // start inclusive, end exclusive
  }

  test("sessionize merges by gap rule (pygr groupByIntervals semantics)") {
    import spark.implicits._
    // gaps: 5 (merge at maxGap=5), 6 (break), overlap (merge)
    val df = Seq(("a", 0L, 10L), ("a", 15L, 20L), ("a", 26L, 40L), ("a", 30L, 35L),
                 ("b", 0L, 1L))
      .toDF("key", "s", "e")
    val got = Sessionize.merge(df, Seq("key"), "s", "e", 5L)
      .orderBy("key", "session")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("a", 0L, 0L, 20L, 2L),   // [0,10) + [15,20): gap 5 <= maxGap
      ("a", 1L, 26L, 40L, 2L),  // [26,40) absorbs contained [30,35)
      ("b", 0L, 0L, 1L, 1L)))
  }

  test("coverage sweep: depth segments and masking stats") {
    import spark.implicits._
    val df = Seq(("x", 0L, 10L), ("x", 5L, 15L), ("x", 20L, 30L)).toDF("k", "s", "e")
    val segs = Coverage.segments(df, Seq("k"), "s", "e")
      .orderBy("pos")
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(2))) // pos, next, depth
    assert(segs.toSeq === Seq((0L, 5L, 1L), (5L, 10L, 2L), (10L, 15L, 1L),
      (15L, 20L, 0L), (20L, 30L, 1L)))
    val st = Coverage.stats(df, Seq("k"), "s", "e").collect().head
    assert((st.getLong(1), st.getLong(2)) === ((2L, 25L)))
    val st2 = Coverage.stats(df, Seq("k"), "s", "e", minDepth = 2).collect().head
    assert(st2.getLong(2) === 5L) // only [5,10) has depth >= 2
  }

  test("coverage half-open: adjacent intervals do not double-count") {
    import spark.implicits._
    val df = Seq(("x", 0L, 10L), ("x", 10L, 20L)).toDF("k", "s", "e")
    val st = Coverage.stats(df, Seq("k"), "s", "e").collect().head
    assert((st.getLong(1), st.getLong(2)) === ((1L, 20L)))
  }
}
