package graft.operators

import graft.SparkSuite

class IntervalIndexSpec extends SparkSuite {

  test("index query matches brute force on random nested intervals") {
    val rnd = new scala.util.Random(13)
    val ivals = (0 until 400).map { i =>
      val s = rnd.nextInt(5000).toLong
      (s, s + 1 + rnd.nextInt(800), i) // heavy nesting/overlap
    }
    val idx = IntervalIndex.build(ivals)
    (0 until 200).foreach { _ =>
      val qs = rnd.nextInt(6000).toLong
      val qe = qs + 1 + rnd.nextInt(300)
      val expected = ivals.filter(t => t._1 < qe && qs < t._2).map(_._3).toSet
      assert(idx.query(qs, qe).toSet === expected, s"query [$qs,$qe)")
    }
    assert(idx.query(10, 10).isEmpty) // empty query window
  }

  test("broadcastIndexJoin equals binnedPoints on keyed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val ivals = (0 until 300).map { i =>
      val s = rnd.nextInt(3000).toLong
      (s"k${rnd.nextInt(4)}", s, s + 1 + rnd.nextInt(200), i.toLong)
    }.toDF("key", "s", "e", "ival_id")
    val pts = (0 until 500).map { i =>
      (s"k${rnd.nextInt(5)}", i.toLong, rnd.nextInt(3500).toLong)
    }.toDF("key", "p_id", "p")

    val viaIndex = IntervalJoin.broadcastIndexJoin(ivals, pts,
        "key", "s", "e", "ival_id", "p")
      .select("p_id", "ival_id").as[(Long, Long)].collect().toSet
    val viaBins = IntervalJoin.binnedPoints(ivals, pts, Seq("key"), "s", "e", "p", 64)
      .select("p_id", "ival_id").as[(Long, Long)].collect().toSet
    assert(viaIndex === viaBins)
    assert(viaIndex.nonEmpty)
  }
}
