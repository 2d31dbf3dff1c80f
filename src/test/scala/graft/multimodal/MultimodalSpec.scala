package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.PipeJoin

class MultimodalSpec extends SparkSuite {

  private def media = {
    import spark.implicits._
    Seq((1L, "img0000".getBytes), (2L, ("x" * 1000).getBytes))
      .toDF("media_id", "content")
  }

  test("binary metadata + deterministic stub features") {
    import spark.implicits._
    val meta = Multimodal.withMeta(media, "content", "kind")
      .select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(meta === Map(1L -> 7L, 2L -> 1000L))
    val f1 = Multimodal.extractFeatures(media, dims = 8).collect()
    val f2 = Multimodal.extractFeatures(media, dims = 8).collect()
    assert(f1.map(_.getSeq[Float](1)).toSeq === f2.map(_.getSeq[Float](1)).toSeq)
    assert(f1.forall(_.getSeq[Float](1).length === 8))
    // custom decoder plugs in without changing plumbing
    val custom = Multimodal.extractFeatures(media, decode = b => Array(b.length.toFloat))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).head)).toMap
    assert(custom === Map(1L -> 7.0f, 2L -> 1000.0f))
  }

  test("frame sampling emits n windows within bounds") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media, n = 4, frameBytes = 100)
      .as[(Long, Long, Long, Long)].collect()
    assert(frames.count(_._1 == 2L) === 4)
    frames.filter(_._1 == 2L).foreach { case (_, _, off, len) =>
      assert(off >= 0 && off + len <= 1000 && len === 100)
    }
    frames.filter(_._1 == 1L).foreach { case (_, _, off, len) =>
      assert(off === 0 && len === 7)
    }
  }

  test("pipe mechanism roundtrips rows through an external command") {
    import spark.implicits._
    val out = PipeJoin.pipeLines(spark,
        Seq("acgt", "ttaa").toDF("line"), Seq("tr", "a-z", "A-Z"))
      .as[String].collect().toSet
    assert(out === Set("ACGT", "TTAA"))
  }

  test("dHash128 pigeonhole: any pair <= 4 bits apart shares a block (seeded sweep)") {
    import spark.implicits._
    // mirror the operator's block layout over the logical 126-bit
    // (h1:h0) vector and check the r+1 guarantee on randomized flips
    def blocks(h0: Long, h1: Long): Seq[Long] = Seq(
      h0 & ((1L << 26) - 1),
      (h0 >>> 26) & ((1L << 26) - 1),
      ((h0 >>> 52) & ((1L << 11) - 1)) | ((h1 & ((1L << 15) - 1)) << 11),
      (h1 >>> 15) & ((1L << 26) - 1),
      (h1 >>> 41) & ((1L << 22) - 1))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val h0 = rnd.nextLong() & Long.MaxValue
      val h1 = rnd.nextLong() & Long.MaxValue
      var g0 = h0; var g1 = h1
      val nFlips = rnd.nextInt(5) // 0..4
      for (_ <- 1 to nFlips) {
        val b = rnd.nextInt(126)
        if (b < 63) g0 ^= 1L << b else g1 ^= 1L << (b - 63)
      }
      val shared = blocks(h0, h1).zip(blocks(g0, g1)).exists { case (a, b) => a == b }
      assert(shared,
        s"pigeonhole violated: ($h0,$h1) vs ($g0,$g1) after $nFlips flips")
    }
    // end-to-end: planted flips are recovered by the operator with exact hamming
    val base = (0 until 40).map { i =>
      (i.toLong, rnd.nextLong() & Long.MaxValue, rnd.nextLong() & Long.MaxValue)
    }
    val dups = base.take(10).map { case (id, h0, h1) =>
      val b = rnd.nextInt(126)
      if (b < 63) (id + 1000L, h0 ^ (1L << b), h1)
      else (id + 1000L, h0, h1 ^ (1L << (b - 63)))
    }
    val meta = (base ++ dups).toDF("media_id", "h0", "h1")
    val got = Multimodal.imageNearDup(meta, maxHamming = 4) // API default IS the 128-bit path
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toLong)).toSet
    val want = base.take(10).map { case (id, _, _) => (id, id + 1000L, 1L) }.toSet
    assert(got.filter(p => p._2 >= 1000L && p._1 == p._2 - 1000L) == want)
  }
}
