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
}
