package graft.streaming

import graft.SparkSuite

/** The replay-sizing wrapper is conf-mutation with a restore
  * contract — pin it: the value holds inside the body (where the
  * streaming query starts and snapshots it) and is restored after,
  * including on exception (a replay that throws must not leak a
  * tiny shuffle-partition count into the rest of the session).
  */
class ReplaySizedSpec extends SparkSuite {

  private val key = "spark.sql.shuffle.partitions"

  test("sets inside the body, restores after") {
    val before = spark.conf.get(key)
    val inside = StreamOps.replaySized(spark, 3) { spark.conf.get(key) }
    assert(inside === "3")
    assert(spark.conf.get(key) === before)
  }

  test("restores on exception") {
    val before = spark.conf.get(key)
    intercept[RuntimeException] {
      StreamOps.replaySized(spark, 3) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) === before)
  }

  test("timeCuts: half-open slices cover every timestamp exactly once, in time order") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 20) {
      val n = 1 + rnd.nextInt(500)
      val ts = Seq.fill(n)(rnd.nextLong() % 1000000L)
      val k = 1 + rnd.nextInt(12)
      val cuts = StreamOps.timeCuts(ts, k)
      // ordered, non-overlapping, contiguous
      cuts.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 === l2)
        case _ => ()
      }
      cuts.foreach { case (a, b) => assert(b > a) }
      // every timestamp lands in exactly one slice (incl. min and max)
      ts.foreach { t =>
        assert(cuts.count { case (a, b) => t >= a && t < b } === 1, s"t=$t k=$k")
      }
      assert(cuts.size <= k)
    }
    // degenerate inputs don't explode
    assert(StreamOps.timeCuts(Seq.empty, 4).nonEmpty)
    assert(StreamOps.timeCuts(Seq(5L), 8).size === 1)
  }
}
