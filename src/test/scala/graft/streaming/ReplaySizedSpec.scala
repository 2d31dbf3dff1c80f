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
}
