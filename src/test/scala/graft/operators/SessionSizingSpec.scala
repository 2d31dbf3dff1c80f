package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Cluster-deploy safety: operators that pick a partition count must
  * derive it from the SESSION's `spark.sql.shuffle.partitions`, not a
  * harness constant — a library pinned to local[32] sizing would
  * underparallelize a 1000-executor deployment by 100×.
  */
class SessionSizingSpec extends SparkSuite {

  test("ZipIndex default partitioning follows spark.sql.shuffle.partitions") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val conf = spark.sessionState.conf.numShufflePartitions
    val pos = ZipIndex.withPosition(df, Seq(col("id")), "pos")
    assert(pos.rdd.getNumPartitions === conf,
      s"default must inherit session conf ($conf)")
    // explicit override still wins (AQE pinning contract)
    val pinned = ZipIndex.withPosition(df, Seq(col("id")), "pos", numPartitions = 7)
    assert(pinned.rdd.getNumPartitions === 7)
    // and the values are unaffected by the sizing source
    assert(pos.orderBy("pos").select("id").collect().map(_.getLong(0)).toSeq ===
      (0L until 100L))
  }

  test("PrefixSum default partitioning follows spark.sql.shuffle.partitions") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, 2L)).toDF("id", "wt")
    val conf = spark.sessionState.conf.numShufflePartitions
    val cum = PrefixSum.withRunningTotal(df, Seq(col("id")), "wt", "cum")
    assert(cum.rdd.getNumPartitions === conf)
    val got = cum.orderBy("id").select("cum").collect().map(_.getLong(0)).toSeq
    assert(got === (1 to 100).map(_ * 2L))
  }

  test("session-conf changes are observed per call, not frozen at first use") {
    import spark.implicits._
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "6")
      val df = (0 until 50).map(i => (i.toLong, 1L)).toDF("id", "wt")
      assert(ZipIndex.withPosition(df, Seq(col("id")), "pos")
        .rdd.getNumPartitions === 6)
      assert(PrefixSum.withRunningTotal(df, Seq(col("id")), "wt", "cum")
        .rdd.getNumPartitions === 6)
    } finally spark.conf.set(key, prev)
  }
}
