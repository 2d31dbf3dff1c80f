package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BloomProbeSpec extends SparkSuite {

  test("pack + probe: set bits hit, clear bits miss, nulls propagate") {
    import spark.implicits._
    val m = 1 << 10
    val set = Seq(0L, 1L, 63L, 64L, 65L, 511L, 512L, 1023L)
    val bc = spark.sparkContext.broadcast(
      BloomBitsetProbe.pack(m, set.iterator))
    val df = ((0L until m.toLong).map(Option(_)) :+ None)
      .toDF("pos")
    val got = df
      .withColumn("hit", BloomBitsetProbe.probe(col("pos"), bc))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
                 if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    (0L until m.toLong).foreach { p =>
      assert(got(Some(p)) === Some(set.contains(p)), s"bit $p")
    }
    assert(got(None) === None, "null position must stay null")
    // the broadcast round: only set positions survive a filter
    val hits = df.where(BloomBitsetProbe.probe(col("pos"), bc))
      .as[Long].collect().sorted.toSeq
    assert(hits === set.sorted)
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val m = 64 * 4
    val rnd = new scala.util.Random(5)
    val set = Seq.fill(40)(rnd.nextInt(m).toLong).distinct
    val bc = spark.sparkContext.broadcast(
      BloomBitsetProbe.pack(m, set.iterator))
    (0L until m.toLong).foreach { p =>
      val e = BloomBitsetProbe(
        org.apache.spark.sql.catalyst.expressions.Literal(p), bc)
      assert(e.eval(null) === set.contains(p), s"interpreted bit $p")
    }
  }

  test("pack rejects out-of-range positions and non-word sizes") {
    intercept[IllegalArgumentException](
      BloomBitsetProbe.pack(100, Iterator.empty))
    intercept[IllegalArgumentException](
      BloomBitsetProbe.pack(64, Iterator(64L)))
    intercept[IllegalArgumentException](
      BloomBitsetProbe.pack(64, Iterator(-1L)))
  }
}
