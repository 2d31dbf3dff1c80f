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

  test("fused k-probe matches the per-position conjunction, codegen and interpreted") {
    import spark.implicits._
    val p = 1000000007L
    val m = 1L << 12
    val seeds = Seq((13L, 7L), (29L, 3L), (101L, 57L))
    val rnd = new scala.util.Random(11)
    val members = Seq.fill(200)(math.abs(rnd.nextLong()) % p).distinct
    val bc = spark.sparkContext.broadcast(BloomBitsetProbe.pack(m.toInt,
      members.iterator.flatMap(h => seeds.map { case (a, b) => a * h + b }
        .map(_ % p % m))))
    val probes = (members.take(50) ++ Seq.fill(500)(math.abs(rnd.nextLong()) % p))
      .map(Option(_)) :+ None
    // columnar path: fused == conjunction of single probes, null in → null out
    val got = probes.toDF("h")
      .withColumn("fused", BloomBitsetProbe.probeK(col("h"), seeds, p, m, bc))
      .withColumn("each", seeds.map { case (a, b) =>
        BloomBitsetProbe.probe((lit(a) * col("h") + lit(b)) % lit(p) % lit(m), bc)
      }.reduce(_ && _))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2))
      else assert(r.getBoolean(1) === r.getBoolean(2), s"h=${r.getLong(0)}")
    }
    // every inserted member must hit (no false negatives)
    val hits = members.toDF("h")
      .where(BloomBitsetProbe.probeK(col("h"), seeds, p, m, bc)).count()
    assert(hits === members.size.toLong)
    // interpreted eval agrees with the columnar (codegen) result
    probes.flatten.take(100).foreach { h =>
      val e = BloomBitsetProbeK(
        org.apache.spark.sql.catalyst.expressions.Literal(h), seeds, p, m, bc)
      val exp = seeds.forall { case (a, b) =>
        val pos = a * h + b; val q = pos % p % m
        ((bc.value((q >>> 6).toInt) >>> (q & 63L)) & 1L) == 1L
      }
      assert(e.eval(null) === exp, s"interpreted h=$h")
    }
  }

  test("distributed fill == driver pack; duplicates free; empty set safe") {
    import spark.implicits._
    val m = 1L << 12
    val rnd = new scala.util.Random(17)
    val positions = Seq.fill(3000)(math.abs(rnd.nextLong()) % m)
    // dupes on purpose (the whole point of skipping distinct) and
    // enough partitions that the tree actually merges partials
    val df = (positions ++ positions.take(500)).toDF("p").repartition(8)
    val dist = BloomBitsetProbe.packDistributed(m, df)
    val driver = BloomBitsetProbe.pack(m, positions.distinct.iterator)
    assert(dist.toSeq === driver.toSeq,
      "executor-side OR-fold must produce the identical word array")
    // no position on the driver: the result is the only driver object,
    // and an empty input still yields a well-formed all-clear set
    val empty = BloomBitsetProbe.packDistributed(m,
      spark.emptyDataset[Long].toDF("p"))
    assert(empty.length === (m >> 6).toInt && empty.forall(_ == 0L))
    // an out-of-range position fails the job loudly, not silently
    intercept[org.apache.spark.SparkException](
      BloomBitsetProbe.packDistributed(64L, Seq(64L).toDF("p")))
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
