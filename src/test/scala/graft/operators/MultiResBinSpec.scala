package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `binnedMulti` must (a) return exactly `rangeJoin`'s pairs on mixed
  * short/long/whole-axis intervals — each pair exactly once — and
  * (b) bound per-interval row explosion by 2·levels regardless of
  * interval length (the single-level `binned` explodes a whole-axis
  * span into every bin on the axis; that is the defect this operator
  * removes, pygr's NCList sublist containment case,
  * `intervaldb.c:222-306`).
  */
class MultiResBinSpec extends SparkSuite {

  private def mixedFixture(seed: Int, n: Int, axis: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val key = rnd.nextInt(4)
      val len = rnd.nextInt(3) match {
        case 0 => 1L + rnd.nextInt(50)              // short
        case 1 => 500L + rnd.nextInt(5000)          // medium
        case _ => axis / 2 + rnd.nextLong(axis / 2) // huge, up to whole axis
      }
      val s = rnd.nextLong(math.max(1L, axis - len))
      (i.toLong, key, s, s + len)
    }.toDF("id", "k", "s", "e")
  }

  test("parity vs rangeJoin on mixed-length intervals, whole-axis spans present") {
    val axis = 100000L
    val a = mixedFixture(1, 300, axis)
      .toDF("a_id", "k", "a_s", "a_e")
    val b = mixedFixture(2, 300, axis)
      .toDF("b_id", "k", "b_s", "b_e")
    val want = IntervalJoin.rangeJoin(a, b, Seq("k"), "a_s", "a_e", "b_s", "b_e")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    for ((fanout, levels) <- Seq((16, 4), (4, 2), (8, 6))) {
      val got = IntervalJoin.binnedMulti(a, b, Seq("k"),
          "a_s", "a_e", "b_s", "b_e", binWidth = 64L, fanout = fanout, levels = levels)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(got === want, s"fanout=$fanout levels=$levels diverged " +
        s"(got ${got.size} pairs, want ${want.size})")
      // exactly-once: no pair may survive in two (level, bin) cells
      assert(got.distinct.size === got.size,
        s"fanout=$fanout levels=$levels emitted duplicate pairs")
    }
  }

  test("levels=1 degenerates to the single-level binned join") {
    val a = mixedFixture(3, 150, 4000L).toDF("a_id", "k", "a_s", "a_e")
    val b = mixedFixture(4, 150, 4000L).toDF("b_id", "k", "b_s", "b_e")
    val multi = IntervalJoin.binnedMulti(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", binWidth = 128L, fanout = 2, levels = 1)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val single = IntervalJoin.binned(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", binWidth = 128L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(multi.toSeq === single.toSeq)
  }

  test("row explosion is bounded by 2*levels even for whole-axis spans") {
    import spark.implicits._
    val axis = 10000000L
    val widths = Array.iterate(100L, 4)(_ * 16) // 100..409600
    // one whole-axis interval + shorts at every scale
    val df = Seq(
      (0L, 0L, axis),              // whole axis: >> coarsest width
      (1L, 50L, 120L),             // short
      (2L, 0L, 100000L),           // medium-long
      (3L, 999L, 1000L)            // unit
    ).toDF("id", "s", "e")
    val byId = IntervalJoin.explodeLevels(df, "s", "e", widths, "__own")
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ids 1..3 fit inside the coarsest width: hard 2*levels bound
    for (id <- 1L to 3L)
      assert(byId(id) <= 2L * widths.length,
        s"id=$id exploded to ${byId(id)} rows (> ${2 * widths.length})")
    // the whole-axis span walks bins only at the COARSEST level
    val coarseBins = axis / widths.last + 2
    assert(byId(0L) <= coarseBins,
      s"whole-axis span exploded to ${byId(0L)} rows (> $coarseBins): " +
        "long intervals must be walked at the coarsest resolution only")
    // and the single-level explodeBins comparison: 100k bins
    assert(byId(0L) < 100L,
      s"expected ~${axis / widths.last} coarse bins, got ${byId(0L)}")
  }
}
