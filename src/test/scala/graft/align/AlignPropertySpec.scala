package graft.align

import graft.SparkSuite

/** Brute-force reference properties for the flagship alignment
  * operators: slice2hop against a direct in-memory composition, and
  * conservedSegment against exhaustive span enumeration with the
  * reference's tiebreak.
  */
class AlignPropertySpec extends SparkSuite {

  test("slice2hop matches brute-force composition on random stores") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // random pairwise store: 3 non-axis seqs, all vs one axis
    val coords = (0 until 30).map { i =>
      val src = s"s${rnd.nextInt(3)}"
      val s0 = rnd.nextInt(200).toLong
      val len = 1L + rnd.nextInt(40)
      val ds = rnd.nextInt(200).toLong
      val ori = if (rnd.nextBoolean()) 1 else -1
      ((src, s0, s0 + len), ("axis", ds, ds + len, ori))
    }
    val store = AlignmentStore.fromCoords(spark, coords) // bidirectional
    val (qs, qe) = (40L, 160L)
    val got = store
      .slice2hop(Seq((0L, "s0", qs, qe)).toDF("q_id", "src_id", "q_start", "q_end"),
        binWidth = 32L)
      .select("src_id", "src_start", "src_end", "dest_id", "dest_start", "dest_end", "dest_ori")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
                 r.getLong(4), r.getLong(5), r.getInt(6)))
      .toSet

    // brute force: for every s0 block clipped to the window, compose
    // with every block (inverse direction) through the axis
    val expected = (for {
      ((s1i, s1s, s1e), (_, m1s0, m1e0, o1)) <- coords if s1i == "s0"
      cs = math.max(s1s, qs); ce = math.min(s1e, qe) if cs < ce
      // clip the axis interval to the clipped src (ori-aware)
      m1s = if (o1 >= 0) m1s0 + (cs - s1s) else m1s0 + (s1e - ce)
      m1e = if (o1 >= 0) m1e0 - (s1e - ce) else m1e0 - (cs - s1s)
      ((yi, t2s, t2e), (_, s2s, s2e, o2)) <- coords // inverse rows: axis->y
      ms = math.max(m1s, s2s); me = math.min(m1e, s2e) if ms < me
      xs = if (o1 >= 0) cs + (ms - m1s) else cs + (m1e - me)
      xe = if (o1 >= 0) cs + (me - m1s) else cs + (m1e - ms)
      ys = if (o2 >= 0) t2s + (ms - s2s) else t2s + (s2e - me)
      ye = if (o2 >= 0) t2s + (me - s2s) else t2s + (s2e - ms)
      if yi != "s0" || xs != ys // self-match drop
    } yield ("s0", xs, xe, yi, ys, ye, o1 * o2)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("conservedSegment matches exhaustive span search with reference tiebreak") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 5) {
      val n = 24
      val s1 = Array.fill(n)("ACGT" (rnd.nextInt(4))).mkString
      val s2 = Array.fill(n)("ACGT" (rnd.nextInt(4))).mkString
      val seqs = Seq(("a", s1), ("b", s2)).toDF("seq_id", "seq")
      val blocks = Seq(("a", 0L, n.toLong, "b", 0L, n.toLong, 1, 1L))
        .toDF("src_id", "src_start", "src_end", "dest_id",
              "dest_start", "dest_end", "dest_ori", "block_id")
      val pbp = 6000L
      val got = PairAlignment.conservedSegment(blocks, seqs, pbp)
        .select("c_src_start", "c_src_end", "seg_ident", "seg_span")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .headOption

      // exhaustive over run-pair spans (anchors at run starts/ends
      // only, like the reference's segment list), reference scan order
      val m = (0 until n).map(i => s1(i) == s2(i))
      def runStart(j: Int) = m(j) && (j == 0 || !m(j - 1))
      def runEnd(i: Int) = m(i) && (i == n - 1 || !m(i + 1))
      var best: Option[(Long, Long, Long, Long)] = None
      for {
        i <- 0 until n if runEnd(i)        // end-run anchor ascends
        j <- (0 to i).reverse if runStart(j) // start-run anchor descends
      } {
        val ni = (j to i).count(m)
        val l = i - j + 1
        if (ni * 10000L >= pbp * l &&
            best.forall(b => l > b._4)) // strictly-more letters replaces
          best = Some((j.toLong, i + 1L, ni.toLong, l.toLong))
      }
      assert(got === best, s"trial $trial s1=$s1 s2=$s2")
    }
  }
}
