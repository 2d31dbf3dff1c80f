package graft.operators

import graft.SparkSuite

/** Goldens for the full sweep-line mask (pygr `groupBySequences`,
  * `cnestedlist.pyx:899-1008`): distinct-lane depth, the
  * stop-before-start dip at touching boundaries, fractional
  * pMinAligned, indelCut splitting, and the non-sourceOnly clipped
  * output mode.
  */
class CoverageMaskSpec extends SparkSuite {

  private def ivals(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.map { case (l, s, e) => ("g", l, s, e) }.toDF("grp", "lane", "s", "e")
  }

  private def regions(df: org.apache.spark.sql.DataFrame, minAligned: Long,
                      pMin: Double = 0.0, indelCut: Boolean = false) =
    Coverage.mask(df, Seq("grp"), "lane", "s", "e", minAligned, pMin,
        sourceOnly = true, indelCut = indelCut)
      .orderBy("island").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("touching intervals dip below threshold at the join point") {
    // A's two intervals touch at 10: the reference pops the stop bound
    // before pushing the start, so depth dips to 1 AT pos 10 and the
    // region splits even though every segment has depth 2
    val df = ivals(("A", 0L, 10L), ("A", 10L, 20L), ("B", 0L, 20L))
    assert(regions(df, minAligned = 2L) === Seq((0L, 0L, 10L), (1L, 10L, 20L)))
  }

  test("overlapping same-lane intervals count once (DictQueue keys)") {
    // A covers [0,20) twice over [5,10); depth must stay 1 for a
    // single lane, so minAligned=2 masks everything out
    val df = ivals(("A", 0L, 10L), ("A", 5L, 20L))
    assert(regions(df, minAligned = 2L) === Seq.empty)
    // and counts as one continuous lane for minAligned=1 (no dip at 10)
    assert(regions(df, minAligned = 1L) === Seq((0L, 0L, 20L)))
  }

  test("fractional pMinAligned masks below the group-size threshold") {
    val df = ivals(("A", 0L, 10L), ("B", 2L, 8L), ("C", 20L, 30L), ("D", 21L, 25L))
    // nseq=4, pMin=0.5 -> only depth>=2 segments survive
    assert(regions(df, minAligned = 1L, pMin = 0.5) ===
      Seq((0L, 2L, 8L), (1L, 21L, 25L)))
  }

  test("indelCut splits at non-first lane-interval bounds") {
    val df = ivals(("A", 0L, 10L), ("A", 14L, 30L), ("B", 0L, 22L), ("C", 5L, 30L))
    // without the cut: one region (depth never dips below 2)
    assert(regions(df, minAligned = 2L) === Seq((0L, 0L, 30L)))
    // with indelCut: A's second interval starts at 14 -> split there
    assert(regions(df, minAligned = 2L, indelCut = true) ===
      Seq((0L, 0L, 14L), (1L, 14L, 30L)))
  }

  test("full mode clips each lane interval to its mask regions") {
    val df = ivals(("A", 0L, 10L), ("B", 2L, 8L), ("C", 20L, 30L), ("D", 21L, 25L))
    val got = Coverage.mask(df, Seq("grp"), "lane", "s", "e",
        minAligned = 1L, pMinAligned = 0.5)
      .select("lane", "clip_start", "clip_end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("A", 2L, 8L), ("B", 2L, 8L), ("C", 21L, 25L), ("D", 21L, 25L)))
  }
}
