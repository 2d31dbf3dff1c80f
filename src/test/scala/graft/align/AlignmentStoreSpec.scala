package graft.align

import graft.SparkSuite

/** Ports the reference's NLMSA golden cases to explicit-orientation
  * coordinates: pygr `tests/nlmsa_test.py:10-33` (sign-encoded NCList
  * goldens) and `tests/nlmsa_test.py:153-167` (`test_simple` coord
  * ingest + slice). Sign-encoded `(-20,-5)` on the src axis becomes
  * forward coords `[5,20)` with relative orientation flipped.
  */
class AlignmentStoreSpec extends SparkSuite {

  private def mkQueries(qs: (Long, String, Long, Long)*) = {
    import spark.implicits._
    qs.toDF("q_id", "src_id", "q_start", "q_end")
  }

  private def collectSlice(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("block_id")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
                 r.getString(4), r.getLong(5), r.getLong(6), r.getInt(7)))
      .toSeq

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case ap: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(ap.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  private def sameStage(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case ap: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      sameStage(ap.executedPlan)
    case _: org.apache.spark.sql.execution.adaptive.QueryStageExec |
         _: org.apache.spark.sql.execution.exchange.Exchange =>
      Seq.empty // stage boundary
    case _ => p +: p.children.flatMap(sameStage)
  }

  /** True when some aggregate sits in the same stage as a join — the
    * map-side (fused) merge placement's signature; the reduce-side
    * placement always has an Exchange between join and aggregate. */
  private def mergeFusedIntoJoinStage(df: org.apache.spark.sql.DataFrame): Boolean =
    allNodes(df.queryExecution.executedPlan)
      .collect { case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
      .exists(_.children.flatMap(sameStage)
        .exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]))

  test("test_simple: msa[a[0:8]] -> b[0:8] (nlmsa_test.py:153-167)") {
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 8L), ("b", 0L, 8L, 1)),
      (("a", 12L, 20L), ("c", 0L, 8L, 1))))
    val got = collectSlice(store.slice(mkQueries((0L, "a", 0L, 8L))))
    assert(got === Seq(("a", 0L, 8L, "b", 0L, 8L, 1)))
    // and the inverse direction (bidirectional build): msa[b[0:8]] -> a
    val gotB = collectSlice(store.slice(mkQueries((0L, "b", 0L, 8L))))
    assert(gotB === Seq(("b", 0L, 8L, "a", 0L, 8L, 1)))
  }

  test("NCList golden with reverse orientation (nlmsa_test.py:14-22)") {
    // sign world: ivals (0,10,1,-110,-100) and (-20,-5,2,300,315)
    // explicit-ori world: a[0,10)->t1[100,110) ori=-1 ; a[5,20)->t2[300,315) ori=-1
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 10L), ("t1", 100L, 110L, -1)),
      (("a", 5L, 20L), ("t2", 300L, 315L, -1))),
      bidirectional = false)
    // query [0,10): hits both; second clipped to [5,10) with dest
    // trimmed from the LOW end (reverse orientation): [310,315)
    val got = collectSlice(store.slice(mkQueries((0L, "a", 0L, 10L))))
    assert(got === Seq(
      ("a", 0L, 10L, "t1", 100L, 110L, -1),
      ("a", 5L, 10L, "t2", 310L, 315L, -1)))
    // query [11,20) misses block 0, clips block 1 to [11,20):
    // reverse dest drops (11-5)=6 from the HIGH end -> [300,309)
    val got2 = collectSlice(store.slice(mkQueries((0L, "a", 11L, 20L))))
    assert(got2 === Seq(("a", 11L, 20L, "t2", 300L, 309L, -1)))
  }

  test("mergeSeq merges per target lane (cnestedlist.pyx:324-347)") {
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 10L), ("b", 50L, 60L, 1)),
      (("a", 20L, 30L), ("b", 80L, 90L, 1)),
      (("a", 40L, 50L), ("c", 0L, 10L, 1))),
      bidirectional = false)
    val merged = store.mergeSeq(store.slice(mkQueries((0L, "a", 0L, 100L))))
      .orderBy("dest_id")
      .collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(merged.toSeq === Seq(
      ("b", 0L, 30L, 50L, 90L, 2L),
      ("c", 40L, 50L, 0L, 10L, 1L)))
  }

  test("two-hop slice through shared axis (cnestedlist.pyx:498-533)") {
    // 3 sequences all stored vs the shared axis only (MAF-style);
    // human-vs-mouse / human-vs-chicken exist only via the axis.
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("human", 0L, 10L), ("lpo", 100L, 110L, 1)),
      (("mouse", 50L, 58L), ("lpo", 102L, 110L, 1)),
      (("chicken", 7L, 12L), ("lpo", 104L, 109L, -1))))
    def hop(q: (Long, String, Long, Long)) =
      store.slice2hop(mkQueries(q), binWidth = 8L)
        .orderBy("dest_id")
        .collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
                   r.getString(4), r.getLong(5), r.getLong(6), r.getInt(7)))
        .toSeq

    // full human query: axis overlap [102,110) with mouse (+1) and
    // [104,109) with chicken (-1); self-match human->human dropped
    assert(hop((0L, "human", 0L, 10L)) === Seq(
      ("human", 4L, 9L, "chicken", 7L, 12L, -1),
      ("human", 2L, 10L, "mouse", 50L, 58L, 1)))
    // symmetric from mouse
    assert(hop((0L, "mouse", 50L, 58L)) === Seq(
      ("mouse", 52L, 57L, "chicken", 7L, 12L, -1),
      ("mouse", 50L, 58L, "human", 2L, 10L, 1)))
    // clipped query window: hop1 clip [105,110) propagates through the
    // axis intersection; reverse-ori chicken trimmed from the LOW end
    assert(hop((0L, "human", 5L, 10L)) === Seq(
      ("human", 5L, 9L, "chicken", 7L, 11L, -1),
      ("human", 5L, 10L, "mouse", 53L, 58L, 1)))
  }

  test("slice2hopMerged: mergeSeq-after-hop-2 semantics, merge below the exchange (cnestedlist.pyx:537-539)") {
    // same MAF-style store as the two-hop golden plus a second mouse
    // block, so one target lane genuinely merges two pairs
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("human", 0L, 10L), ("lpo", 100L, 110L, 1)),
      (("mouse", 50L, 58L), ("lpo", 102L, 110L, 1)),
      (("mouse", 60L, 64L), ("lpo", 103L, 107L, 1)),
      (("chicken", 7L, 12L), ("lpo", 104L, 109L, -1))))
    val merged = store.slice2hopMerged(mkQueries((0L, "human", 0L, 10L)),
      binWidth = 8L, mapSideMerge = Some(true))
    val got = merged.orderBy("dest_id").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4),
                 r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === Seq(
      ("chicken", -1, 4L, 9L, 7L, 12L, 1L),
      ("mouse", 1, 2L, 10L, 50L, 64L, 2L)))
    // identical to the unfused composition by construction
    val unfused = store.mergeSeq(
        store.slice2hop(mkQueries((0L, "human", 0L, 10L)), binWidth = 8L))
      .orderBy("dest_id").collect().map(_.toSeq).toSeq
    assert(merged.orderBy("dest_id").collect().map(_.toSeq).toSeq === unfused)
    // plan shape: the partial aggregate must sit INSIDE the second
    // hop's join stage (no Exchange between them) — the quadratic pair
    // set exists only in the join's output iterator and never shuffles
    val plan = merged.queryExecution.executedPlan
    assert(mergeFusedIntoJoinStage(merged),
      s"partial aggregate not fused into the join stage:\n$plan")

    // reduce-side path (mapSideMerge = false, the many-sequence
    // regime): identical rows, but the aggregate must sit ABOVE an
    // exchange — no aggregate fused into the join stage, so the
    // map side never builds a per-pair hash map
    val reduceSide = store.slice2hopMerged(
      mkQueries((0L, "human", 0L, 10L)), binWidth = 8L, mapSideMerge = Some(false))
    assert(reduceSide.orderBy("dest_id").collect().map(_.toSeq).toSeq === unfused)
    val rsPlan = reduceSide.queryExecution.executedPlan
    assert(!mergeFusedIntoJoinStage(reduceSide),
      s"mapSideMerge=Some(false) still aggregates inside the join stage:\n$rsPlan")

    // ...and the repartition exchange must be column-pruned to exactly
    // the merge's inputs (group key + span columns). slice2hop emits
    // 11 columns; shipping the 4 mergeSeq never reads (src_id,
    // axis_id, block ids) would silently grow the pair shuffle ~40%.
    val mergeCols = Set("q_id", "dest_id", "dest_ori",
      "src_start", "src_end", "dest_start", "dest_end")
    val exchanges = allNodes(rsPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    val pairExchange = exchanges.find(
      _.output.map(_.name).toSet.intersect(mergeCols).size >= 5)
    assert(pairExchange.isDefined, s"no pair exchange found:\n$rsPlan")
    assert(pairExchange.get.output.map(_.name).toSet === mergeCols,
      s"pair exchange not pruned to the merge columns:\n${pairExchange.get}")
  }

  test("slice2hopMerged auto gate: map-side on the dense store, reduce-side on the sparse store (VERDICT r15 #1)") {
    // Dense store — the reference's genome regime in miniature: ONE
    // (src, dest, ori) lane holding 32 blocks, so laneMultiplicity
    // (count / distinct lanes) is far above the threshold and the
    // auto gate must fuse the merge into the join stage, exactly as
    // the reference picks pairwiseMode vs LPO from the store it was
    // built as (cnestedlist.pyx:1485-1497) rather than asking the
    // caller.
    val dense = AlignmentStore.fromCoords(spark,
      (0 until 32).map(i =>
        (("human", i * 10L, i * 10L + 8L), ("lpo", 100L, 108L, 1))))
    assert(dense.laneMultiplicity >= AlignmentStore.MinMapSideMergeLaneRows,
      s"dense fixture multiplicity ${dense.laneMultiplicity} below the gate")
    val denseQ = mkQueries((0L, "human", 0L, 320L))
    val denseAuto = dense.slice2hopMerged(denseQ, binWidth = 64L)
    assert(mergeFusedIntoJoinStage(denseAuto),
      "auto gate failed to place the merge map-side on the dense store:\n" +
        denseAuto.queryExecution.executedPlan)

    // Sparse store — many-sequence regime: every block its own lane,
    // multiplicity ~1, so map-side partials would hold one entry per
    // pair (the 36 GB spill shape at v2sf5, DRIFT_r15 §1) and the
    // auto gate must keep the merge strictly above the exchange.
    val sparse = AlignmentStore.fromCoords(spark,
      (0 until 32).map(i =>
        ((s"u$i", 0L, 8L), (s"d${i % 8}", 0L, 8L, 1))))
    assert(sparse.laneMultiplicity < AlignmentStore.MinMapSideMergeLaneRows,
      s"sparse fixture multiplicity ${sparse.laneMultiplicity} at/above the gate")
    val sparseQ = mkQueries((0 until 32).map(i => (i.toLong, s"u$i", 0L, 8L)): _*)
    val sparseAuto = sparse.slice2hopMerged(sparseQ, binWidth = 64L)
    assert(!mergeFusedIntoJoinStage(sparseAuto),
      "auto gate failed to place the merge reduce-side on the sparse store:\n" +
        sparseAuto.queryExecution.executedPlan)

    // and on BOTH shapes the auto result is row-identical to both
    // pinned placements — the gate only moves the merge, never the
    // semantics
    for ((store, q) <- Seq((dense, denseQ), (sparse, sparseQ))) {
      val auto = store.slice2hopMerged(q, binWidth = 64L)
        .orderBy("q_id", "dest_id", "dest_ori").collect().map(_.toSeq).toSeq
      val mapSide = store.slice2hopMerged(q, binWidth = 64L, mapSideMerge = Some(true))
        .orderBy("q_id", "dest_id", "dest_ori").collect().map(_.toSeq).toSeq
      val reduceSide = store.slice2hopMerged(q, binWidth = 64L, mapSideMerge = Some(false))
        .orderBy("q_id", "dest_id", "dest_ori").collect().map(_.toSeq).toSeq
      assert(auto.nonEmpty && auto === mapSide && auto === reduceSide)
    }
  }

  test("auto bin width: default slice/slice2hop need no width knob, even with containment spans") {
    // the NCList containment case (intervaldb.c:222-306): one
    // whole-axis block plus many short ones, and a query window much
    // longer than the short spans. Any fixed width is wrong for one
    // of the three span classes; the auto default (multi-resolution
    // at the store's p95-span base) must return exactly the explicit
    // single-level result for ANY width, because the binned joins are
    // width-independent in RESULTS by construction.
    val coords = (("big", 0L, 100000L), ("lpo", 0L, 100000L, 1)) +:
      (0 until 64).map(i =>
        ((s"s$i", 0L, 40L), ("lpo", i * 1500L, i * 1500L + 40L, 1)))
    val store = AlignmentStore.fromCoords(spark, coords)
    // p95 span of the store is the short-block span (40) → base 64
    assert(store.autoBinWidth === 64L,
      s"autoBinWidth ${store.autoBinWidth} (p95 span should be 40 → 64)")
    val q = mkQueries((0L, "big", 0L, 100000L))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "dest_id", "dest_start", "block_id")
        .collect().map(_.toSeq).toSeq
    val auto = sorted(store.slice(q, indexed = Some(false)))
    assert(auto.nonEmpty)
    assert(auto === sorted(store.slice(q, binWidth = 1 << 16, indexed = Some(false))))
    assert(auto === sorted(store.slice(q, binWidth = 128L, indexed = Some(false))))
    // two-hop through the shared axis, auto everywhere: equal to the
    // explicitly-binned runs at two very different widths
    def sorted2(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "dest_id", "block1_id", "block2_id")
        .collect().map(_.toSeq).toSeq
    val auto2 = sorted2(store.slice2hop(q))
    assert(auto2.nonEmpty)
    assert(auto2 === sorted2(store.slice2hop(q, binWidth = 1 << 16)))
    assert(auto2 === sorted2(store.slice2hop(q, binWidth = 256L, axisBinWidth = 4096L)))

    // the physical choice behind the equalities: this store's span
    // tail (one 100000-span block among 40-span ones, max > 8×p95)
    // must refuse the single-level width and take the ladder...
    assert(store.autoJoinWidth(q).isEmpty,
      "containment-tailed store must fall back to the multi-resolution join")
    // ...while a tame store picks the two-sided single-level width:
    // short side = blocks (p95 40), long side = 1000-span queries →
    // pow2ceil(max(40, 1000/16)) = 64 (the divisor leans fine: the
    // cost curve's hot-key cliff sits above the optimum, DRIFT_r16 §7)
    val tame = AlignmentStore.fromCoords(spark,
      (0 until 64).map(i => ((s"s${i % 4}", i * 50L, i * 50L + 40L),
                             ("lpo", i * 50L, i * 50L + 40L, 1))))
    val tameQ = mkQueries((0L, "s0", 0L, 1000L), (1L, "s1", 500L, 1500L))
    assert(tame.autoJoinWidth(tameQ) === Some(64L),
      s"two-sided width: got ${tame.autoJoinWidth(tameQ)}")
    // and the tame auto slice equals its explicit-width twin too
    assert(sorted(tame.slice(tameQ, indexed = Some(false))) ===
      sorted(tame.slice(tameQ, binWidth = 64L, indexed = Some(false))))
  }

  test("ladder depth follows the max span; the width probe memoizes per query plan (ADVICE r16)") {
    val store = AlignmentStore.fromCoords(spark,
      (("big", 0L, 100000L), ("lpo", 0L, 100000L, 1)) +:
        (0 until 64).map(i =>
          ((s"s$i", 0L, 40L), ("lpo", i * 1500L, i * 1500L + 40L, 1))))
    assert(store.autoBinWidth === 64L)
    // coarsest width must COVER the max span (the r16 doc claimed a
    // hard 2-rows-per-level bound that fixed levels=4 couldn't keep):
    // 64·16^3 = 262144 covers 100000 at the floor depth 4…
    assert(store.ladderLevels(100000L) === 4)
    // …a span past 4096×base deepens the ladder until covered…
    assert(store.ladderLevels(10L * 1000 * 1000) === 6,
      s"got ${store.ladderLevels(10L * 1000 * 1000)}")
    assert(64L * (1L << (4 * 5)) >= 10L * 1000 * 1000)
    // …and the cap at 8 is the honest residual (span/coarsest walk)
    assert(store.ladderLevels(Long.MaxValue / 4) === 8)

    // memoization: two slices with the SAME query frame probe once —
    // one memo entry, and the memoized stats match a fresh probe
    val q = mkQueries((0L, "big", 0L, 100000L))
    store.querySpanMemo.clear()
    store.slice(q, indexed = Some(false)).count()
    store.slice(q, indexed = Some(false)).count()
    assert(store.querySpanMemo.size === 1,
      s"expected one memoized probe, got ${store.querySpanMemo.size}")
    assert(store.querySpanStats(q) === Some((100000L, 100000L)))
    assert(store.querySpanMemo.size === 1)
    // a structurally DIFFERENT frame is a new memo entry
    store.querySpanStats(mkQueries((1L, "s0", 0L, 40L)))
    assert(store.querySpanMemo.size === 2)
  }

  test("column view: minus-strand letters complement, coords reflect") {
    import spark.implicits._
    val blocks = Seq(("a", 0L, 4L, "b", 4L, 8L, -1, 0L))
      .toDF("src_id", "src_start", "src_end", "dest_id",
            "dest_start", "dest_end", "dest_ori", "block_id")
    val seqs = Seq(("a", "ACGTTTTT"), ("b", "TTTTAACG")).toDF("seq_id", "seq")
    val got = PairAlignment.columns(blocks, seqs)
      .orderBy("src_pos")
      .select("src_pos", "src_letter", "dest_pos", "dest_letter", "is_match")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
      .toSeq
    // b[4,8) = "AACG", reverse-complemented reads "CGTT"; positions
    // reflect from the high end
    assert(got === Seq(
      (0L, "A", 7L, "C", false),
      (1L, "C", 6L, "G", false),
      (2L, "G", 5L, "T", false),
      (3L, "T", 4L, "T", true)))
  }

  test("inverse store swaps axes (cnestedlist.pyx:2041-2047)") {
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 8L), ("b", 100L, 108L, -1))), bidirectional = false)
    val got = collectSlice(store.inverse.slice(mkQueries((0L, "b", 100L, 108L))))
    assert(got === Seq(("b", 100L, 108L, "a", 0L, 8L, -1)))
  }

  test("letterEdges composes over slice output with q_id lanes") {
    import spark.implicits._
    val seqs = Seq(("a", "ACGTACGTAC"), ("b", "ACGTACGTAC")).toDF("seq_id", "seq")
    // two src-adjacent blocks with abutting dest coords → one bridge
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 4L), ("b", 0L, 4L, 1)),
      (("a", 4L, 8L), ("b", 4L, 8L, 1))), bidirectional = false)
    val sliced = store.slice(mkQueries((7L, "a", 1L, 7L)))
    val cols = PairAlignment.columns(sliced, seqs)
    val edges = PairAlignment.letterEdges(cols,
        laneCols = Seq("q_id", "src_id", "dest_id", "dest_ori"))
      .select("q_id", "src_pos", "next_src_pos", "dest_pos", "next_dest_pos", "edge_kind")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toSet
    // slice clips to [1,7): within-edges 1→2→3 and 4→5→6, bridge 3→4
    assert(edges === Set(
      (7L, 1L, 2L, 1L, 2L, "within"), (7L, 2L, 3L, 2L, 3L, "within"),
      (7L, 3L, 4L, 3L, 4L, "bridge"),
      (7L, 4L, 5L, 4L, 5L, "within"), (7L, 5L, 6L, 5L, 6L, "within")))
  }
}
