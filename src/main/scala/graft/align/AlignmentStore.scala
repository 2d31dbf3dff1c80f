package graft.align

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Intervals
import graft.operators.{Coverage, GapRule, IntervalJoin, Sessionize}
import graft.sources.BlastText

/** One aligned ungapped 1:1 block (pygr's `IntervalMap`,
  * `intervaldb.h:9-16`, normalized to pairwise rows with explicit
  * orientation instead of sign-encoded coords; SURVEY.md §1.1).
  * Coordinates are half-open `[start, end)`; `srcEnd-srcStart ==
  * destEnd-destStart` for every block.
  */
case class AlignBlock(src_id: String, src_start: Long, src_end: Long,
                      dest_id: String, dest_start: Long, dest_end: Long,
                      dest_ori: Int, block_id: Long)

/** A query interval on a source sequence (pygr `msa[ival]`). */
case class QueryIval(q_id: Long, src_id: String, q_start: Long, q_end: Long)

/** The alignment store — Spark re-expression of the NLMSA
  * (pygr `cnestedlist.pyx:1451-2047`). Stores pairwise rows; the
  * LPO/union-coordinate indirection of the reference is a 32-bit
  * workaround we do not need (SURVEY.md §7.4).
  *
  * Scale design: `persist` writes range-bucketed, sorted parquet so
  * row-group min/max stats on (src_id, src_start) replace the NCList
  * index; `slice` uses the binned interval join whose cost is bounded
  * per coordinate bin, not per sequence.
  */
class AlignmentStore(val blocks: DataFrame) {

  /** Cached (row count, approx distinct src keys, approx distinct
    * (src_id, dest_id, dest_ori) lanes) — ONE stats job per store,
    * lazily, driving every physical-path choice: slice's indexed-vs-
    * binned join gate and slice2hopMerged's merge placement. All
    * three aggregates ride the same pass so adding the lane estimate
    * costs no extra job.
    *
    * SNAPSHOT SEMANTICS: these stats (and the query-side span memo
    * below) are cached for the LIFETIME of this store instance. An
    * AlignmentStore models one fixed alignment set; if the
    * underlying files are rewritten in place, construct a new store
    * — the gates would otherwise keep deciding on the old shape.
    */
  private lazy val storeStats: (Long, Long, Long, Long, Long) = {
    val r = blocks.agg(count(lit(1)), approx_count_distinct(col("src_id")),
      approx_count_distinct(concat_ws("\u0000",
        col("src_id"), col("dest_id"), col("dest_ori").cast("string"))),
      expr("approx_percentile(src_end - src_start, 0.95)"),
      max(col("src_end") - col("src_start"))).head()
    (r.getLong(0), math.max(r.getLong(1), 1L), math.max(r.getLong(2), 1L),
     if (r.isNullAt(3)) 1L << 16 else math.max(r.getLong(3), 1L),
     if (r.isNullAt(4)) 1L << 16 else math.max(r.getLong(4), 1L))
  }

  private def keyStats: (Long, Long) = (storeStats._1, storeStats._2)

  /** Auto bin width for the binned interval joins: the next power of
    * two at or above the store's approx p95 block span (same lazy
    * stats pass as the other gates), floored at 16 and capped at 2^24
    * - 95% of blocks then explode into at most 2 bins at the BASE
    * resolution, and the multi-resolution join's coarser levels
    * absorb everything longer (query windows included) at <= 2 rows
    * per level. This is the engine's answer to the reference needing
    * no width knob at all (the NCList tree adapts per node,
    * `intervaldb.c:222-306`): measure the span distribution once,
    * derive the base, let the level ladder cover the rest.
    */
  private[graft] lazy val autoBinWidth: Long = pow2ceil(storeStats._4)

  private def pow2ceil(x: Long): Long = {
    var w = 16L
    while (w < x && w < (1L << 24)) w <<= 1
    w
  }

  /** Span tail bound for the single-level auto width: a max span far
    * above the p95 means some interval walks max/width bins at any
    * single-level width fine enough to prune — the containment shape
    * the multi-resolution ladder exists for. */
  private def tailsBounded(p95: Long, mx: Long): Boolean = mx <= 8L * p95

  /** Block-span tail bound from the cached store stats (hop 2's gate). */
  private def tailsBounded2: Boolean = tailsBounded(storeStats._4, storeStats._5)

  /** Memoized query-side span stats (p95, max) keyed by the
    * CANONICALIZED query plan, bounded LRU. The auto-width probe is
    * one eager agg job at plan-construction time whose input lineage
    * then runs AGAIN inside the join itself (ADVICE r16) — for the
    * slice-shaped workload (query frame orders of magnitude smaller
    * than the store) that is noise, but a caller slicing repeatedly
    * with the same frame should not re-pay even the probe: identical
    * plans hit this memo. Callers with an EXPENSIVE uncached query
    * lineage should cache the frame or pass an explicit `binWidth`,
    * which skips the probe entirely (documented on [[slice]]).
    */
  private[graft] val querySpanMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                                  Option[(Long, Long)]](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                                   Option[(Long, Long)]]): Boolean = size > 32
      })

  /** (p95 span, max span) of the query frame, or None for a streaming
    * or empty side; memoized per canonicalized plan (see memo doc). */
  private[graft] def querySpanStats(queries: DataFrame): Option[(Long, Long)] = {
    if (queries.isStreaming) return None
    val key = queries.queryExecution.analyzed.canonicalized
    val hit = querySpanMemo.get(key)
    if (hit != null) return hit
    val r = queries.agg(
      expr("approx_percentile(q_end - q_start, 0.95)"),
      max(col("q_end") - col("q_start"))).head()
    val stats =
      if (r.isNullAt(0) || r.isNullAt(1)) None
      else Some((math.max(r.getLong(0), 1L), math.max(r.getLong(1), 1L)))
    querySpanMemo.put(key, stats)
    stats
  }

  /** The auto physical choice for a binned overlap join between the
    * store and `queries` (r16): Some(width) = single-level binned,
    * None = multi-resolution at [[autoBinWidth]] base.
    *
    * Single-level with a TWO-SIDED width wins when both span tails
    * are bounded: width = pow2ceil(max(shortP95, longP95/16)) keeps
    * the short side at ≤ 2 bins (no replication of the bulk side)
    * while the long side walks ≤ ~16-17 bins. The divisor leans FINE
    * deliberately — the width-cost curve is an asymmetric U
    * (DRIFT_r16 §7): below the optimum the only cost is linear
    * replication of the few long intervals, while above it hot keys
    * pay quadratically in per-bin population, a cliff that STEEPENS
    * with scale (a /4 rule measured 1.15× of hand-tuned at v2sf1 but
    * 2.2× at v2sf5; /16 measures 1.15× at sf5). Measured against the
    * multi-resolution fallback: that ladder pays 2.4× (its coarsest
    * level holds the long side, where a bin spans the axis and
    * prunes nothing). A heavy tail on EITHER side (max > 8×p95, e.g.
    * one whole-axis block among short ones) or a streaming/empty
    * query side falls back to the ladder, whose cost is bounded by
    * construction for every span mix. The query-side stats are one
    * tiny agg over the query frame — the side that is orders of
    * magnitude smaller than the store in every slice-shaped
    * workload.
    */
  private[graft] def autoJoinWidth(queries: DataFrame): Option[Long] = {
    if (queries.isStreaming || !tailsBounded(storeStats._4, storeStats._5))
      return None
    querySpanStats(queries) match {
      case Some((qp95, qmax)) if tailsBounded(qp95, qmax) =>
        val short = math.min(storeStats._4, qp95)
        val long = math.max(storeStats._4, qp95)
        Some(pow2ceil(math.max(short, long / 16)))
      case _ => None
    }
  }

  /** See [[AlignmentStore.ladderLevels]] (overflow-guarded, ADVICE
    * r17); this instance form binds the store's own auto width. */
  private[graft] def ladderLevels(maxSpan: Long): Int =
    AlignmentStore.ladderLevels(autoBinWidth, maxSpan)

  /** Average blocks per (src_id, dest_id, dest_ori) alignment lane —
    * the store-shape statistic that separates the reference's genome
    * regime (few sequences, dense lanes: ~1.4k blocks/lane for 25
    * chromosomes at NLMSA scale; 18.9 on the v2sf1 dense fixture)
    * from many-sequence stores (one thin lane per pair: 1.3-1.4 on
    * the v2 per-user fixture at every SF). Drives the auto merge
    * placement in [[slice2hopMerged]].
    */
  private[graft] def laneMultiplicity: Double =
    storeStats._1.toDouble / storeStats._3

  /** msa[ival] for a whole DataFrame of query intervals at once —
    * hop+clip semantics of `NLMSASlice.__new__`
    * (`cnestedlist.pyx:446-543` steps 2-4): overlap join on the src
    * axis, clip hits to the query window, shift dest coordinates to
    * match the clip, orientation-aware.
    *
    * `indexed = None` (the default) picks the physical join path from
    * store stats: the custom indexed operator wins whenever the
    * per-key build side fits a task (no bin-width tuning, no row
    * multiplication entering the shuffle — it beat the binned twin on
    * identical work in round-2 benchmarks), so it is chosen when
    * avg rows per src key <= `maxIndexedKeyRows`; genuinely hot keys
    * (few sequences, tens of millions of blocks each — the
    * 25-chromosome shape) fall back to the binned join, which spreads
    * one key across coordinate bins. Streaming query sides always take
    * the binned path (the custom exec is batch-only). Explicit
    * `Some(true)`/`Some(false)` overrides.
    *
    * `binWidth = 0` (the default, r16) removes the width knob:
    * [[autoJoinWidth]] picks a two-sided single-level width when
    * both span distributions are tame (within 1.15-1.21× of expert
    * tuning by measurement) and otherwise runs the MULTI-RESOLUTION
    * join at [[autoBinWidth]] base — ≤ 2 rows per level per interval
    * by construction, so no span distribution makes the default
    * explode. An explicit width forces the single-level binned join
    * at that width.
    *
    * COST NOTE (ADVICE r16): `binWidth = 0` on the binned path runs
    * ONE eager stats job over the query frame at plan-construction
    * time, and the frame's lineage runs again inside the join — fine
    * for the slice-shaped workload (tiny query side), memoized per
    * canonicalized plan for repeated slices, but a caller with an
    * expensive uncached query lineage should cache the frame or pass
    * an explicit `binWidth` (no probe at all). The indexed path and
    * hop 2 of [[slice2hop]] never probe the query side.
    */
  def slice(queries: DataFrame, binWidth: Long = 0L,
            indexed: Option[Boolean] = None,
            maxIndexedKeyRows: Long = AlignmentStore.MaxIndexedKeyRows): DataFrame = {
    val useIndexed = indexed.getOrElse {
      !queries.isStreaming && keyStats._1 / keyStats._2 <= maxIndexedKeyRows
    }
    val joined =
      if (useIndexed)
        IntervalJoin.shuffledIndexIntervalJoin(
          blocks,
          queries.withColumnRenamed("src_id", "__qkey"),
          "src_id", "src_start", "src_end",
          "__qkey", "q_start", "q_end").drop("__qkey")
      else (if (binWidth > 0L) Some(binWidth) else autoJoinWidth(queries)) match {
        case Some(w) => IntervalJoin.binned(
          blocks, queries, Seq("src_id"),
          "src_start", "src_end", "q_start", "q_end", w)
        case None => IntervalJoin.binnedMulti(
          blocks, queries, Seq("src_id"),
          "src_start", "src_end", "q_start", "q_end", autoBinWidth,
          levels = ladderLevels(math.max(storeStats._5,
            querySpanStats(queries).map(_._2).getOrElse(1L))))
      }
    val ns = Intervals.clipStart(col("src_start"), col("q_start"))
    val ne = Intervals.clipEnd(col("src_end"), col("q_end"))
    joined
      .withColumn("c_src_start", ns)
      .withColumn("c_src_end", ne)
      .withColumn("c_dest_start",
        Intervals.clipDestStart(col("src_start"), col("src_end"),
          col("c_src_start"), col("c_src_end"), col("dest_start"), col("dest_ori")))
      .withColumn("c_dest_end",
        Intervals.clipDestEnd(col("src_start"), col("src_end"),
          col("c_src_start"), col("c_src_end"), col("dest_end"), col("dest_ori")))
      .select(col("q_id"), col("src_id"),
        col("c_src_start").as("src_start"), col("c_src_end").as("src_end"),
        col("dest_id"),
        col("c_dest_start").as("dest_start"), col("c_dest_end").as("dest_end"),
        col("dest_ori"), col("block_id"))
  }

  /** msa[ival] through a shared axis — the flagship two-hop query of
    * the reference (`NLMSASlice.__new__` LPO composition,
    * `cnestedlist.pyx:498-533`): hop 1 maps each query interval onto
    * the shared axis (`slice`, clipped to the query window); hop 2
    * re-queries the store with the axis intervals, intersects
    * arithmetically on the axis, and translates the intersection back
    * to source coords and forward to target coords. A MAF-style store
    * that keeps only ref-vs-other rows (`Maf.scala`) answers
    * chimp-vs-mouse queries only through this path.
    *
    * Orientation composes multiplicatively; coordinates stay forward
    * (ori is a flag, not sign-encoded as in the reference). Matches
    * where the target is the query sequence at the same coordinate
    * are self-matches and dropped (`cnestedlist.pyx:530-531` keeps a
    * hit only if `target_id != id or istart != start2`).
    *
    * Scale design: both hops are binned interval joins — cost bounded
    * per (axis, coordinate-bin), never per sequence, so one hot axis
    * (the reference genome every row aligns to) cannot pin a task.
    *
    * `axisBinWidth` bins the SECOND hop (the shared-axis coordinate
    * space) independently of `binWidth` (the first hop's query-axis
    * space): the two axes usually have different scales (a time axis
    * in seconds vs a genome coordinate axis), and a hop-1 width
    * carried onto a much smaller axis range collapses hop 2 into a
    * handful of join cells — parallelism bounded by cells, not
    * partitions. Defaults to `binWidth` (0 = inherit — and when that
    * is also 0/auto, hop 2 runs the multi-resolution join at
    * [[autoBinWidth]], which is the right base for the axis too:
    * every block's axis span equals its src span by the AlignBlock
    * invariant).
    */
  def slice2hop(queries: DataFrame, binWidth: Long = 0L,
                axisBinWidth: Long = 0L): DataFrame = {
    val h1 = slice(queries, binWidth).select(
      col("q_id"), col("src_id"),
      col("src_start").as("s1"), col("src_end").as("e1"),
      col("dest_id").as("axis_id"),
      col("dest_start").as("m1s"), col("dest_end").as("m1e"),
      col("dest_ori").as("ori1"), col("block_id").as("block1_id"))
    val h2 = blocks.select(
      col("src_id").as("axis_id"),
      col("src_start").as("s2"), col("src_end").as("e2"),
      col("dest_id").as("y_id"),
      col("dest_start").as("t2s"), col("dest_end").as("t2e"),
      col("dest_ori").as("ori2"), col("block_id").as("block2_id"))
    val ms = greatest(col("m1s"), col("s2"))
    val me = least(col("m1e"), col("e2"))
    val xs = when(col("ori1") >= 0, col("s1") + (ms - col("m1s")))
      .otherwise(col("s1") + (col("m1e") - me))
    val xe = when(col("ori1") >= 0, col("s1") + (me - col("m1s")))
      .otherwise(col("s1") + (col("m1e") - ms))
    val ys = when(col("ori2") >= 0, col("t2s") + (ms - col("s2")))
      .otherwise(col("t2s") + (col("e2") - me))
    val ye = when(col("ori2") >= 0, col("t2s") + (me - col("s2")))
      .otherwise(col("t2s") + (col("e2") - ms))
    val w2 = if (axisBinWidth > 0L) axisBinWidth else binWidth
    val joined2 =
      if (w2 > 0L) IntervalJoin.binned(
        h1, h2, Seq("axis_id"), "m1s", "m1e", "s2", "e2", w2)
      // auto: BOTH hop-2 sides carry the block span distribution
      // (h1's axis intervals are clipped blocks; h2 is the store), so
      // the two-sided rule needs no probe of the mid-plan h1 — tame
      // block tails take the single-level join at the block-span
      // width, heavy tails take the ladder
      else if (tailsBounded2) IntervalJoin.binned(
        h1, h2, Seq("axis_id"), "m1s", "m1e", "s2", "e2", autoBinWidth)
      else IntervalJoin.binnedMulti(
        h1, h2, Seq("axis_id"), "m1s", "m1e", "s2", "e2", autoBinWidth,
        // both hop-2 sides carry (clipped) block spans, so the store's
        // own max span bounds the ladder depth it needs
        levels = ladderLevels(storeStats._5))
    joined2
      .withColumn("x_start", xs).withColumn("x_end", xe)
      .withColumn("y_start", ys).withColumn("y_end", ye)
      .where(col("y_id") =!= col("src_id") || col("x_start") =!= col("y_start"))
      .select(col("q_id"), col("src_id"),
        col("x_start").as("src_start"), col("x_end").as("src_end"),
        col("y_id").as("dest_id"),
        col("y_start").as("dest_start"), col("y_end").as("dest_end"),
        (col("ori1") * col("ori2")).as("dest_ori"),
        col("axis_id"), col("block1_id"), col("block2_id"))
  }

  /** The fused two-hop + bounds-merge — the reference's dominant
    * two-hop CONSUMER shape (`NLMSASlice` runs `mergeSeq` immediately
    * after hop 2, `cnestedlist.pyx:537-539`): per-(query, target,
    * orientation) coordinate bounds and pair counts, WITHOUT handing
    * the caller the quadratic (block1, block2) pair set that
    * [[slice2hop]] returns.
    *
    * Scale design: the merge is expressed as a groupBy directly over
    * the lazy two-hop plan, so Catalyst places the partial (map-side)
    * aggregation INSIDE the second hop's join stage — pair rows exist
    * only transiently in the join's output iterator, and the one
    * exchange carries per-(q, target, ori) partial groups, never
    * pairs. At v2 scale the pair set grows ~quadratically in per-axis
    * alignment density (DRIFT_r14 §1: exponent 1.95, 549 M rows at
    * v2sf5) while this operator's shuffle and output stay bounded by
    * the distinct (query, target) pairs — the semantics users of the
    * reference's `mergeSeq` actually consume. Callers who need the
    * raw pairs keep [[slice2hop]]; production two-hop queries bounded
    * by their query windows get linear output here.
    *
    * `mapSideMerge` picks where the merge runs, and the right choice
    * is the store's SHAPE, not taste:
    *  - `Some(true)` — partial aggregation below the join's
    *    output, the plan described above. Right for the reference's
    *    genome regime (few sequences, dense per-pair blocks): group
    *    multiplicity is high, pair rows collapse map-side, the
    *    exchange carries per-group partials.
    *  - `Some(false)` — repartition the pair stream by the group key
    *    and aggregate reduce-side only. Right for many-sequence stores
    *    (groups ≈ pairs, multiplicity ~1): there the map-side hash
    *    map holds one entry PER PAIR, exhausts the task's share of
    *    the heap, and cascades into sort-based fallback — measured
    *    at v2sf5 (549 M pairs, per-user sequences): 36 GB spill and
    *    18× the pair-enumeration CPU floor, vs a clean bounded-map
    *    aggregation after the exchange (DRIFT_r15 §1). The exchange
    *    carries pair rows, but pairs were always cheaper to ship
    *    than to hold: per-partition group count is G/P, which sizing
    *    partitions to the data keeps inside one task's heap share.
    *  - `None` (default) — gate from the store's own stats, the same
    *    pattern as slice's `indexed = None`: map-side iff
    *    [[laneMultiplicity]] (avg blocks per (src, dest, ori) lane,
    *    one lazy stats pass shared with slice's gate) reaches
    *    `AlignmentStore.MinMapSideMergeLaneRows`. Two-hop pairs per
    *    merged group are the product of the two hops' lane densities,
    *    so thin lanes (measured 1.3-1.4 on the many-sequence v2
    *    fixture at every SF) mean no map-side collapse — the 36 GB
    *    regime — while dense lanes (18.9 at v2sf1, 94.7 at v2sf5 on
    *    the genome-shaped fixture; the reference's NLMSA stores are
    *    denser still) collapse map-side by at least the lane factor.
    *    The reference makes the same class of decision from the
    *    store it was built as — pairwiseMode vs LPO,
    *    `cnestedlist.pyx:1485-1497` — rather than asking the caller.
    */
  def slice2hopMerged(queries: DataFrame, binWidth: Long = 0L,
                      axisBinWidth: Long = 0L,
                      mapSideMerge: Option[Boolean] = None): DataFrame = {
    val mapSide = mapSideMerge.getOrElse(
      laneMultiplicity >= AlignmentStore.MinMapSideMergeLaneRows)
    val pairs = slice2hop(queries, binWidth, axisBinWidth)
    mergeSeq(if (mapSide) pairs
             else pairs.repartition(col("q_id"), col("dest_id"), col("dest_ori")))
  }

  /** Slice + conservation filter — the slice-consume path of the
    * reference's `filterIvalConservation` (`cnestedlist.pyx:867-897`;
    * SURVEY.md P8): every hit of `slice` is clipped to its best
    * segment meeting the `pIdentityMinBp` identity threshold
    * (`PairAlignment.conservedSegment`); hits with no qualifying
    * segment drop entirely.
    */
  def sliceConserved(queries: DataFrame, seqs: DataFrame,
                     pIdentityMinBp: Long, minAlignSize: Long = 1L,
                     binWidth: Long = 0L): DataFrame =
    PairAlignment.conservedSegment(slice(queries, binWidth), seqs,
      pIdentityMinBp, minAlignSize, keyCols = Seq("q_id", "block_id"))

  /** Per-target bounds of a slice result (`mergeSeq`,
    * `cnestedlist.pyx:324-347`; SURVEY.md A1).
    */
  def mergeSeq(sliced: DataFrame): DataFrame =
    sliced.groupBy("q_id", "dest_id", "dest_ori")
      .agg(min("src_start").as("src_start"), max("src_end").as("src_end"),
           min("dest_start").as("dest_start"), max("dest_end").as("dest_end"),
           count(lit(1)).as("n_blocks"))

  /** Gap-rule merging of blocks per (src,dest,ori) lane under the
    * FULL rule set — maxGap + maxInsert/minInsert (dest-axis gap) +
    * maxSize (either axis) + mergeAll (`groupByIntervals`,
    * `cnestedlist.pyx:722-845`; SURVEY.md A2). `GapRule.mergeMost`
    * is the reference's preset.
    */
  def groupByIntervals(rule: GapRule): DataFrame =
    Sessionize.mergeRule(blocks, Seq("src_id", "dest_id", "dest_ori"),
                         "src_start", "src_end", "dest_start", "dest_end", rule)

  /** Source-axis-only gap merge (the maxGap primary knob). */
  def groupByIntervals(maxGap: Long): DataFrame =
    Sessionize.merge(blocks, Seq("src_id", "dest_id", "dest_ori"),
                     "src_start", "src_end", maxGap)

  /** Coverage masking over the src axis with the FULL rule set
    * (`groupBySequences`, `cnestedlist.pyx:899-1008`; SURVEY.md A3):
    * absolute `minAligned` AND fractional `pMinAligned` thresholds on
    * the distinct-target depth, `sourceOnly` region collapse, and
    * `indelCut` splitting at non-first target-interval bounds.
    */
  def groupBySequences(minAligned: Long = 1L, pMinAligned: Double = 0.0,
                       sourceOnly: Boolean = false,
                       indelCut: Boolean = false): DataFrame =
    Coverage.mask(blocks, Seq("src_id"), "dest_id", "src_start", "src_end",
      minAligned, pMinAligned, sourceOnly, indelCut)

  /** The inverse store: dest becomes src (pygr `__invert__`,
    * `cnestedlist.pyx:2041-2047`). Orientation is preserved; for
    * ori=-1 blocks the dest axis runs backwards, which stays encoded
    * in `dest_ori` after the swap.
    */
  def inverse: AlignmentStore =
    new AlignmentStore(blocks.select(
      col("dest_id").as("src_id"),
      col("dest_start").as("src_start"), col("dest_end").as("src_end"),
      col("src_id").as("dest_id"),
      col("src_start").as("dest_start"), col("src_end").as("dest_end"),
      col("dest_ori"), col("block_id")))

  /** Persist bucketed+sorted so slices prune on (src_id, src_start)
    * row-group stats (replaces the NCList binary files,
    * `intervaldb.c:667-816`; SURVEY.md S9).
    */
  def persist(path: String, buckets: Int = 64): Unit =
    blocks.repartitionByRange(buckets, col("src_id"), col("src_start"))
      .sortWithinPartitions("src_id", "src_start")
      .write.mode("overwrite").parquet(path)
}

object AlignmentStore {

  /** Ladder depth for the multi-resolution fallback: the smallest
    * level count whose coarsest width (width · 16^(levels−1)) covers
    * `maxSpan`, floored at the historical 4 and capped at 8. Each
    * extra level costs every interval ≤ 2 more exploded rows, so the
    * depth follows the measured max span instead of a fixed constant
    * (ADVICE r16). The shift is overflow-guarded (ADVICE r17): for a
    * very large width the unguarded product wraps negative, which
    * would deepen the ladder to 8 and make `binnedMulti`'s
    * `multiplyExact` throw at plan time where the historical fixed
    * levels=4 planned fine — a coarsest width past Long.MaxValue
    * already covers any representable span, so stop deepening there.
    */
  private[graft] def ladderLevels(width: Long, maxSpan: Long): Int = {
    var l = 4
    while (l < 8 && width <= (Long.MaxValue >> (4 * (l - 1))) &&
           width * (1L << (4 * (l - 1))) < maxSpan) l += 1
    l
  }

  /** Auto-path threshold: max average build rows per src key for the
    * indexed join (a per-key interval index at ~50 B/row ≈ 200 MB at
    * this cap — comfortably inside an executor task's heap share).
    */
  val MaxIndexedKeyRows: Long = 4L * 1000 * 1000

  /** Auto-placement threshold for [[AlignmentStore.slice2hopMerged]]:
    * the merge runs map-side when the store averages at least this
    * many blocks per (src, dest, ori) lane. Sits between the measured
    * regimes with >2× margin on both sides: many-sequence stores hold
    * 1.3-1.4 at every v2 SF (map-side there spills 36 GB at v2sf5 —
    * DRIFT_r15 §1), genome-shaped stores 18.9 at v2sf1 / 94.7 at
    * v2sf5 (map-side there collapses the pair mass 104×). A store
    * near the threshold has little collapse to win and little state
    * to fear — either placement is fine by measurement, so the exact
    * cut is not load-bearing.
    */
  val MinMapSideMergeLaneRows: Double = 4.0

  /** Build from coordinate pairs (pygr `CoordsToIntervals` ingest,
    * `nlmsa_utils.py:465-530`; SURVEY.md S7). `bidirectional` stores
    * the mirrored rows too, like `BuildMSASlice.__iadd__`
    * (`nlmsa_utils.py:313-355`).
    */
  def fromCoords(spark: SparkSession,
                 coords: Seq[((String, Long, Long), (String, Long, Long, Int))],
                 bidirectional: Boolean = true): AlignmentStore = {
    import spark.implicits._
    val fwd = coords.zipWithIndex.map { case (((si, ss, se), (di, ds, de, ori)), i) =>
      AlignBlock(si, ss, se, di, ds, de, ori, i.toLong)
    }
    val rows = if (bidirectional)
      fwd ++ fwd.map(b => b.copy(
        src_id = b.dest_id, src_start = b.dest_start, src_end = b.dest_end,
        dest_id = b.src_id, dest_start = b.src_start, dest_end = b.src_end))
    else fwd
    new AlignmentStore(rows.toDF())
  }

  def load(spark: SparkSession, path: String): AlignmentStore =
    new AlignmentStore(spark.read.parquet(path))

  /** The composed external-aligner pipeline — pygr's `BlastMapping`
    * as ONE operator (`blast.py:86-221`, `__call__` at
    * `blast.py:205-221`): query sequences stream as FASTA into the
    * aligner command's stdin, its text report streams back out, and
    * the report's HSPs land as ungapped 1:1 alignment blocks — query
    * ids flow through the report (`Query=` lines) so output
    * re-associates with input with no driver round-trip.
    *
    * Scale design: one aligner process per PARTITION; both directions
    * are lazy (`RDD.pipe` writer thread + stdout iterator feeding the
    * streaming `BlastText.parseRunLines` state machine), so task heap
    * holds one HSP at a time regardless of report size. `block_id` is
    * made unique across partitions by the task's partition id.
    *
    * `seqs` must have columns (`seq_id`, `seq`).
    *
    * `maskCmd`, when set, runs the megablast repeat-mask PRE-stage
    * (pygr `repeat_mask`, `blast.py:120-143`, composed by
    * `MegablastMapping.__call__`, `blast.py:392-411`): sequences pass
    * through `repeatMask(seqs, maskCmd)` first, so the aligner sees
    * repeats soft-masked to lowercase (the reference runs megablast
    * with `-U T` — lowercase-aware seeding — on RepeatMasker -xsmall
    * output). Parsing is mask-agnostic: HSP coordinates reference the
    * same positions whether the letters are upper or lower case.
    */
  def fromBlast(spark: SparkSession, seqs: DataFrame,
                cmd: Seq[String],
                maskCmd: Option[Seq[String]] = None): AlignmentStore = {
    import spark.implicits._
    val fed = maskCmd.map(mc => repeatMask(seqs, mc)).getOrElse(seqs)
    val blocks = fed.select("seq_id", "seq").rdd
      .flatMap(r => Iterator(">" + r.getString(0), r.getString(1)))
      .pipe(cmd)
      .mapPartitions { lines =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        BlastText.parseRunLines(lines).map { r =>
          // block_id uniqueness is load-bearing downstream (columns /
          // letterEdges group by it) — fail loudly rather than let a
          // gappy alignment bleed run_no into the hsp_no bits.
          require(r.run_no >= 0 && r.run_no < (1L << 10),
            s"fromBlast: HSP with ${r.run_no + 1} ungapped runs exceeds the " +
              "1024-run block_id field; raise the field width for this input")
          require(r.hsp_no >= 0 && r.hsp_no < (1L << 30),
            s"fromBlast: partition with ${r.hsp_no + 1} HSPs exceeds the " +
              "2^30 block_id field; repartition the input finer")
          AlignBlock(r.query_id, r.q_start, r.q_end,
            r.hit_id, r.s_start, r.s_end, r.ori,
            (pid << 40) | (r.hsp_no << 10) | r.run_no)
        }
      }
      .toDF()
    new AlignmentStore(blocks)
  }

  /** The repeat-mask stage itself (pygr `repeat_mask`,
    * `blast.py:120-143`): stream sequences UPPERCASED as FASTA through
    * an external soft-masker (RepeatMasker `-xsmall` in the reference)
    * and read back the same records with repeats in lowercase. One
    * masker process per partition, both directions lazy — the same
    * pipe shape as the aligner stage, so the two compose into a
    * single pass with no driver round-trip.
    *
    * The masker must echo every record (same ids, any line wrapping)
    * — the read-back folds wrapped sequence lines per record, like
    * the reference's `read_fasta` of the `.masked` file.
    */
  def repeatMask(seqs: DataFrame, maskCmd: Seq[String]): DataFrame = {
    import seqs.sparkSession.implicits._
    seqs.select("seq_id", "seq").rdd
      .flatMap(r => Iterator(
        ">" + r.getString(0),
        r.getString(1).toUpperCase(java.util.Locale.ROOT)))
      .pipe(maskCmd)
      .mapPartitions { lines =>
        new Iterator[(String, String)] {
          private val in = lines.buffered
          private def skipToHeader(): Unit =
            while (in.hasNext && !in.head.startsWith(">")) in.next()
          def hasNext: Boolean = { skipToHeader(); in.hasNext }
          def next(): (String, String) = {
            skipToHeader()
            val id = in.next().drop(1).takeWhile(!_.isWhitespace)
            val sb = new StringBuilder
            while (in.hasNext && !in.head.startsWith(">")) sb ++= in.next().trim
            (id, sb.toString)
          }
        }
      }
      .toDF("seq_id", "seq")
  }
}
