package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line coverage — the "vertical group-by" of the reference
  * (`groupBySequences`, pygr `cnestedlist.pyx:899-1008`; SURVEY.md
  * §2.4 A3): explode interval boundaries into ±1 events, scan each
  * key's axis accumulating depth, and derive per-segment coverage.
  *
  * Half-open [start,end) semantics: an end at position p closes
  * BEFORE a start at p opens, which the per-position pre-aggregation
  * handles by summing deltas at equal positions first.
  */
object Coverage {

  /** Per-key coverage segments: (keys..., pos, next_pos, depth) where
    * depth holds on [pos, next_pos). The final boundary row (depth
    * back to 0, no next) is dropped.
    */
  def segments(df: DataFrame, keys: Seq[String], start: String, end: String): DataFrame = {
    val k = keys.map(col)
    val events = df
      .select(k :+ explode(array(
        struct(col(start).as("pos"), lit(1L).as("delta")),
        struct(col(end).as("pos"), lit(-1L).as("delta")))).as("ev"): _*)
      .select(k :+ col("ev.pos").as("pos") :+ col("ev.delta").as("delta"): _*)
      .groupBy(k :+ col("pos"): _*)
      .agg(sum(col("delta")).as("delta"))
    val w = Window.partitionBy(k: _*).orderBy(col("pos"))
    events
      .withColumn("depth", sum(col("delta")).over(w))
      .withColumn("next_pos", lead(col("pos"), 1).over(w))
      .where(col("next_pos").isNotNull)
      .drop("delta")
  }

  /** Per-key stats: max overlap depth and total length covered by >=
    * minDepth intervals (the masking threshold of pygr's
    * `minAligned`, `cnestedlist.pyx:938-944`).
    */
  def stats(df: DataFrame, keys: Seq[String], start: String, end: String,
            minDepth: Long = 1L): DataFrame =
    segments(df, keys, start, end)
      .groupBy(keys.map(col): _*)
      .agg(max(col("depth")).as("max_depth"),
           sum(when(col("depth") >= minDepth, col("next_pos") - col("pos"))
                 .otherwise(0L)).as("covered"))

  /** Above-threshold mask regions with the FULL reference semantics
    * (`groupBySequences`, `cnestedlist.pyx:962-1002`): depth counts
    * distinct open LANES (the reference's `DictQueue` keys, not open
    * intervals — overlapping same-lane intervals are collapsed
    * first), a region is above threshold when `depth >= minAligned`
    * AND `depth / nLanes >= pMinAligned` (nLanes = distinct lanes in
    * the key group, float compare like the reference's
    * `f / len(seqs)`), and regions split at boundary positions where
    * the instantaneous depth AFTER stop events dips below threshold
    * (stop bounds sort before start bounds at equal positions —
    * touching intervals cause a real dip). With `indelCut`, regions
    * additionally split at bounds of any lane interval that is not
    * its lane's first (the reference's `isIndel` flag,
    * `cnestedlist.pyx:955-960,996-1000`).
    *
    * Output: (keys..., island, mask_start, mask_end), island 0-based
    * per key group in position order.
    *
    * The reference's `seqGroups` (analyze each group of sequences
    * separately, with `pMinAligned` fractions out of THAT group's
    * size) needs no extra machinery here: put the group assignment
    * in a column and include it in `keys` — both the sweep and the
    * distinct-lane denominator are computed per key group.
    */
  def maskRegions(df: DataFrame, keys: Seq[String], lane: String,
                  start: String, end: String,
                  minAligned: Long, pMinAligned: Double,
                  indelCut: Boolean = false): DataFrame = {
    val k = keys.map(col)
    val laneKeys = (keys :+ lane).map(col)
    val wl = Window.partitionBy(laneKeys: _*).orderBy(col(start), col(end))
    val prevMax = max(col(end)).over(wl.rowsBetween(Window.unboundedPreceding, -1))
    val lanes = df
      .withColumn("__brk", when(prevMax.isNull || col(start) >= prevMax, 1L).otherwise(0L))
      .withColumn("__grp",
        sum(col("__brk")).over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(laneKeys :+ col("__grp"): _*)
      .agg(min(col(start)).as("__s"), max(col(end)).as("__e"))
    // distinct-lane denominator: Catalyst prunes the collapse windows
    // out of this branch entirely (countDistinct only needs the lane
    // columns), leaving a second scan that reads just keys+lane —
    // narrower than sharing the wide sweep exchange would be
    val nseq = lanes.groupBy(k: _*).agg(countDistinct(col(lane)).as("__nseq"))
    val base = lanes.select(k :+ explode(array(
        struct(col("__s").as("pos"), lit(1L).as("delta"), lit(0L).as("stops"), lit(0L).as("cut")),
        struct(col("__e").as("pos"), lit(-1L).as("delta"), lit(1L).as("stops"), lit(0L).as("cut")))).as("ev"): _*)
      .select(k :+ col("ev.pos") :+ col("ev.delta") :+ col("ev.stops") :+ col("ev.cut"): _*)
    val events = if (!indelCut) base else {
      val cuts = df.withColumn("__rn", row_number().over(wl))
        .where(col("__rn") > 1)
        .select(k :+ explode(array(col(start), col(end))).as("pos"): _*)
        .select(k :+ col("pos") :+ lit(0L).as("delta") :+ lit(0L).as("stops") :+ lit(1L).as("cut"): _*)
      base.unionByName(cuts)
    }
    val w = Window.partitionBy(k: _*).orderBy("pos")
    val sc = events.groupBy(k :+ col("pos"): _*)
      .agg(sum("delta").as("delta"), sum("stops").as("stops"), max("cut").as("cut"))
      .withColumn("depth", sum(col("delta")).over(w))
      .withColumn("next_pos", lead(col("pos"), 1).over(w))
    def below(d: Column) =
      (d < minAligned) || (d.cast("double") / col("__nseq") < pMinAligned)
    val abv = sc.withColumn("prev_depth", lag(col("depth"), 1).over(w))
      .join(nseq, keys)
      .where(col("next_pos").isNotNull && !below(col("depth")))
    val dip = coalesce(col("prev_depth"), lit(0L)) - col("stops")
    val brk = lag(col("next_pos"), 1).over(w).isNull ||
      lag(col("next_pos"), 1).over(w) =!= col("pos") ||
      below(dip) || col("cut") === 1L
    abv
      .withColumn("__brk", when(brk, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .groupBy(k :+ col("island"): _*)
      .agg(min("pos").as("mask_start"), max("next_pos").as("mask_end"))
  }

  /** The reference's `groupBySequences` output modes: `sourceOnly`
    * returns the merged mask regions themselves; otherwise each input
    * lane interval is clipped to every mask region it overlaps
    * (`cnestedlist.pyx:968-995` emits per-interval truncated pairs).
    * `indelCut` applies in sourceOnly mode only, as in the reference.
    */
  def mask(df: DataFrame, keys: Seq[String], lane: String,
           start: String, end: String,
           minAligned: Long = 1L, pMinAligned: Double = 0.0,
           sourceOnly: Boolean = false, indelCut: Boolean = false): DataFrame = {
    val regions = maskRegions(df, keys, lane, start, end,
      minAligned, pMinAligned, indelCut && sourceOnly)
    if (sourceOnly) regions
    else IntervalJoin.rangeJoin(df, regions, keys, start, end, "mask_start", "mask_end")
      .withColumn("clip_start", greatest(col(start), col("mask_start")))
      .withColumn("clip_end", least(col(end), col("mask_end")))
  }
}
