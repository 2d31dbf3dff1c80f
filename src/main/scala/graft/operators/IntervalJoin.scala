package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Intervals

/** Distributed interval-overlap join — the Spark re-expression of the
  * reference's nested-containment-list query (pygr `intervaldb.c:413-665`,
  * `cnestedlist.pyx:446-543`; see SURVEY.md §2.3 J1/J2).
  *
  * Two strategies:
  *
  *  - `rangeJoin`: equi-join on the partition keys with the overlap
  *    range predicate attached. Catalyst executes it as a hash /
  *    sort-merge join on the keys and post-filters the range — fine
  *    when keys are selective (many distinct seq ids / users).
  *
  *  - `binned`: both sides are mapped onto fixed-width coordinate bins
  *    (intervals explode to every bin they touch; points land in one),
  *    and the join runs equi on (keys..., bin). This bounds the rows
  *    compared per task by bin population, not by key population —
  *    the strategy that survives 100TB with few, huge keys (a genome
  *    has ~25 chromosomes; a shuffle keyed only on chromosome would
  *    put 1/25th of the data in one task). Duplicate (a,b) matches
  *    from shared bins are eliminated by keeping only the bin that
  *    owns `greatest(aStart, bStart)` — each matching pair survives
  *    in exactly one bin, no distinct/shuffle needed.
  *
  * Both sides keep their own column names; callers ensure no clashes
  * outside the shared key columns.
  */
object IntervalJoin {

  /** Overlap join with the range predicate piggybacked on the key join. */
  def rangeJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
                aStart: String, aEnd: String,
                bStart: String, bEnd: String): DataFrame = {
    val cond = keys.map(k => a(k) === b(k)).reduce(_ && _) &&
      Intervals.overlaps(a(aStart), a(aEnd), b(bStart), b(bEnd))
    keys.foldLeft(a.join(b, cond))((df, k) => df.drop(b(k)))
  }

  /** Binned interval×interval overlap join (the 100TB path). */
  def binned(a: DataFrame, b: DataFrame, keys: Seq[String],
             aStart: String, aEnd: String,
             bStart: String, bEnd: String,
             binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val ab = explodeBins(a, aStart, aEnd, binWidth)
    val bb = explodeBins(b, bStart, bEnd, binWidth)
    val joinCols = keys :+ "__bin"
    ab.join(bb, joinCols)
      .where(Intervals.overlaps(col(aStart), col(aEnd), col(bStart), col(bEnd)))
      // each pair matches once: in the bin containing the later start
      .where(col("__bin") === pfloor(greatest(col(aStart), col(bStart)), binWidth))
      .drop("__bin")
  }

  /** Multi-resolution binned overlap join — the long-interval-safe
    * form of [[binned]] (the containment case pygr's NCList sublist
    * hoist exists for, `intervaldb.c:222-306`: a whole-chromosome
    * annotation must not explode into every fine bin on the axis).
    *
    * Levels l = 0..levels-1 carry bin width `binWidth * fanout^l`.
    * Each interval OWNS the smallest level whose width ≥ its length —
    * it touches ≤ 2 bins there — and additionally emits its (≤ 2)
    * covering bins at every COARSER level, so an interval costs at
    * most `2·levels` exploded rows REGARDLESS of length (only spans
    * longer than the coarsest width still walk bins, at the coarsest
    * resolution). Two overlapping intervals always share a bin at the
    * coarser of their two own levels: the point
    * `g = greatest(aStart, bStart)` lies inside both (half-open
    * overlap), so `bin(g)` at that level is emitted by both sides.
    * The join runs equi on (keys…, level, bin); each matching pair
    * survives exactly once — at level `max(ownA, ownB)` in `bin(g)` —
    * no distinct/shuffle needed (same dedup idea as [[binned]], lifted
    * to two dimensions).
    *
    * vs [[binned]]: identical results, identical single-level plan
    * when every interval is short; choose `binned` only when lengths
    * are known ≲ binWidth. fanout/levels trade replication (2·levels
    * rows) against collision (spans ≫ coarsest width): defaults cover
    * binWidth..4096·binWidth, enough for "whole axis" fixtures and
    * genome-scale containment alike.
    */
  def binnedMulti(a: DataFrame, b: DataFrame, keys: Seq[String],
                  aStart: String, aEnd: String,
                  bStart: String, bEnd: String,
                  binWidth: Long, fanout: Int = 16, levels: Int = 4): DataFrame = {
    require(binWidth > 0 && fanout > 1 && levels >= 1)
    val widths = Array.iterate(binWidth, levels)(w => math.multiplyExact(w, fanout.toLong))
    val ab = explodeLevels(a, aStart, aEnd, widths, "__la")
    val bb = explodeLevels(b, bStart, bEnd, widths, "__lb")
    val wAtLvl = element_at(array(widths.map(lit): _*), col("__lvl") + 1)
    ab.join(bb, keys ++ Seq("__lvl", "__bin"))
      .where(Intervals.overlaps(col(aStart), col(aEnd), col(bStart), col(bEnd)))
      // exactly-once: the coarser of the two own levels…
      .where(col("__lvl") === greatest(col("__la"), col("__lb")))
      // …in the bin containing the later start
      .where(col("__bin") ===
        floor(greatest(col(aStart), col(bStart)) / wAtLvl).cast("long"))
      .drop("__lvl", "__bin", "__la", "__lb")
  }

  /** Per-level bin explosion for [[binnedMulti]]: `ownCol` = smallest
    * level whose width ≥ the interval's length (capped at the
    * coarsest); rows exploded for every level ≥ own with the bins the
    * interval touches at that level's width.
    */
  private[operators] def explodeLevels(df: DataFrame, s: String, e: String,
                            widths: Array[Long], ownCol: String): DataFrame = {
    val len = col(e) - col(s)
    val own = widths.indices.init.foldRight(lit(widths.length - 1): Column) {
      (l, acc) => when(len <= widths(l), lit(l)).otherwise(acc)
    }
    val wAtLvl = element_at(array(widths.map(lit): _*), col("__lvl") + 1)
    df.withColumn(ownCol, own)
      .withColumn("__lvl", explode(sequence(col(ownCol), lit(widths.length - 1))))
      .withColumn("__bin",
        explode(sequence(floor(col(s) / wAtLvl).cast("long"),
                         floor((col(e) - lit(1L)) / wAtLvl).cast("long"))))
  }

  /** Binned interval×point join: point tables carry one coordinate, so
    * each point lands in exactly one bin and no dedup pass is needed.
    */
  def binnedPoints(intervals: DataFrame, points: DataFrame, keys: Seq[String],
                   iStart: String, iEnd: String, p: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val ib = explodeBins(intervals, iStart, iEnd, binWidth)
    val pb = points.withColumn("__bin", pfloor(col(p), binWidth))
    val joinCols = keys :+ "__bin"
    ib.join(pb, joinCols)
      .where(Intervals.containsPoint(col(iStart), col(iEnd), col(p)))
      .drop("__bin")
  }

  /** Broadcast-index interval×point join: build one `IntervalIndex`
    * per key from the interval side, broadcast the map, and probe it
    * per point row inside mapPartitions — O(log n + k) per probe, no
    * explode, no shuffle of the point side. The right tool when the
    * interval store fits in a broadcast (the reference's whole design
    * point: an indexed store probed by queries); for large-large
    * cases use `binned`.
    *
    * The per-key indexes are built EXECUTOR-side (shuffle the
    * interval rows by key, build each key's index inside its task)
    * and only the finished indexes are collected for the broadcast —
    * a 10⁵-key store builds across the cluster instead of
    * serializing through one driver core.
    *
    * intervals: (key, iStart, iEnd, ival_id LONG); points: any rows
    * with (key, p). Output: point row columns + ival_id.
    */
  def broadcastIndexJoin(intervals: DataFrame, points: DataFrame,
                         key: String, iStart: String, iEnd: String,
                         ivalId: String, p: String): DataFrame = {
    val spark = points.sparkSession
    val perKey: Map[Any, (IntervalIndex, Array[Long])] = intervals
      .select(col(key), col(iStart), col(iEnd), col(ivalId))
      .rdd
      .map(r => (r.get(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupByKey()
      .map { case (k, ivals) =>
        val arr = ivals.toArray
        val ids = arr.map(_._3)
        val idx = IntervalIndex.build(
          arr.iterator.zipWithIndex.map { case ((s, e, _), i) => (s, e, i) }.toSeq)
        k -> (idx, ids)
      }
      .collect()
      .toMap
    val bc = spark.sparkContext.broadcast(perKey)
    val inSchema = points.schema
    val outSchema = inSchema.add(ivalId, org.apache.spark.sql.types.LongType)
    val keyIdx = inSchema.fieldIndex(key)
    val pIdx = inSchema.fieldIndex(p)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    points.mapPartitions { rows =>
      rows.flatMap { r =>
        bc.value.get(r.get(keyIdx)) match {
          case Some((idx, ids)) =>
            val pv = r.getLong(pIdx)
            idx.query(pv, pv + 1).map { i =>
              org.apache.spark.sql.Row.fromSeq(r.toSeq :+ ids(i))
            }
          case None => Iterator.empty
        }
      }
    }(enc)
  }

  /** Shuffled per-partition index join — the custom-physical-operator
    * path (graft's `IndexedIntervalJoin` LogicalPlan → SparkStrategy
    * → SparkPlan): both sides hash-cluster on `key`, each task builds
    * an `IntervalIndex` per key over its interval slice and probes it
    * with its point rows. No broadcast size limit (unlike
    * `broadcastIndexJoin`) and no bin-width tuning or interval row
    * multiplication (unlike `binnedPoints`) — the large-large path
    * when keys are plentiful. Output: interval columns ++ point
    * columns (caller ensures the non-key names are distinct).
    */
  def shuffledIndexJoin(intervals: DataFrame, points: DataFrame,
                        key: String, iStart: String, iEnd: String,
                        p: String): DataFrame =
    buildIndexedJoin(intervals, points, key, iStart, iEnd,
      (pPlan, _) => {
        val pa = resolveAttr(pPlan, p)
        (pa, org.apache.spark.sql.catalyst.expressions.Add(pa,
          org.apache.spark.sql.catalyst.expressions.Literal(1L)))
      })

  /** Interval×interval form of the custom physical operator: each
    * task's per-key index answers range probes [oStart, oEnd) —
    * large-large overlap joins without bin-width tuning or row
    * multiplication. Build the index over the SMALLER side.
    */
  def shuffledIndexIntervalJoin(intervals: DataFrame, other: DataFrame,
                                key: String, iStart: String, iEnd: String,
                                oStart: String, oEnd: String): DataFrame =
    shuffledIndexIntervalJoin(intervals, other, key, iStart, iEnd,
      key, oStart, oEnd)

  /** Variant with differently-named key columns on the two sides
    * (avoids a duplicate output column when both sides call the key
    * the same thing and the caller needs both).
    */
  def shuffledIndexIntervalJoin(intervals: DataFrame, other: DataFrame,
                                iKey: String, iStart: String, iEnd: String,
                                oKey: String, oStart: String, oEnd: String): DataFrame =
    buildIndexedJoin(intervals, other, iKey, iStart, iEnd,
      (pPlan, _) => (resolveAttr(pPlan, oStart), resolveAttr(pPlan, oEnd)),
      probeKey = oKey)

  private def resolveAttr(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      n: String): org.apache.spark.sql.catalyst.expressions.Attribute =
    plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found in ${plan.output}"))

  private def buildIndexedJoin(
      intervals: DataFrame, probes: DataFrame,
      key: String, iStart: String, iEnd: String,
      probeRange: (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                   org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =>
        (org.apache.spark.sql.catalyst.expressions.Expression,
         org.apache.spark.sql.catalyst.expressions.Expression),
      probeKey: String = null): DataFrame = {
    val spark = probes.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.IndexedIntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.IndexedIntervalJoinStrategy
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val iPlan = ColumnBridge.analyzed(intervals)
    val pPlan = ColumnBridge.analyzed(probes)
    val (ps, pe) = probeRange(pPlan, iPlan)
    ColumnBridge.ofRows(spark, graft.plans.IndexedIntervalJoin(
      iPlan, pPlan,
      resolveAttr(iPlan, key), resolveAttr(iPlan, iStart), resolveAttr(iPlan, iEnd),
      resolveAttr(pPlan, Option(probeKey).getOrElse(key)), ps, pe))
  }

  private def pfloor(c: Column, w: Long): Column = floor(c / w).cast("long")

  private def explodeBins(df: DataFrame, s: String, e: String, w: Long): DataFrame =
    df.withColumn(
      "__bin",
      explode(sequence(pfloor(col(s), w),
                       pfloor(col(e) - lit(1L), w))))
}
