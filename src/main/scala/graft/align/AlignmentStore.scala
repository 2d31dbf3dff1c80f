package graft.align

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Intervals
import graft.operators.{Coverage, IntervalJoin, Sessionize}

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

  /** msa[ival] for a whole DataFrame of query intervals at once —
    * hop+clip semantics of `NLMSASlice.__new__`
    * (`cnestedlist.pyx:446-543` steps 2-4): overlap join on the src
    * axis, clip hits to the query window, shift dest coordinates to
    * match the clip, orientation-aware.
    */
  def slice(queries: DataFrame, binWidth: Long = 1 << 16): DataFrame = {
    val joined = IntervalJoin.binned(
      blocks, queries, Seq("src_id"),
      "src_start", "src_end", "q_start", "q_end", binWidth)
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

  /** Per-target bounds of a slice result (`mergeSeq`,
    * `cnestedlist.pyx:324-347`; SURVEY.md A1).
    */
  def mergeSeq(sliced: DataFrame): DataFrame =
    sliced.groupBy("q_id", "dest_id", "dest_ori")
      .agg(min("src_start").as("src_start"), max("src_end").as("src_end"),
           min("dest_start").as("dest_start"), max("dest_end").as("dest_end"),
           count(lit(1)).as("n_blocks"))

  /** Gap-rule merging of blocks per (src,dest,ori) lane
    * (`groupByIntervals`, `cnestedlist.pyx:722-845`; SURVEY.md A2).
    */
  def groupByIntervals(maxGap: Long): DataFrame =
    Sessionize.merge(blocks, Seq("src_id", "dest_id", "dest_ori"),
                     "src_start", "src_end", maxGap)

  /** Coverage masking over the src axis (`groupBySequences`,
    * `cnestedlist.pyx:899-1008`; SURVEY.md A3): regions of each src
    * sequence covered by >= minAligned target blocks.
    */
  def groupBySequences(minAligned: Long): DataFrame =
    Coverage.stats(blocks, Seq("src_id"), "src_start", "src_end", minAligned)

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
}
