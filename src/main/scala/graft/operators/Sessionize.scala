package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-rule interval grouping — the "horizontal group-by" of the
  * reference (`groupByIntervals`, pygr `cnestedlist.pyx:722-845`;
  * SURVEY.md §2.4 A2): sort a key's intervals by start and merge
  * neighbours while the gap stays within `maxGap`.
  *
  * Spark shape: classic sessionization — running max of previous ends
  * per key, a break flag when the gap rule fails, cumulative sum of
  * break flags as the session id. One shuffle on the keys; all window
  * work stays within partitions.
  */
/** The full merge-rule knob set of the reference's `groupByIntervals`
  * (`cnestedlist.pyx:722-845`):
  *  - maxGap: longest source-axis gap allowed within a region
  *    (`current.start - previous.end`);
  *  - maxInsert / minInsert: bounds on the dest-axis gap
  *    (`current.target_start - previous.target_end`); negative
  *    minInsert allows overlap/cycles;
  *  - maxSize: upper bound on the merged region's length on EITHER
  *    axis, measured from the region's first member;
  *  - mergeAll: merge unconditionally, ignoring every rule.
  */
case class GapRule(maxGap: Long = 0L, maxInsert: Long = 0L,
                   minInsert: Long = 0L, maxSize: Long = Long.MaxValue,
                   mergeAll: Boolean = false)

object GapRule {
  /** The reference's `mergeMost` preset ("be reasonable: don't merge a
    * whole chromosome", `cnestedlist.pyx:752-756`). */
  val mergeMost: GapRule = GapRule(10000L, 10000L, -10L, 50000L)
}

object Sessionize {

  /** Tag each row with a `session` id (0-based per key group). */
  def tag(df: DataFrame, keys: Seq[String], start: String, end: String,
          maxGap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(start), col(end))
    val prevMaxEnd = max(col(end)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__brk",
        when(prevMaxEnd.isNull || col(start) > prevMaxEnd + maxGap, 1L).otherwise(0L))
      .withColumn("session",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("__brk")
  }

  /** The `ivalMethod` escape hatch of the reference's
    * `groupByIntervals` (`cnestedlist.pyx:745-747,806-810`: "a
    * function to process the list of intervals ... it can merge or
    * split them in any way it wants"), Spark-shaped: the caller
    * supplies the BREAK predicate as a function of the per-key scan
    * window (use `lag(...).over(w)` etc. against any columns), and
    * gets back rows tagged with the resulting `session` id. The
    * predicate must evaluate true on each key's first row (lag is
    * null there). All built-in rule paths are expressible through
    * this hook; it exists for the ones that aren't.
    */
  def tagWith(df: DataFrame, keys: Seq[String], ord: Seq[Column],
              brk: org.apache.spark.sql.expressions.WindowSpec => Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__brk", when(brk(w), 1L).otherwise(0L))
      .withColumn("session",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("__brk")
  }

  /** Merge each key's intervals into sessions: one row per session with
    * bounds and member count (pygr's merged interval + its
    * `matchIntervals` cardinality).
    */
  def merge(df: DataFrame, keys: Seq[String], start: String, end: String,
            maxGap: Long): DataFrame =
    tag(df, keys, start, end, maxGap)
      .groupBy((keys :+ "session").map(col): _*)
      .agg(min(col(start)).as("session_start"),
           max(col(end)).as("session_end"),
           count(lit(1)).as("n_members"))

  /** Tag two-axis interval rows with a `session` id under the FULL
    * gap-rule set (`cnestedlist.pyx:812-845`): scanning each key
    * lane in (start, end, destStart, destEnd) order, a new region
    * opens when `mergeAll` is off and the source gap, the dest-axis
    * insert, or the merged size on either axis violates the rule.
    *
    * Physical strategy: the gap/insert rules compare only against the
    * immediately preceding row, so without `maxSize` the tag is a
    * lag() window + cumulative sum — whole-stage codegen, one shuffle.
    * `maxSize` measures from the region's FIRST member, making the
    * scan sequentially dependent; that path shuffles once on the lane
    * keys and streams each sorted partition (secondary-sort scan), so
    * no lane is ever materialized in memory.
    */
  def tagRule(df: DataFrame, keys: Seq[String],
              start: String, end: String, destStart: String, destEnd: String,
              rule: GapRule): DataFrame = {
    val ord = Seq(col(start), col(end), col(destStart), col(destEnd))
    if (rule.mergeAll || rule.maxSize == Long.MaxValue) {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      val pe = lag(col(end), 1).over(w)
      val pde = lag(col(destEnd), 1).over(w)
      val gapBrk =
        if (rule.mergeAll) lit(false)
        else (col(start) - pe > rule.maxGap) ||
          (col(destStart) - pde > rule.maxInsert) ||
          (col(destStart) - pde < rule.minInsert)
      df.withColumn("__brk", when(pe.isNull || gapBrk, 1L).otherwise(0L))
        .withColumn("session",
          sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
        .drop("__brk")
    } else {
      val sortCols = keys.map(col) ++ ord
      val sorted = df.repartition(keys.map(col): _*).sortWithinPartitions(sortCols: _*)
      val schema = df.schema
      val outSchema = schema.add("session", org.apache.spark.sql.types.LongType)
      val kIdx = keys.map(schema.fieldIndex)
      val Seq(sI, eI, dsI, deI) =
        Seq(start, end, destStart, destEnd).map(schema.fieldIndex)
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      sorted.mapPartitions { rows =>
        var lane: Seq[Any] = null
        var session = -1L
        // region-start coords on both axes + previous member's ends
        var rs = 0L; var rds = 0L; var pe = 0L; var pde = 0L
        rows.map { r =>
          val k = kIdx.map(r.get)
          val s = r.getLong(sI); val e = r.getLong(eI)
          val ds = r.getLong(dsI); val de = r.getLong(deI)
          val fresh = lane == null || k != lane
          val brk = fresh ||
            s - pe > rule.maxGap ||
            ds - pde > rule.maxInsert || ds - pde < rule.minInsert ||
            e - rs > rule.maxSize || de - rds > rule.maxSize
          if (fresh) { lane = k; session = -1L }
          if (brk) { session += 1L; rs = s; rds = ds }
          pe = e; pde = de
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ session)
        }
      }(enc)
    }
  }

  /** Gap-rule region merge: one row per (keys, session) with faithful
    * reference bounds — region start coords come from the FIRST member
    * and end coords from the LAST member in scan order (the reference
    * keeps `l[n][0]/l[n][2]` fixed and overwrites `l[n][1]/l[n][3]`,
    * `cnestedlist.pyx:826-845`), which differs from min/max when a
    * negative insert lets the dest axis run backwards.
    */
  def mergeRule(df: DataFrame, keys: Seq[String],
                start: String, end: String, destStart: String, destEnd: String,
                rule: GapRule): DataFrame = {
    val tagged = tagRule(df, keys, start, end, destStart, destEnd, rule)
    val ord = struct(col(start), col(end), col(destStart), col(destEnd))
    tagged.groupBy((keys :+ "session").map(col): _*)
      .agg(min(col(start)).as("session_start"),
           max_by(col(end), ord).as("session_end"),
           min_by(col(destStart), ord).as("session_dest_start"),
           max_by(col(destEnd), ord).as("session_dest_end"),
           count(lit(1)).as("n_members"))
  }
}
