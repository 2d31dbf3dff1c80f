package graft.operators

import org.apache.spark.sql.DataFrame
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
}
