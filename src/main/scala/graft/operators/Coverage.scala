package graft.operators

import org.apache.spark.sql.DataFrame
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
}
