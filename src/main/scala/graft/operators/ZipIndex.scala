package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global 0-based sequence position under a total order, computed the
  * way `RDD.zipWithIndex` does it but fully declaratively — and never
  * through a single-partition window (the classic
  * `row_number().over(Window.orderBy(...))` funnels the ENTIRE input
  * through one task; at 100 TB that is the whole corpus on one core).
  *
  * Shape: range-shuffle on the sort key → sort within partitions →
  * local index from `monotonically_increasing_id` (partition id in the
  * upper bits, a 0-based row counter in the lower 33) → global offset
  * per partition from a triangular self-join over the
  * numPartitions-row count table (tiny, broadcastable, no window, no
  * driver collect). Every stage is distributed; the only
  * all-partitions structure ever materialized is one row per shuffle
  * partition.
  */
object ZipIndex {

  /** Adds `posCol` = 0-based global position of each row ordered by
    * `sortKeys`.
    *
    * `sortKeys` MUST be a total order (include a unique tiebreaker):
    * the shuffled child is evaluated twice (once for the per-partition
    * counts, once for the final rows), and only a total order makes
    * both evaluations produce identical row orders — and therefore
    * identical ids. `numPartitions` is explicit for the same reason:
    * AQE must not coalesce the two evaluations differently.
    */
  def withPosition(df: DataFrame, sortKeys: Seq[Column], posCol: String,
                   numPartitions: Int = 32): DataFrame = {
    val withMid = df
      .repartitionByRange(numPartitions, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("__mid", monotonically_increasing_id())
    val parts = withMid
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__n"), min(col("__mid")).as("__base"))
    val offs = parts.as("a")
      .join(parts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"), col("a.__base").as("__base"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
    withMid.withColumn("__pid", shiftright(col("__mid"), 33))
      .join(broadcast(offs), "__pid")
      .withColumn(posCol, col("__off") + (col("__mid") - col("__base")))
      .drop("__mid", "__pid", "__base", "__off")
  }
}
