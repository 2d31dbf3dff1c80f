package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data layout — the
  * lakehouse clustering trick: sort the table by the bit-interleaving
  * of two (or more) filter columns so that ANY range predicate on
  * EITHER column touches few contiguous row groups, and parquet
  * min/max footer pruning skips the rest. One-dimensional sort keys
  * only prune the leading column; a z-order key prunes all
  * interleaved dimensions at once (Morton 1966; used by every modern
  * table format's OPTIMIZE ZORDER).
  *
  * The interleave is a pure bitwise expression (shift/and/or chains)
  * — whole-stage-codegen'd, no UDF, embarrassingly parallel — so at
  * 100 TB the only real cost of re-layout is the range-partitioned
  * sort the rewrite would do anyway.
  */
object ZOrder {

  /** Morton-interleave two non-negative ints truncated to `bits` bits
    * each: x occupies even bit positions, y odd. 2*bits <= 62.
    */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"ZOrder.interleave: bits in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite a table into z-order layout: range-partition on the
    * Morton key and sort within partitions, so every output file
    * covers one contiguous z-range = a small tile in (x, y) space —
    * parquet footer min/max on BOTH columns then prune range
    * predicates on either one. The only cluster-scale cost is the
    * range-partitioned sort a layout rewrite pays anyway; the key is
    * dropped on write.
    */
  def layout(df: org.apache.spark.sql.DataFrame, xCol: String, yCol: String,
             bits: Int, path: String, partitions: Int): Unit = {
    require(partitions >= 1, s"ZOrder.layout: partitions >= 1, got $partitions")
    val cols = df.columns.map(col)
    df.withColumn("__z", interleave(col(xCol), col(yCol), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .select(cols: _*) // projection preserves the sort; __z never hits disk
      .write.mode("overwrite").parquet(path)
  }

  /** The same interleave as ANSI SQL text (for the DuckDB oracle):
    * identical shift/mask arithmetic over column expressions `x`, `y`.
    */
  def interleaveSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"ZOrder.interleaveSql: bits in [1,31], got $bits")
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")
  }
}
