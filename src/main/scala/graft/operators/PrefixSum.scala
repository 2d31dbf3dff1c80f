package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global running total of a long column under a total order — the
  * weighted generalization of [[ZipIndex]] (which is the special case
  * weight ≡ 1), and like it never a single-partition window: the
  * classic `sum(w).over(Window.orderBy(...))` funnels the ENTIRE
  * input through one task.
  *
  * Shape: range-shuffle on the sort key → sort within partitions →
  * one lightweight job summing each partition (a re-read of the
  * already-materialized shuffle output, not a recompute of the child
  * subtree) → per-partition offsets by exclusive scan on the driver
  * (numPartitions values — bytes, not data) → a second shuffle-file
  * re-read emitting each row's inclusive running total. The child
  * plan executes exactly once however expensive it is, and the
  * offsets are fixed at first materialization, so re-evaluating the
  * returned frame reproduces identical totals.
  *
  * The driving use is systematic / PPS sampling (c15): thresholds at
  * every `step = W/n` of cumulative weight pick rows proportional to
  * weight in one distributed pass.
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running total of `valueCol` (must be
    * LongType, e.g. an integer weight) over rows ordered by
    * `sortKeys`.
    *
    * `sortKeys` MUST be a total order (include a unique tiebreaker):
    * each pass re-sorts the shuffle files, and only a total order
    * makes every re-read produce the same row order — and therefore
    * the same running totals. `numPartitions` is pinned (AQE must
    * not re-plan the partitioning between the sum pass and the row
    * pass); the default 0 means "the session's
    * `spark.sql.shuffle.partitions`", so the operator inherits
    * cluster sizing instead of a harness constant. The per-partition
    * sum job runs EAGERLY at call time.
    */
  def withRunningTotal(df: DataFrame, sortKeys: Seq[Column],
                       valueCol: String, cumCol: String,
                       numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"PrefixSum: $valueCol must be LongType, got ${sorted.schema(vIdx).dataType}")
    val rdd = sorted.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = StructType(
      sorted.schema.fields :+ StructField(cumCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      it.map { r => cum += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ cum) }
    }
    sorted.sparkSession.createDataFrame(out, schema)
  }
}
