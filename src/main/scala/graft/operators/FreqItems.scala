package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Heavy hitters at 100 TB: a Misra-Gries summary (k counters) built
  * in ONE pass with `treeAggregate` — mergeable, bounded memory,
  * no shuffle — then an exact counting pass restricted to the
  * candidate set (a broadcast semi-join, not a full-vocab
  * aggregation). Misra-Gries guarantees every item with true
  * frequency > n/k survives the summary, so candidates ⊇ answers and
  * the exact pass makes the final result EXACT: items with
  * count · k > n. Classic two-pass frequent-items (Misra & Gries
  * 1982); this is the profile pass you run when the vocabulary
  * itself is too large to groupBy.
  */
object FreqItems {

  /** Merge-decrement a Misra-Gries summary with another, keeping at
    * most k counters (summing matches, then the standard subtract-
    * the-(k+1)-th-largest decrement).
    */
  private[operators] def mgMerge(k: Int, a: Map[String, Long],
                                 b: Map[String, Long]): Map[String, Long] = {
    val merged = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (merged.size <= k) merged
    else {
      val cut = merged.values.toSeq.sorted(Ordering[Long].reverse)(k)
      merged.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  /** Classic k-counter Misra-Gries over one element stream (mutable
    * map, O(1) amortized per element) — the per-partition kernel.
    */
  private[operators] def mgLocal(k: Int, it: Iterator[String]): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m(t) = c + 1L
        case None if m.size < k => m(t) = 1L
        case None =>
          m.keysIterator.toArray.foreach { key =>
            val c = m(key) - 1L
            if (c == 0L) m.remove(key) else m(key) = c
          }
      }
    }
    m.toMap
  }

  /** One-pass candidate summary over `column`: Misra-Gries per
    * partition, partition summaries tree-merged.
    */
  def summary(df: DataFrame, column: String, k: Int): Map[String, Long] = {
    require(k >= 1, s"FreqItems.summary: k >= 1, got $k")
    df.select(col(column).cast("string")).rdd
      .map(_.getString(0))
      .mapPartitions(it => Iterator(mgLocal(k, it)))
      .treeAggregate(Map.empty[String, Long])(mgMerge(k, _, _), mgMerge(k, _, _))
  }

  /** Exact heavy hitters: all items whose true count · k > n, as
    * (item, cnt). Pass 1 builds the MG candidate set; pass 2 counts
    * ONLY candidates exactly (broadcast membership filter — the
    * aggregation state is ≤ k entries regardless of vocabulary size)
    * and filters by the exact threshold.
    */
  def heavyHitters(df: DataFrame, column: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val cands = summary(df, column, k).keySet.toSeq
    val n = df.count()
    df.select(col(column).cast("string").as("item"))
      .where(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(k.toLong) > lit(n))
  }
}
