package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY.md §7.4 risk list): hot grouping
  * keys are split across `buckets` salt values, aggregated partially,
  * then re-aggregated without the salt. Works for any decomposable
  * aggregate supplied as (partial, final) column pairs; `saltedSum` /
  * `saltedCount` cover the common cases.
  *
  * Every salt here is DETERMINISTIC — derived from row content or a
  * caller-named column, never `rand()`/`monotonically_increasing_id()`.
  * A nondeterministic salt re-assigns rows to different reduce
  * partitions when a task retry or AQE replan recomputes part of the
  * salting stage, which double-counts or drops rows against the
  * surviving map outputs: exactly the failure mode salting exists to
  * survive at scale.
  */
object Salt {

  /** Deterministic content salt: hash of ALL the frame's columns mod
    * `buckets`. Rows with identical full content share a salt (a key
    * whose hot rows are byte-identical duplicates share a salt — if
    * that is the skew, dedup first). The same caveat applies to a
    * NARROW pre-projected frame with few distinct value combinations
    * per hot key: the content hash then lands on few salt buckets and
    * the skew relief degrades — pass an explicit `salt` expression
    * over a higher-cardinality source column in that case.
    * `hash` never returns null, and `pmod` keeps the range [0, b). */
  private def contentSalt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(buckets))

  /** Two-phase count per key group. Identical results to a direct
    * groupBy().count() — the salt only reshapes the shuffle.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets)(count(lit(1)).as("__pc"))(sum("__pc").as("n"))

  /** Two-phase sum of `valueCol` per key group. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets)(
      sum(valueCol).as("__ps"))(sum("__ps").as(s"sum_$valueCol"))

  /** General two-phase aggregate: `partial` runs per (keys, salt) group,
    * `final` re-combines per key with the salt dropped. Caller supplies
    * decomposable pairs (e.g. count → sum, sum → sum, min → min); any
    * aggregate whose merge is associative works. The hot key's rows land
    * in `buckets` shuffle partitions instead of one, so the reduce-side
    * skew ceiling drops by that factor while the result is bit-identical
    * to the unsalted groupBy (decimal/long partials are
    * order-independent). The default salt is the deterministic content
    * hash — stable under task retries and AQE replans; pass `salt`
    * (any deterministic data-derived expression, as `saltedJoin`
    * takes) when the frame is a narrow projection whose content hash
    * would collapse into few buckets.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int = 16,
                salt: Option[Column] = None)
               (partialAggs: Column*)(finalAggs: Column*): DataFrame = {
    require(partialAggs.nonEmpty && finalAggs.nonEmpty,
      "saltedAgg needs at least one partial and one final aggregate")
    df.withColumn("__salt",
        salt.map(s => pmod(coalesce(s.cast("int"), lit(0)), lit(buckets)))
          .getOrElse(contentSalt(df, buckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-safe equi-join: the (large, skewed) `fact` side carries a
    * deterministic salt derived from `saltExpr` (any data column — NOT a
    * random, so re-execution under task retry or AQE replans is stable;
    * NULL values coalesce to bucket 0 rather than silently dropping the
    * row from the equi-join); the `dim` side replicates each row across
    * all `buckets` salt values. Joining on keys :+ salt spreads a hot
    * join key's fact rows over `buckets` reduce tasks instead of one.
    * Row-for-row identical to `fact.join(dim, keys)`; cost is a
    * `buckets`× blow-up of the dim side's shuffle, the standard trade
    * for big-big skewed joins where the dim exceeds broadcast range
    * (when it fits, broadcast instead — salting a broadcastable dim is
    * pure overhead).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltExpr: Column, buckets: Int = 16): DataFrame = {
    val f = fact.withColumn("__salt",
      pmod(coalesce(saltExpr, lit(0)), lit(buckets)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}
