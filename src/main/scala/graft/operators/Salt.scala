package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY.md §7.4 risk list): hot grouping
  * keys are split across `buckets` salt values, aggregated partially,
  * then re-aggregated without the salt. Works for any decomposable
  * aggregate supplied as (partial, final) column pairs; `saltedSum` /
  * `saltedCount` cover the common cases.
  */
object Salt {

  /** Two-phase count per key group. Identical results to a direct
    * groupBy().count() — the salt only reshapes the shuffle.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__pc"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__pc").as("n"))
  }

  /** Two-phase sum of `valueCol` per key group. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__ps"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__ps").as(s"sum_$valueCol"))
  }
}
