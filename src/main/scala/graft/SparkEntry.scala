package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query here
  * (over the driver-generated testdata tables) plus, where expressible,
  * an equivalent ANSI-SQL oracle the driver runs in DuckDB.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Relational.defs, Relational.oracle),
    (IntervalsQ.defs, IntervalsQ.oracle),
    (GraphQ.defs, GraphQ.oracle),
    (TextQ.defs, TextQ.oracle),
    (DedupQ.defs, DedupQ.oracle),
    (SeqQ.defs, SeqQ.oracle),
    (AlignFnQ.defs, AlignFnQ.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
