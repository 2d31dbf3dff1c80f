package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table access for the graft engine.
  *
  * Conventions (see SURVEY.md §7):
  *  - shuffle partitions sized for the local[32] harness; on a real
  *    cluster this is overridden by spark.sql.shuffle.partitions /AQE.
  *  - AQE on: runtime coalescing + skew-join handling is our first
  *    line of defense at 100TB.
  */
object Graft {

  def session(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long once,
      // globally, instead of per-query conf mutation
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // iterative GraphX (connected components) checkpoints every 10
      // Pregel rounds so deep components don't accumulate unbounded
      // lineage (recomputed in full on executor loss at scale)
      .config("spark.graphx.pregel.checkpointInterval", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one of the driver-generated tables from a scale-factor dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
