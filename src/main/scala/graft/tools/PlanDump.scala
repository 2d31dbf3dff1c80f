package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dumps `.explain("formatted")` for selected queries to
  * `<outDir>/<query>_<tag>.txt` — the plan evidence files the
  * optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [names]
  * `names` = comma-separated substrings (default: all queries).
  * NOTE: constructing a query's DataFrame runs its harness-side work
  * (streaming replays, catalog setup), so a full dump executes those;
  * plans are still the BATCH plan of the returned frame.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only = if (args.length > 3) args(3).split(",").toSeq else Nil
    def wanted(n: String) = only.isEmpty || only.exists(n.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).filter(kv => wanted(kv._1))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          System.err.println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
