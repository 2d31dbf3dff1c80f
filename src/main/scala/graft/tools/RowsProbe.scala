package graft.tools

/** Output-cardinality probe: runs named [[graft.SparkEntry]] queries
  * against a fixture dir and prints their row counts — the
  * output-vs-plan attribution evidence for drift rows (an operator
  * whose OUTPUT grows superlinearly is output-driven; one whose
  * output is linear but CPU is not has a plan problem). Throwaway
  * diagnostics — not part of the library surface.
  *
  * Usage: runMain graft.tools.RowsProbe <sfDir> <query> [query...]
  */
object RowsProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RowsProbe <sfDir> <query> [query...]")
    val dir = args.head
    val spark = graft.core.Graft.session("rows-probe")
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[rows] $q%-28s rows=$n%12d  wall=$wall%8.2f s")
    }
    spark.stop()
  }
}
