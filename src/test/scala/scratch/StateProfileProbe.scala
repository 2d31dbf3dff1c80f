// debug tool: dump each streaming query's state-store provider and
// peak/last state rows. Test/runMain StateProfileProbe <sfDir>
object StateProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if name.startsWith("st")) {
      graft.streaming.StreamMeter.reset()
      try fn(s, dir).collect()
      catch { case e: Throwable => println(s"$name FAILED: $e") }
      for (o <- graft.streaming.StreamMeter.observations) {
        val p = o.provider.split("\\.").last
        println(f"$name%-28s $p%-34s peak=${o.peakRows}%-8d last=${o.lastRows}%-8d bytes=${o.lastBytes}")
      }
    }
    s.stop()
  }
}
