// debug tool: j2b_twohop output rows and first-hop rows per SF dir —
// is the 1.38 CPU exponent output-driven?
object TwoHopCount {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val out = graft.SparkEntry.queries("j2b_twohop")(s, dir).count()
      val hop1 = graft.SparkEntry.queries("j2_slice_clip")(s, dir).count()
      println(s"$dir  j2b_rows=$out  j2_rows=$hop1")
    }
    s.stop()
  }
}
