// scratch: print t1_langid executed plan at sf0.001
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
