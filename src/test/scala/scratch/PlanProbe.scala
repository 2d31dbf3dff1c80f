// debug tool: print a query's executed plan. Run from the test
// classpath (Test/runMain scratch.PlanProbe <sfDir> <query>...).
object PlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanProbe <sfDir> <queryName>...")
    val dir = args.head
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    for (q <- args.tail) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
