// debug tool: interleaved A/B of the c6 position-mask forms —
// interpreted filter-lambda vs the JoinExceptPositions kernel.
// Test/runMain scratch.MaskAB <sfDir> [reps]
object MaskAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("toks"))
      .cache()
    d.count()
    val cut = array((1 to 40).map(i => lit(i * 7L)): _*)
    val lam = md5(concat_ws(" ",
      filter(col("toks"), (t, i) => !array_contains(cut, (i + 1).cast("long")))))
    val ker = md5(graft.functions.JoinExceptPositions
      .join_except_positions(col("toks"), cut))
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime
      d.select(xxhash64(c).as("h")).agg(expr("bit_xor(h)").as("x")).collect()
      (System.nanoTime - t0) / 1e9
    }
    for (_ <- 1 to reps)
      println(f"lam ${time(lam)}%.3f  ker ${time(ker)}%.3f")
    s.stop()
  }
}
