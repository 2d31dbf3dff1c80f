// debug tool: print session conf values the engine's ANSI-safety
// contract depends on. Test/runMain ConfProbe
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    println("ansi.enabled=" + s.conf.get("spark.sql.ansi.enabled"))
    // and what the empty-array element_at actually does here
    import org.apache.spark.sql.functions._
    val r = scala.util.Try(
      s.range(1).select(element_at(array().cast("array<long>"), 1)).collect()(0))
    println("element_at(empty,1) => " + r)
    s.stop()
  }
}
