package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** DotProduct: the native codegen expression must be BIT-IDENTICAL to
  * the `aggregate(zip_with(…))` fold it replaced — every embedding
  * oracle hash depends on that. Parity is checked via
  * java.lang.Double.doubleToLongBits (not ===, which would pass on
  * close-but-different floats), over random data and the null/shape
  * edge cases.
  */
class DotProductSpec extends SparkSuite {

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  test("bit-exact parity with the fold on random float vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val n = 1 + rnd.nextInt(96)
      (Array.fill(n)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(7) - 3).toFloat),
        Array.fill(n)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(7) - 3).toFloat))
    }
    val df = rows.toDF("a", "b")
      .select(DotProduct.dot_product(col("a").cast("array<double>"),
        col("b").cast("array<double>")).as("native"),
        fold(col("a"), col("b")).as("folded"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit drift: native=${r.getDouble(0)} fold=${r.getDouble(1)}")
    }
  }

  test("null/shape edge cases match the fold: mismatch, null element, null array, empty") {
    import spark.implicits._
    val df = Seq[(Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])](
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0)))),           // length mismatch
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),     // null element
      (None, Some(Seq(Some(1.0)))),                                      // null array
      (Some(Seq.empty), Some(Seq.empty)),                                // empty → 0.0
      (Some(Seq(Some(2.0), Some(3.0))), Some(Seq(Some(4.0), Some(5.0)))) // plain
    ).toDF("a", "b")
      .select(DotProduct.dot_product(col("a"), col("b")).as("native"),
        fold(col("a"), col("b")).as("folded"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1),
        s"null disagreement: native=${r.get(0)} fold=${r.get(1)}")
      if (!r.isNullAt(0)) assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval matches codegen") {
    // the expression must behave identically when codegen is off
    // (Spark falls back to eval on codegen failure)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      import spark.implicits._
      val rows = Seq((Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f)))
      def run(): Double = rows.toDF("a", "b")
        .select(DotProduct.dot_product(col("a").cast("array<double>"),
          col("b").cast("array<double>"))).head().getDouble(0)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val withCodegen = run()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = run()
      assert(java.lang.Double.doubleToLongBits(withCodegen) ===
        java.lang.Double.doubleToLongBits(interpreted))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
