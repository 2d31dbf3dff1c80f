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
    // (Spark falls back to eval on codegen failure). Toggling only
    // wholeStage is NOT enough — Spark still runs generated (non-
    // whole-stage) projections via doGenCode; factoryMode=NO_CODEGEN
    // forces InterpretedUnsafeProjection, which actually calls
    // nullSafeEval.
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    try {
      import spark.implicits._
      val rows = Seq((Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f)))
      def run(): Double = rows.toDF("a", "b")
        .select(DotProduct.dot_product(col("a").cast("array<double>"),
          col("b").cast("array<double>"))).head().getDouble(0)
      spark.conf.set(key, "CODEGEN_ONLY")
      val withCodegen = run()
      spark.conf.set(key, "NO_CODEGEN")
      val interpreted = run()
      assert(java.lang.Double.doubleToLongBits(withCodegen) ===
        java.lang.Double.doubleToLongBits(interpreted))
    } finally spark.conf.set(key, prev)
    // belt-and-braces: nullSafeEval directly, outside any projection
    // machinery, against the plain scalar expectation
    val direct = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.5d, -2.25d, 3.125d),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0.5d, 4.0d, -1.0d),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      .eval(null)
    val want = ((0.0 + 1.5 * 0.5) + -2.25 * 4.0) + 3.125 * -1.0
    assert(java.lang.Double.doubleToLongBits(direct.asInstanceOf[Double]) ===
      java.lang.Double.doubleToLongBits(want))
  }

  test("SQL registration rejects wrong arity with an analysis error") {
    DotProduct.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1.0d))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("dot_product"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT dot_product(array(1.0d), array(2.0d), array(3.0d))").collect()
    }
    assert(e3.getMessage.toLowerCase.contains("dot_product"))
  }
}
