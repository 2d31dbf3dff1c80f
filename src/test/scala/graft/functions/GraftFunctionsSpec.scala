package graft.functions

import graft.SparkSuite

/** registerAll must make every native expression reachable from plain
  * SQL with the same results as the Column API, and wrong arity must
  * fail analysis cleanly (not IndexOutOfBounds at runtime).
  */
class GraftFunctionsSpec extends SparkSuite {

  test("all native expressions callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  reverse_complement('ACGTN') AS rc,
        |  translate_codons('ATGTTTTAA') AS aa,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  cdc_boundaries('the quick brown fox jumps over the lazy dog') AS bs
        |""".stripMargin).head()
    assert(row.getString(0) === "NACGT")
    assert(row.getString(1) === "MF*")
    assert(row.getDouble(2) === 11.0)
    val viaCol = org.apache.spark.sql.functions.lit(
      "the quick brown fox jumps over the lazy dog")
    val expected = spark.range(1)
      .select(CdcBoundaries.cdc_boundaries(viaCol)).head().getSeq[Int](0)
    assert(row.getSeq[Int](3) === expected)
  }

  test("wrong arity is an analysis error for EVERY registered function") {
    GraftFunctions.registerAll(spark)
    val bad = Seq(
      "SELECT cdc_boundaries('a', 'b')",
      "SELECT dot_product(array(1.0d))",
      "SELECT reverse_complement()",
      "SELECT translate_codons('ATG', 'oops')")
    for (q <- bad) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(q).collect()
      }
      assert(e.getMessage.contains("WRONG_NUM_ARGS") ||
        e.getErrorClass != null, s"weak error for $q: ${e.getMessage}")
    }
  }
}
