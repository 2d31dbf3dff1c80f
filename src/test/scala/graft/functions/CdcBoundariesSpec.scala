package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native boundary scan must (1) agree with a literal evaluation
  * of the window polynomial at every position — the rolling update is
  * an optimization, never a semantics change — and (2) behave
  * identically interpreted and codegen'd.
  */
class CdcBoundariesSpec extends SparkSuite {

  import spark.implicits._

  private def reference(s: String): Seq[Int] = {
    val W = 8; val MOD = 1031L; val BAND = 32L
    (W to s.length).filter { i =>
      val poly = (0 until W).map { j =>
        (s.charAt(i - W + j).toLong) * Iterator.fill(W - 1 - j)(31L).product
      }.sum
      poly % MOD < BAND
    }
  }

  test("rolling scan equals the literal per-position polynomial") {
    val rnd = new scala.util.Random(7)
    val texts = Seq("", "short", "exactly8", "a" * 100) ++
      (1 to 30).map(_ => Array.fill(60 + rnd.nextInt(400))(
        (' ' + rnd.nextInt(95)).toChar).mkString)
    val got = texts.toDF("t")
      .select(col("t"), CdcBoundaries.cdc_boundaries(col("t")).as("bs"))
      .as[(String, Seq[Int])].collect().toMap
    for (t <- texts)
      assert(got(t) === reference(t), s"mismatch for '${t.take(30)}…'")
  }

  test("interpreted eval matches codegen") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    try {
      val df = Seq("the quick brown fox jumps over the lazy dog" * 5).toDF("t")
      def run(): Seq[Int] = df
        .select(CdcBoundaries.cdc_boundaries(col("t")))
        .as[Seq[Int]].head()
      spark.conf.set(key, "CODEGEN_ONLY")
      val codegen = run()
      spark.conf.set(key, "NO_CODEGEN")
      val interpreted = run()
      assert(codegen === interpreted)
      assert(codegen.nonEmpty)
    } finally spark.conf.set(key, prev)
  }

  test("null text yields null, not a crash") {
    val out = Seq[Option[String]](None, Some("some text long enough to chunk"))
      .toDF("t")
      .select(CdcBoundaries.cdc_boundaries(col("t")).as("bs"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
  }
}
