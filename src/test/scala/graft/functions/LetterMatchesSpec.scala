package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** letter_matches must be bit-equal to the interpreted HOF it
  * replaces (the flagship consume path's inner loop) on every shape:
  * equal/unequal lengths, n beyond both strings, empty strings,
  * multi-byte fallback.
  */
class LetterMatchesSpec extends SparkSuite {

  private def hof = (src: org.apache.spark.sql.Column,
                     dest: org.apache.spark.sql.Column,
                     n: org.apache.spark.sql.Column) =>
    size(filter(sequence(lit(1), n),
      p => src.substr(p, lit(1)) === dest.substr(p, lit(1)))).cast("long")

  test("n <= 0 yields 0 (NOT the HOF's descending-sequence artifact)") {
    // sequence(1, 0) in Spark is DESCENDING [1, 0], so the HOF form
    // "counts" two out-of-range positions on a zero-length block; the
    // native expression defines the sane semantics: no positions, 0.
    import spark.implicits._
    val r = Seq(("ACGT", "ACGT")).toDF("a", "b").select(
      LetterMatches.letter_matches(col("a"), col("b"), lit(0)).as("z"),
      LetterMatches.letter_matches(col("a"), col("b"), lit(-3)).as("neg"))
      .collect().head
    assert(r.getLong(0) === 0L && r.getLong(1) === 0L)
  }

  test("native == HOF on randomized DNA pairs and edge shapes (n >= 1)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = "ACGT"
    def dna(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(4))).mkString
    val cases = Seq.tabulate(300) { i =>
      val l1 = rnd.nextInt(40)
      // half the cases share a prefix so matches are non-trivial
      val s1 = dna(l1)
      val s2 = if (i % 2 == 0 && l1 > 0)
        s1.substring(0, rnd.nextInt(l1)) + dna(rnd.nextInt(20))
      else dna(rnd.nextInt(40))
      val n = 1 + rnd.nextInt(49) // can exceed both lengths
      (s1, s2, n)
    } ++ Seq(
      ("", "", 5),                       // both empty, n beyond
      ("ACGT", "", 6), ("", "ACGT", 6),  // one empty
      ("ACGT", "ACGT", 10),              // n beyond both, equal strings
      ("日本語テスト", "日本語テキト", 8), // multi-byte fallback path
      ("日本語", "日本語", 5))
    val df = cases.toDF("s1", "s2", "n")
    val both = df.select(
      LetterMatches.letter_matches(col("s1"), col("s2"), col("n")).as("nat"),
      hof(col("s1"), col("s2"), col("n").cast("int")).as("ref"),
      col("s1"), col("s2"), col("n"))
    val bad = both.where(col("nat") =!= col("ref")).collect()
    assert(bad.isEmpty, s"diverged: ${bad.take(5).mkString("; ")}")
  }

  test("registered SQL surface and null propagation") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT letter_matches('ACGTA', 'ACCTA', 5) a, " +
      "letter_matches(CAST(NULL AS STRING), 'A', 1) b").collect().head
    assert(r.getLong(0) === 4L)
    assert(r.isNullAt(1))
  }
}
