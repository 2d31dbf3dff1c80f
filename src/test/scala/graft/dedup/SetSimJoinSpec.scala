package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.text.TextFunctions

/** Prefix-filtered exact Jaccard join vs the brute-force posting-list
  * join: identical pairs on corpora engineered to stress the filter
  * (stop-shingles in every doc, dup families, threshold-boundary
  * sizes). The lossless claim d14's ground truth rests on.
  */
class SetSimJoinSpec extends SparkSuite {

  private val stops = Array("the", "of", "and", "a", "to")
  private val vocab = (0 until 200).map(i => f"w$i%03d").toArray

  /** Brute-force truth: posting-list self-join + exact bp filter. */
  private def brute(docs: DataFrame, minBp: Int, mod: Int): Set[(Long, Long)] = {
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.shingles(col("toks"), 2)).as("sh"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sh.where(col("doc_id") % mod === 0)
      .select(col("doc_id").as("q"), col("sh"))
      .join(sh.select(col("doc_id").as("o"), col("sh")), "sh")
      .where(col("q") =!= col("o"))
      .groupBy("q", "o").agg(count(lit(1)).as("ic"))
      .join(sz.select(col("doc_id").as("q"), col("sz").as("szq")), "q")
      .join(sz.select(col("doc_id").as("o"), col("sz").as("szo")), "o")
      .where(TextFunctions.bp(col("ic"),
        col("szq") + col("szo") - col("ic")) >= minBp)
      .select("q", "o")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def prefix(docs: DataFrame, minBp: Int, mod: Int): Set[(Long, Long)] =
    SetSimJoin.jaccardPairsBp(
        docs.select(col("doc_id"),
          TextFunctions.shingles(col("toks"), 2).as("shs")),
        "doc_id", "shs", minBp, probePred = _ % mod === 0)
      .select("q", "o")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def corpus(seed: Int, n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // every doc starts with the same stop-shingle run (the Θ(n²)
    // posting lists the filter must neutralize), then random content;
    // docs in the same family (i/4) share a content prefix of varying
    // length so Jaccard straddles the threshold
    val rows = (0 until n).map { i =>
      val fam = new scala.util.Random(1000 + i / 4)
      val shared = (0 until 12 + rnd.nextInt(8))
        .map(_ => vocab(fam.nextInt(vocab.length)))
      val own = (0 until rnd.nextInt(14))
        .map(_ => vocab(rnd.nextInt(vocab.length)))
      (i.toLong, (stops ++ shared ++ own).mkString(" "))
    }
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
  }

  test("prefix-filtered join equals brute force at t=0.5") {
    val docs = corpus(7, 60)
    val b = brute(docs, 5000, 7)
    val p = prefix(docs, 5000, 7)
    assert(b.nonEmpty, "fixture produced no qualifying pairs — weak test")
    assert(p === b)
  }

  test("prefix-filtered join equals brute force at t=0.8 and t=0.3") {
    val docs = corpus(13, 48)
    for (bp <- Seq(3000, 8000); mod <- Seq(1, 3)) {
      assert(prefix(docs, bp, mod) === brute(docs, bp, mod),
        s"mismatch at minBp=$bp mod=$mod")
    }
  }

  test("exact duplicates and threshold-boundary sizes survive") {
    import spark.implicits._
    // J exactly 0.5: sets {a..f} vs {d..i} with 2-shingles is messy,
    // so construct directly: doc pairs sharing exactly half their
    // shingles via token overlap; plus exact copies
    val rows = Seq(
      0L -> "p q r s t u v",
      7L -> "p q r s t u v",            // exact copy of 0 (J=1)
      14L -> "x y z p q r s",           // overlaps 0 on p..s
      2L -> "m n o",                    // small set, no partner
      21L -> "m n o"                    // exact copy of 2
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val b = brute(rows, 5000, 7)
    val p = prefix(rows, 5000, 7)
    assert(p === b)
    assert(p.contains((0L, 7L)) && p.contains((7L, 0L)) && p.contains((21L, 2L)))
  }

  test("property: SELF-join (default probePred) equals brute force across random corpora/thresholds") {
    // the public-API shape: no probe predicate at all — every row is
    // both query and candidate; seeded-random corpora and thresholds
    // (scalatestplus is off the classpath, so property = seeded loop)
    val rnd = new scala.util.Random(2024)
    for (_ <- 0 until 5) {
      val seed = rnd.nextInt(10000)
      val n = 24 + rnd.nextInt(40)
      val minBp = 2000 + rnd.nextInt(7500)
      val docs = corpus(seed, n)
      val p = SetSimJoin.jaccardPairsBp(
          docs.select(col("doc_id"),
            TextFunctions.shingles(col("toks"), 2).as("shs")),
          "doc_id", "shs", minBp)
        .select("q", "o")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p === brute(docs, minBp, 1), s"seed=$seed n=$n minBp=$minBp")
    }
  }

  test("jac_bp matches the integer bp definition on a known pair") {
    import spark.implicits._
    // shingle sets: doc 0 = {a b, b c, c d}, doc 1 = {a b, b c, c e}
    // |∩|=2, |∪|=4 → 5000 bp exactly (boundary inclusion)
    val rows = Seq(0L -> "a b c d", 1L -> "a b c e")
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val out = SetSimJoin.jaccardPairsBp(
        rows.select(col("doc_id"),
          TextFunctions.shingles(col("toks"), 2).as("shs")),
        "doc_id", "shs", 5000)
      .collect()
    assert(out.length === 2)
    val r = out.find(_.getLong(0) == 0L).get
    assert(r.getLong(2) === 2L && r.getLong(3) === 3L
      && r.getLong(4) === 3L && r.getLong(5) === 5000L)
  }
}
