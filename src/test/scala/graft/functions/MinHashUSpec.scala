package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.dedup.MinHashLSH
import graft.text.TextFunctions

/** The fused native minhash must be value-identical to the
  * declarative HOF form it replaced (min over the shingle multiset ==
  * min over the distinct set), including the no-shingle NULL row.
  */
class MinHashUSpec extends SparkSuite {

  test("signatureExprsU == declarative HOF form on randomized docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "longerword", "0")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens — includes sub-shingle rows
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    val k = 8; val n = 2
    val native = MinHashLSH.signatureExprsU(docs, "toks", k, n)
    // the pre-r9 declarative form, inlined as the reference
    val sh = TextFunctions.shingles(col("toks"), n)
    val hm = transform(sh,
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinHashLSH.P)
    val ref0 = docs.withColumn("__hm", hm)
    val ref = MinHashLSH.seedsU(k).zipWithIndex.foldLeft(ref0) {
      case (d, ((a, b), i)) =>
        d.withColumn(s"rsig$i",
          array_min(transform(col("__hm"), h => (lit(a) * h + lit(b)) % MinHashLSH.P)))
    }
    val joined = native.select(col("doc_id") +:
        (0 until k).map(i => col(s"sig$i")): _*)
      .join(ref.select(col("doc_id") +:
        (0 until k).map(i => col(s"rsig$i")): _*), "doc_id")
    val bad = joined.where(
      (0 until k).map(i =>
        !(col(s"sig$i") <=> col(s"rsig$i"))).reduce(_ || _)).collect()
    assert(bad.isEmpty, s"diverged rows: ${bad.take(3).mkString("; ")}")
    // explicit NULL contract: rows with < n tokens have null sigs
    val nulls = native.where(size(col("toks")) < n)
      .where(col("sig0").isNotNull).count()
    assert(nulls === 0)
  }

  test("null tokens follow concat_ws: no separator for a null element") {
    import spark.implicits._
    // ['a', null, 'b'] must shingle as 'a b'-adjacent text, not 'a  b'
    // (concat_ws skips null elements AND their separators)
    val docs = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq[String](null, "a", "b", null)),
      (3L, Seq[String]("a", "b"))
    ).toDF("doc_id", "toks")
    val k = 4; val n = 3
    val native = MinHashLSH.signatureExprsU(docs.where(col("doc_id") === 1), "toks", k, n)
      .select((0 until k).map(i => col(s"sig$i")): _*).collect().head
    val sh = TextFunctions.shingles(col("toks"), n)
    val hm = transform(sh,
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinHashLSH.P)
    val ref = MinHashLSH.seedsU(k).zipWithIndex.foldLeft(
      docs.where(col("doc_id") === 1).withColumn("__hm", hm)) {
      case (d, ((a, b), i)) =>
        d.withColumn(s"sig$i",
          array_min(transform(col("__hm"), h => (lit(a) * h + lit(b)) % MinHashLSH.P)))
    }.select((0 until k).map(i => col(s"sig$i")): _*).collect().head
    assert(native === ref, s"null-token shingles diverged: $native vs $ref")
  }
}
