package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.text.TextFunctions

class ShingleHashSpec extends SparkSuite {

  private val P = 1000000007L

  /** The declarative chain the generator fuses — per-row SET of hashes
    * via explode(shingles) → conv(substr(md5)) % P. */
  private def declarative(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), explode(TextFunctions.shingles(col("toks"), 3)).as("sh"))
    .select(col("id"),
      (conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long") % lit(P))
        .as("h"))

  test("parity with explode(shingles)+md5 chain on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(12)}"))
    }
    val df = docs.toDF("id", "toks")
    val fused = df.select(col("id"),
        ShingleHashExplode.shingle_hash_explode(col("toks"), 3, P).as("h"))
      .as[(Long, Long)].collect().toSet
    val decl = declarative(df).as[(Long, Long)].collect().toSet
    assert(fused === decl)
  }

  test("short and empty docs emit no rows; hashes are sorted distinct") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a")),
      (3L, Seq("a", "b")),
      (4L, Seq("a", "b", "c")),
      (5L, Seq("x", "x", "x", "x", "x")) // all shingles identical
    ).toDF("id", "toks")
    val rows = df.select(col("id"),
        ShingleHashExplode.shingle_hash_explode(col("toks"), 3, P).as("h"))
      .as[(Long, Long)].collect()
    assert(rows.count(_._1 < 4) === 0, "docs with <3 tokens emit nothing")
    assert(rows.count(_._1 == 4) === 1)
    assert(rows.count(_._1 == 5) === 1, "duplicate shingles dedup to one row")
    val many = Seq((9L, (0 until 40).map(i => s"t${i % 6}"))).toDF("id", "toks")
      .select(ShingleHashExplode.shingle_hash_explode(col("toks"), 3, P).as("h"))
      .as[Long].collect()
    assert(many.toSeq === many.sorted.distinct.toSeq, "ascending distinct")
  }

  test("null tokens join with concat_ws semantics") {
    import spark.implicits._
    val df = Seq((1L, Seq[String]("a", null, "b", "c"))).toDF("id", "toks")
    val fused = df.select(
        ShingleHashExplode.shingle_hash_explode(col("toks"), 3, P).as("h"))
      .as[Long].collect().toSet
    val decl = declarative(df).select("h").as[Long].collect().toSet
    assert(fused === decl)
  }

  test("kernel matches MinHashU hash arithmetic (min of affine at a=1,b=0)") {
    import spark.implicits._
    val df = Seq((1L, Seq("q", "r", "s", "t", "u"))).toDF("id", "toks")
    val viaMin = df.select(
        MinHashU.minhash_u(col("toks"), 3, Seq((1L, 0L))).getItem(0).as("m"))
      .as[Long].head()
    val viaGen = df.select(
        ShingleHashExplode.shingle_hash_explode(col("toks"), 3, P).as("h"))
      .as[Long].collect().min
    assert(viaMin === viaGen)
  }
}
