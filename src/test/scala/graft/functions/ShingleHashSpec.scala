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

  test("positional generator parity with transform(sequence…md5(slice…)) chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val W = 4
    val docs = (0 until 150).map { i =>
      val n = rnd.nextInt(25)
      (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(8)}"))
    } :+ (900L, Seq.empty[String]) :+ (901L, Seq("a", "b", "c")) // < W
    val df = docs.toDF("id", "toks")
    val fused = df.select(col("id"),
        ShingleHashPosExplode.shingle_hash_pos_explode(col("toks"), W,
          ShingleHashPosExplode.P60).as(Seq("pos", "h")))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // the interpreted chain it replaces (d8/c6's old shape), hash
    // restated as the 60-bit md5 prefix the kernel computes
    val decl = df.where(size(col("toks")) >= W)
      .select(col("id"), explode(transform(
        sequence(lit(1L), size(col("toks")).cast("long") - (W - 1)),
        i => struct(i.as("pos"),
          (conv(substring(md5(concat_ws(" ",
            slice(col("toks"), i.cast("int"), lit(W)))), 1, 15), 16, 10)
            .cast("long")).as("h")))).as("w"))
      .select(col("id"), col("w.pos"), col("w.h"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(fused === decl,
      "positional windows must keep multiplicity and 1-based order")
    // multiplicity really is kept: a doc of identical tokens emits
    // len-W+1 rows of the SAME hash
    val rep = Seq((1L, Seq.fill(10)("x"))).toDF("id", "toks")
      .select(ShingleHashPosExplode.shingle_hash_pos_explode(col("toks"), W,
        ShingleHashPosExplode.P60).as(Seq("pos", "h")))
      .as[(Long, Long)].collect()
    assert(rep.map(_._1).sorted.toSeq === (1L to 7L))
    assert(rep.map(_._2).distinct.length === 1)
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
