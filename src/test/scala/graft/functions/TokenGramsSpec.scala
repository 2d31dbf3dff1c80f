package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.text.TextFunctions

/** The native gram/chunk generators vs the declarative HOF chains
  * they replaced — values must be identical row for row, because the
  * oracle SQL for their consumers (t6/t7/t9/t15, d9, k1, t16, d13,
  * st11, SeqDb) did not move when the queries switched over.
  */
class TokenGramsSpec extends SparkSuite {

  test("token_grams_explode == explode(ngrams) on random docs (pos and gram)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => s"w${rnd.nextInt(9)}"))
    } :+ (900L, Seq.empty[String]) :+ (901L, Seq("one"))
    val df = docs.toDF("id", "toks")
    for (n <- Seq(2, 3)) {
      val fused = df.select(col("id"),
          TokenGramsExplode.token_grams_explode(col("toks"), n)
            .as(Seq("pos", "g")))
        .as[(Long, Long, String)].collect().sorted.toSeq
      val decl = df.select(col("id"),
          posexplode(TextFunctions.ngrams(col("toks"), n)))
        .select(col("id"), (col("pos") + 1).cast("long"), col("col"))
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(fused === decl, s"n=$n")
    }
  }

  test("strided cover mode == the d9 chunk transform (partial trailing chunk kept)") {
    import spark.implicits._
    val C = 5
    val rnd = new scala.util.Random(8)
    val docs = (0 until 80).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(17)).map(_ => s"t${rnd.nextInt(6)}"))
    }
    val df = docs.toDF("id", "toks")
    val fused = df.select(col("id"),
        TokenGramsExplode.token_grams_explode(col("toks"), C, stride = C,
          keepPartial = true).as(Seq("pos", "chunk")))
      .select(col("id"), ((col("pos") - 1L) / C).cast("long"), col("chunk"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    val decl = df.select(col("id"), explode(transform(
        sequence(lit(0L), floor((size(col("toks")).cast("long") - 1L) / C).cast("long")),
        i => struct(i.as("cno"),
          concat_ws(" ", slice(col("toks"), (i * C + 1).cast("int"), lit(C))).as("chunk")))).as("c"))
      .select(col("id"), col("c.cno"), col("c.chunk"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(fused === decl)
  }

  test("null tokens follow concat_ws semantics; null array emits nothing") {
    import spark.implicits._
    val df = Seq((1L, Seq[String]("a", null, "b"))).toDF("id", "toks")
    val grams = df.select(
        TokenGramsExplode.token_grams_explode(col("toks"), 2).as(Seq("p", "g")))
      .as[(Long, String)].collect().map(_._2).sorted.toSeq
    // concat_ws: null contributes neither text nor separator —
    // windows [a,null] and [null,b] join to "a" and "b"
    assert(grams === Seq("a", "b"))
    val nullArr = df.select(TokenGramsExplode
        .token_grams_explode(lit(null).cast("array<string>"), 2).as(Seq("p", "g")))
      .collect()
    assert(nullArr.isEmpty)
  }

  test("char_grams_explode == the k-mer transform; cover mode tiles like the SeqDb chunker") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = ((0 until 60).map(i =>
        (i.toLong, (0 until rnd.nextInt(20)).map(_ => "ACGT"(rnd.nextInt(4))).mkString))
      :+ (900L, "")).toDF("id", "s")
    val K = 4
    val fused = df.where(length(col("s")) >= K)
      .select(col("id"),
        CharGramsExplode.char_grams_explode(col("s"), K).as(Seq("pos", "g")))
      .as[(Long, Long, String)].collect().sorted.toSeq
    val decl = df.where(length(col("s")) >= K)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), length(col("s")) - (K - 1)),
        i => col("s").substr(i, lit(K)))))
      .select(col("id"), (col("pos") + 1).cast("long"), col("col"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(fused === decl)
    // cover mode: tiles of size 7, trailing partial kept, empty
    // string = one empty chunk (the fromSequences convention)
    val cs = 7
    val cov = df.select(col("id"),
        CharGramsExplode.char_grams_explode(col("s"), cs, stride = cs,
          cover = true).as(Seq("pos", "chunk")))
      .as[(Long, Long, String)].collect()
    val byId = cov.groupBy(_._1)
    df.as[(Long, String)].collect().foreach { case (id, s) =>
      val want = if (s.isEmpty) Seq("") else s.grouped(cs).toSeq
      val got = byId.getOrElse(id, Array.empty).sortBy(_._2).map(_._3).toSeq
      assert(got === want, s"id=$id")
    }
  }

  test("cdc_chunks_explode == posexplode(Cdc.chunks) incl. empty text and non-ASCII gate") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val texts = (0 until 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(200)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    } :+ (900L, "") :+ (901L, "héllo wörld non-ascii")
    val df = texts.toDF("id", "text")
    val fused = df.select(col("id"),
        CdcChunksExplode.cdc_chunks_explode(col("text")).as(Seq("idx", "chunk")))
      .as[(Long, Long, String)].collect().sorted.toSeq
    val decl = df.select(col("id"), posexplode(graft.dedup.Cdc.chunks(col("text"))))
      .select(col("id"), (col("pos") + 1).cast("long"), col("col"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(fused === decl)
    assert(!fused.exists(_._1 == 901L), "non-ASCII rows must emit nothing")
    assert(fused.count(_._1 == 900L) === 1 &&
      fused.find(_._1 == 900L).get._3 === "", "empty text is one empty chunk")
  }
}
