package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The per-token and per-vector kernels vs the interpreted HOF chains
  * they replaced — value parity on random data (the consumers' oracle
  * SQL did not move), plus the null/edge conventions each kernel
  * inherits from its declarative form.
  */
class TokenKernelsSpec extends SparkSuite {

  private def randToks(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, (0 until rnd.nextInt(20)).map(_ =>
        rnd.nextInt(4) match {
          case 0 => "the"
          case 1 => s"w${rnd.nextInt(8)}"
          case 2 => s"W${rnd.nextInt(3)}" // not lower-alpha
          case _ => s"x${rnd.nextInt(5)}y"
        }))
    }
  }

  test("count_in_set == size(filter(array_contains)) with multiplicity") {
    import spark.implicits._
    val set = Seq("the", "w1", "w2")
    val df = randToks(11, 300).toDF("id", "toks")
    val got = df.select(col("id"),
        CountInSet.count_in_set(col("toks"), set).as("k"),
        size(filter(col("toks"),
          t => array_contains(typedLit(set), t))).cast("long").as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, k, d) => assert(k === d, s"id=$id") }
    assert(got.exists(_._2 > 1), "fixture never repeated a set word — weak test")
  }

  test("count_lower_alpha == size(filter(rlike ^[a-z]+$))") {
    import spark.implicits._
    val df = (randToks(13, 300) :+ (900L, Seq("abc", "", "ABC", "a1", "zz")))
      .toDF("id", "toks")
    val got = df.select(col("id"),
        CountLowerAlpha.count_lower_alpha(col("toks")).as("k"),
        size(filter(col("toks"), t => t.rlike("^[a-z]+$"))).cast("long").as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, k, d) => assert(k === d, s"id=$id") }
    assert(got.find(_._1 == 900L).get._2 === 2L) // abc, zz only
  }

  test("hash_weight_sum == aggregate(transform(md5 % m - shift))") {
    import spark.implicits._
    val df = randToks(17, 300).toDF("id", "toks")
    val decl = coalesce(aggregate(
      transform(col("toks"),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long") % 1001L - 500L),
      lit(0L), (acc, x) => acc + x), lit(0L))
    val got = df.select(col("id"),
        HashWeightSum.hash_weight_sum(col("toks"), 1001L, 500L).as("k"),
        decl.as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, k, d) => assert(k === d, s"id=$id") }
  }

  test("quantize_milli / quantize_int8 / l2 / dot match their lambda forms") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 150).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 4 - 2))) :+
      (900L, Seq.fill(16)(0.0d)) // all-zero: int8 must yield zeros
    val df = vecs.toDF("id", "v")
    val v = col("v").cast("array<double>")
    val maxabs = array_max(transform(v, y => abs(y)))
    val q8decl = when(maxabs > 0d,
        transform(v, x => floor(x * lit(127.0) / maxabs).cast("long")))
      .otherwise(transform(v, x => lit(0L)))
    val qmDecl = transform(v, x => floor(x * 1000).cast("long"))
    val r = df.select(col("id"),
        QuantizeMilli.quantize_milli(v).as("qm"), qmDecl.as("qmD"),
        QuantizeInt8.quantize_int8(v).as("q8"), q8decl.as("q8D"))
      .as[(Long, Seq[Long], Seq[Long], Seq[Long], Seq[Long])].collect()
    r.foreach { case (id, qm, qmD, q8, q8D) =>
      assert(qm === qmD, s"milli id=$id")
      assert(q8 === q8D, s"int8 id=$id")
    }
    // pairwise integer L2 and dot vs the zip_with folds
    val a = df.select(col("id").as("ia"), QuantizeMilli.quantize_milli(v).as("qa"))
    val b = df.select(col("id").as("ib"), QuantizeMilli.quantize_milli(v).as("qb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(500)
    val chk = pairs.select(
        L2SquaredLong.l2_squared_long(col("qa"), col("qb")).as("l2k"),
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x).as("l2d"),
        DotProductLong.dot_product_long(col("qa"), col("qb")).as("dk"),
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("dd"))
      .as[(Long, Long, Long, Long)].collect()
    assert(chk.nonEmpty)
    chk.foreach { case (l2k, l2d, dk, dd) =>
      assert(l2k === l2d); assert(dk === dd)
    }
  }

  test("char_entropy == the explode + GROUP BY pipeline it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(120)).map(_ =>
        "abcdef ghij"(rnd.nextInt(11))).mkString)
    }
    val df = docs.toDF("doc_id", "text").where(length(col("text")) > 0)
    val kernel = df.select(col("doc_id"),
        CharEntropy.char_entropy(col("text")).as("e"))
      .select(col("doc_id"), col("e.n_distinct_chars").as("nd"),
        col("e.entropy_u").as("eu"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val cc = df.select(col("doc_id"),
        CharGramsExplode.char_grams_explode(col("text"), 1).as(Seq("pos", "ch")))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("nc"))
    val n = cc.groupBy("doc_id").agg(sum("nc").as("n"))
    val decl = cc.join(n, "doc_id")
      .withColumn("term_u",
        floor(lit(1e6) * (col("nc").cast("double") / col("n").cast("double")) *
          log(col("n").cast("double") / col("nc").cast("double"))).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nd"), sum("term_u").as("eu"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(kernel === decl)
  }
}
