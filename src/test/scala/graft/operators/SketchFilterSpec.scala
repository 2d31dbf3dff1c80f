package graft.operators

import graft.{SparkSuite, SparkEntry}
import graft.text.TextFunctions.tokens
import org.apache.spark.sql.functions._

/** x15_countmin / x16_bloom_semijoin: the oracle gate pins the
  * arithmetic; these specs pin the STRUCTURAL guarantees the sketches
  * are chosen for — CM never underestimates and its state is bounded;
  * Bloom never false-negatives and its FP rate stays near the
  * bits-per-key design point.
  */
class SketchFilterSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("count-min estimates are exact-count upper bounds for every probed term") {
    val got = SparkEntry.queries("x15_countmin")(spark, dir).collect()
    assert(got.length === 10)
    got.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CM underestimated $est < $exact")
    }
    // the probed terms really are the exact top-10 by (count desc, tok)
    val top = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("tok")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === top.toSeq)
  }

  test("count-min state is bounded by depth x width regardless of vocabulary") {
    // the testdata corpus has a ~31-term vocabulary, far below d·w —
    // so exercise the fixed-size-state property on a 5000-term
    // synthetic vocabulary built with the query's exact cell hash:
    // state must stay ≤ d·w while the input vocabulary is 5× larger
    import spark.implicits._
    val width = 256
    val vocab = (0 until 5000).map(i => s"term_$i").toDF("tok")
    val nCells = vocab
      .select(col("tok"), explode(sequence(lit(0), lit(3))).as("r"))
      .select(col("r"),
        (conv(substring(md5(concat(col("r").cast("string"), lit(":"), col("tok"))),
          1, 8), 16, 10).cast("long") % width).as("c"))
      .distinct().count()
    assert(nCells <= 4L * width, s"CM grew past d*w: $nCells cells")
    assert(nCells > 4L * width / 2, s"hash badly unbalanced: only $nCells cells hit")
  }

  test("bloom semi-join: zero false negatives, FP rate near the 10-bits/key design point") {
    val r = SparkEntry.queries("x16_bloom_semijoin")(spark, dir).collect().head
    val Seq(nKeys, nRows, nFlagged, nTrue, nFp, nFn) =
      (0 until 6).map(r.getLong)
    assert(nFn === 0L, "Bloom filters must never drop a member key")
    // n_true_rows must equal the exact semi-join mass, independently
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val members = spark.read.parquet(s"$dir/part.parquet")
      .where(col("p_size") === 1).select(col("p_partkey")).distinct()
    val trueRows = li.join(members, li("l_partkey") === members("p_partkey"),
      "left_semi").count()
    assert(nTrue === trueRows, s"flagged member mass $nTrue != semi-join $trueRows")
    assert(nFlagged === nTrue + nFp)
    assert(nRows === li.count() && nKeys === li.select("l_partkey").distinct().count())
    // m = 10 bits/key, k = 3 → expected FP ≈ 1.7%; allow generous air
    assert(nFp.toDouble / nRows < 0.05,
      s"FP rate ${nFp.toDouble / nRows} far above the design point")
  }
}
