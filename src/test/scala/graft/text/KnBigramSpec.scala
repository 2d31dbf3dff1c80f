package graft.text

import graft.{SparkSuite, SparkEntry}
import graft.text.TextFunctions.tokens
import org.apache.spark.sql.functions._

/** t15_kn_bigram: interpolated Kneser-Ney bigram model. The oracle
  * gate pins the arithmetic; these specs pin the SEMANTICS — that the
  * smoothed model is a real probability distribution (each context's
  * full-vocabulary probabilities sum to 1), which no per-row hash can
  * show, plus the query-level structural invariants.
  */
class KnBigramSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("KN probabilities sum to 1 over the continuation vocabulary per context") {
    // rebuild the model tables the query uses, then sum the EXACT KN
    // probability over every (observed w1) x (any continuation word
    // w2 with n1b > 0) — the interpolated-KN normalization identity:
    //   sum_w2 [ max(c12-D,0)/c1 + D*n1f/c1 * n1b/NB ] = 1
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val n = size(col("toks"))
    val pairs = d.where(n >= 2).select(
      explode(zip_with(
        slice(col("toks"), lit(1), n - 1),
        slice(col("toks"), lit(2), n - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val left = bc.groupBy("w1").agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val right = bc.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val nb = bc.agg(count(lit(1)).as("nb")).head().getLong(0)
    // discounted mass actually observed per context
    val seen = bc.join(left, "w1")
      .groupBy("w1").agg(
        (sum(col("c12").cast("double") - 0.75) / first("c1")).as("p_seen"),
        (lit(0.75) * first("n1f") / first("c1")).as("lambda"))
    // the continuation distribution sums to 1 by construction:
    // sum(n1b) over all continuation words = NB
    val contTotal = right.agg(sum("n1b")).head().getLong(0)
    assert(contTotal === nb, "continuation counts must total the distinct-bigram count")
    val totals = seen.select((col("p_seen") + col("lambda")).as("total")).collect()
    assert(totals.nonEmpty)
    totals.foreach(r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9,
        s"per-context KN mass ${r.getDouble(0)} != 1"))
  }

  test("query invariants: one bigram per adjacent token pair, nll nonnegative") {
    val got = SparkEntry.queries("t15_kn_bigram")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val toksPerDoc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    toksPerDoc.foreach { case (id, nt) =>
      if (nt >= 2) {
        val (nBigrams, meanNll) = got(id)
        assert(nBigrams === nt - 1, s"doc $id: $nBigrams bigrams for $nt tokens")
        assert(meanNll >= 0L, s"doc $id: negative mean nll $meanNll")
      } else assert(!got.contains(id), s"doc $id with $nt tokens must be absent")
    }
  }
}
