package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bpe.encodeWords: greedy simultaneous merge application with the
  * ma ≠ mb non-overlap guarantee, checked against hand-computed
  * encodings.
  */
class BpeSpec extends SparkSuite {

  private val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"))

  test("encodeWords applies ranked merges exactly") {
    import spark.implicits._
    val words = Seq("the", "thin", "tooth", "ant", "a", "banana").toDF("word")
    val got = Bpe.encodeWords(words, merges)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // the: t h e → th e → the
    assert(got("the") === (("the", 1L)))
    // thin: t h i n → th i n → th in
    assert(got("thin") === (("th in", 2L)))
    // tooth: t o o t h → t o o th   (merge 1 hits only the tail pair)
    assert(got("tooth") === (("t o o th", 4L)))
    // ant: a n t → an t
    assert(got("ant") === (("an t", 2L)))
    // single symbol untouched
    assert(got("a") === (("a", 1L)))
    // banana: b a n a n a → b an an a  (simultaneous non-overlap)
    assert(got("banana") === (("b an an a", 4L)))
  }

  test("merge order matters: 'the' requires (t,h) before (th,e)") {
    import spark.implicits._
    val got = Bpe.encodeWords(Seq("the").toDF("word"), Seq(("th", "e")))
      .collect().head
    // without the (t,h) merge first, 'th' never forms, so (th,e) is a no-op
    assert(got.getString(1) === "t h e" && got.getLong(2) === 3L)
  }

  test("equal-halved merge pairs are rejected") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeWords(Seq("aaa").toDF("word"), Seq(("a", "a")))
    }
    assert(e.getMessage.contains("must differ"))
  }

  test("no global windows in the encode plan (word-partitioned only)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec        => q +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val df = Bpe.encodeWords(Seq("the", "thin").toDF("word"), merges)
    df.collect()
    val gw = nodes(df.queryExecution.executedPlan)
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(gw.isEmpty, s"global window in encode plan:\n${df.queryExecution.executedPlan}")
  }
}
