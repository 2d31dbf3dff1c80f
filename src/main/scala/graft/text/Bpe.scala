package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE tokenizer APPLY — the encode side of the tokenizer story
  * (t11 trains merges; this applies a rank-ordered merge list to
  * text). The 100 TB shape: merges run over the DISTINCT-WORD table
  * (vocabulary-sized — orders of magnitude below corpus size), and
  * the corpus only pays one keyed join from word to its encoded
  * form — exactly how production tokenizers amortize per-word work
  * behind a cache.
  *
  * Merge semantics match t11's trainer: one simultaneous pass per
  * merge, marking positions where (s, next) equals the pair and
  * dropping the absorbed successor. Pairs with identical halves are
  * rejected (`require`) — with ma ≠ mb, adjacent matches cannot
  * overlap, which is what makes the windowed mark-and-drop rule
  * exact (the trainer excludes s = next pairs from candidates for
  * the same reason).
  */
object Bpe {

  private val wOrd = Window.partitionBy("word").orderBy("pos")

  /** One merge (ma, mb) → ma+mb over (word, pos, s) symbol rows.
    * pos values stay as-is (gaps are fine — only their order
    * matters), so chained applications reuse the same word-keyed
    * partitioning with no re-numbering shuffle. */
  def applyMerge(syms: DataFrame, ma: String, mb: String): DataFrame = {
    require(ma != mb,
      s"BPE merge halves must differ (got '$ma' twice): equal halves " +
        "make adjacent matches overlap and the simultaneous pass inexact")
    syms
      .withColumn("m", coalesce(
        col("s") === lit(ma) && lead("s", 1).over(wOrd) === lit(mb),
        lit(false)))
      .withColumn("pm", coalesce(lag("m", 1).over(wOrd), lit(false)))
      .where(!col("pm"))
      .select(col("word"), col("pos"),
        when(col("m"), lit(ma + mb)).otherwise(col("s")).as("s"))
  }

  /** Encode a distinct-word table through a rank-ordered merge list:
    * (word, encoded, n_subwords) with `encoded` the space-joined
    * subword sequence. All windows are word-partitioned — the merge
    * chain is one exchange on word, then narrow stages. */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val syms0 = words.select(col("word"),
      posexplode(split(trim(regexp_replace(col("word"), "(.)", "$1 ")), " "))
        .as(Seq("pos", "s")))
    val symsN = merges.foldLeft(syms0) { case (s, (a, b)) => applyMerge(s, a, b) }
    symsN.groupBy("word").agg(
      concat_ws(" ",
        expr("transform(array_sort(collect_list(struct(pos, s))), x -> x.s)"))
        .as("encoded"),
      count(lit(1)).cast("long").as("n_subwords"))
  }
}
