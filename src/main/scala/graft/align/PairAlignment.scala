package graft.align

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.seq.SeqFunctions

/** Letter-level alignment metrics — the Seq2SeqEdge consume path of
  * the flagship query (pygr `sequence.py:638-799`, SURVEY.md §3.1
  * step 6 / A6): sequence strings are joined in lazily per aligned
  * block, compared letter-by-letter (reverse-complement on ori=-1),
  * and identity aggregates roll up per (src,dest,ori) edge.
  */
object PairAlignment {

  /** Per-block letter comparison. `seqs`: (seq_id, seq), 0-based
    * half-open block coords. Adds src_text/dest_text/n_match.
    */
  def withLetters(blocks: DataFrame, seqs: DataFrame): DataFrame = {
    val s = seqs.select(col("seq_id").as("src_id"), col("seq").as("__sseq"))
    val d = seqs.select(col("seq_id").as("dest_id"), col("seq").as("__dseq"))
    blocks.join(s, "src_id").join(d, "dest_id")
      .withColumn("src_text",
        col("__sseq").substr(col("src_start").cast("int") + 1,
          (col("src_end") - col("src_start")).cast("int")))
      .withColumn("__dpiece",
        col("__dseq").substr(col("dest_start").cast("int") + 1,
          (col("dest_end") - col("dest_start")).cast("int")))
      .withColumn("dest_text",
        when(col("dest_ori") < 0, SeqFunctions.reverseComplement(col("__dpiece")))
          .otherwise(col("__dpiece")))
      .withColumn("n_match",
        size(filter(sequence(lit(1), (col("src_end") - col("src_start")).cast("int")),
          p => col("src_text").substr(p, lit(1)) === col("dest_text").substr(p, lit(1))))
          .cast("long"))
      .drop("__sseq", "__dseq", "__dpiece")
  }

  /** Per-position alignment column view — the W2-proper letter
    * iterator of the reference (`NLMSANode` iteration with letter
    * edges, `cnestedlist.pyx:1093-1278`): one row per (block, source
    * position) per aligned target, carrying the source letter, the
    * target letter IN TARGET ORIENTATION (minus-strand targets read
    * complemented, like `seq[-k]` in pygr), the mapped target
    * coordinate, and the letter-edge match flag. Feed it a slice
    * result joined over every target lane to walk alignment columns
    * across all sequences of the slice.
    */
  def columns(blocks: DataFrame, seqs: DataFrame): DataFrame =
    withLetters(blocks, seqs)
      .where(col("src_end") > col("src_start"))
      .withColumn("__k",
        explode(sequence(lit(1), (col("src_end") - col("src_start")).cast("int"))))
      .withColumn("src_pos", col("src_start") + col("__k") - 1L)
      .withColumn("dest_pos",
        when(col("dest_ori") >= 0, col("dest_start") + col("__k") - 1L)
          .otherwise(col("dest_end") - col("__k")))
      .withColumn("src_letter", expr("substr(src_text, __k, 1)"))
      .withColumn("dest_letter", expr("substr(dest_text, __k, 1)"))
      .withColumn("is_match", col("src_letter") === col("dest_letter"))
      .drop("src_text", "dest_text", "n_match", "__k")

  /** Per-edge identity rollup: pIdentity in basis points over min
    * (pygr `pIdentity` default) and the aligned-block count
    * (`matchIntervals` cardinality).
    *
    * `trapOverflow` (default true, like the reference's
    * `pIdentity(trapOverflow=True)`, `sequence.py:717-724`): when a
    * region aligns to the same target multiple times, summed
    * identities can exceed the sequence length — silently reporting
    * >100% identity hides a data problem, so the default raises on
    * first evaluation; pass false to get the raw (possibly >10000 bp)
    * value.
    */
  def identityMetrics(blocks: DataFrame, seqs: DataFrame,
                      trapOverflow: Boolean = true): DataFrame = {
    val lettered = withLetters(blocks, seqs)
    val seqLens = seqs.select(col("seq_id"), length(col("seq")).cast("long").as("len"))
    val base = lettered
      .groupBy("src_id", "dest_id", "dest_ori")
      .agg(sum("n_match").as("n_ident"),
        sum(col("src_end") - col("src_start")).as("n_aligned"),
        count(lit(1)).as("n_blocks"))
      .join(seqLens.select(col("seq_id").as("src_id"), col("len").as("src_len")), "src_id")
      .join(seqLens.select(col("seq_id").as("dest_id"), col("len").as("dest_len")), "dest_id")
      .withColumn("p_identity_bp",
        floor(lit(10000L) * col("n_ident") / least(col("src_len"), col("dest_len")))
          .cast("long"))
      .withColumn("p_aligned_bp",
        floor(lit(10000L) * col("n_aligned") / least(col("src_len"), col("dest_len")))
          .cast("long"))
    if (!trapOverflow) base
    else base.withColumn("p_identity_bp",
      when(col("p_identity_bp") > 10000L,
        raise_error(concat(
          lit("pIdentity overflow due to multiple hits (src="), col("src_id"),
          lit(", dest="), col("dest_id"),
          lit("); pass trapOverflow=false to allow"))).cast("long"))
        .otherwise(col("p_identity_bp")))
  }
}
