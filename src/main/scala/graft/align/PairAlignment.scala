package graft.align

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
        graft.functions.LetterMatches.letter_matches(
          col("src_text"), col("dest_text"),
          (col("src_end") - col("src_start")).cast("int")))
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

  /** Node→node letter-EDGE rows over a `columns` result — the
    * reference's `NLMSANode.nodeEdges`/`getEdgeSeqs` walk
    * (`cnestedlist.pyx:1240-1278`): an edge connects source position
    * p to a successor position per target lane whenever the target
    * coordinate continues in target orientation (`dest_pos ± 1`).
    * Three kinds, exactly the reference's three cases:
    *   - `within`  — both positions inside one aligned block (the
    *     "has_continuation" case);
    *   - `bridge`  — src-adjacent positions in DIFFERENT blocks whose
    *     target coords abut (`target_start == previous target_end`);
    *   - `jump`    — src jumps (indel) but the target continues — the
    *     non-adjacent node edge of `nodeEdges`.
    *
    * `laneCols` identifies one alignment lane (add `q_id` when the
    * input came from `AlignmentStore.slice`). Scale shape: `within`
    * edges are a codegen'd `lead` window (no join, no row growth);
    * `bridge`/`jump` edges join only the two BOUNDARY rows of each
    * block, so the join input is O(blocks), not O(letters).
    */
  def letterEdges(cols: DataFrame,
                  laneCols: Seq[String] = Seq("src_id", "dest_id", "dest_ori")): DataFrame = {
    // the inter-block step direction reads dest_ori off the joined
    // lanes; with it absent from the lane key the reference would not
    // resolve (or resolve ambiguously), so insist up front
    require(laneCols.contains("dest_ori"),
      "letterEdges: laneCols must include dest_ori (the inter-block " +
        "step direction is derived from it)")
    val lane = laneCols.map(col)
    val byBlock = laneCols :+ "block_id"
    val base = cols.select((laneCols ++ Seq("block_id", "src_pos", "dest_pos",
      "src_letter", "dest_letter")).map(col): _*)
    val wB = Window.partitionBy(byBlock.map(col): _*).orderBy("src_pos")
    val wAll = Window.partitionBy(byBlock.map(col): _*)
    // ONE window stage over the block partitioning carries everything the
    // three edge kinds need: the within-block successor (a single
    // struct-valued lead — one generated window function, not four) and
    // the block's first/last src_pos (whole-partition min/max — same
    // partitioning, so no extra shuffle and no groupBy+join re-scan of
    // base, which an earlier version paid three exchanges for).
    val ann = base
      .withColumn("__nxt", lead(struct(col("src_pos"), col("dest_pos"),
        col("src_letter"), col("dest_letter")), 1).over(wB))
      .withColumn("__lo", min("src_pos").over(wAll))
      .withColumn("__hi", max("src_pos").over(wAll))
    val intra = ann
      .where(col("__nxt").isNotNull)
      .withColumn("next_block_id", col("block_id"))
      .withColumn("next_src_pos", col("__nxt.src_pos"))
      .withColumn("next_dest_pos", col("__nxt.dest_pos"))
      .withColumn("next_src_letter", col("__nxt.src_letter"))
      .withColumn("next_dest_letter", col("__nxt.dest_letter"))
      .withColumn("edge_kind", lit("within"))
    val lastRows = ann.where(col("src_pos") === col("__hi"))
    val firstRows = ann.where(col("src_pos") === col("__lo"))
      .select(lane ++ Seq(col("block_id").as("next_block_id"),
        col("src_pos").as("next_src_pos"), col("dest_pos").as("next_dest_pos"),
        col("src_letter").as("next_src_letter"),
        col("dest_letter").as("next_dest_letter")): _*)
    val step = when(col("dest_ori") >= 0, lit(1L)).otherwise(lit(-1L))
    val inter = lastRows.join(firstRows, laneCols)
      .where(col("next_block_id") =!= col("block_id") &&
        col("next_dest_pos") === col("dest_pos") + step)
      .withColumn("edge_kind",
        when(col("next_src_pos") === col("src_pos") + 1L, lit("bridge"))
          .otherwise(lit("jump")))
      .where(col("next_src_pos") > col("src_pos"))
    val order = laneCols ++ Seq("block_id", "src_pos", "dest_pos",
      "next_block_id", "next_src_pos", "next_dest_pos",
      "src_letter", "dest_letter", "next_src_letter", "next_dest_letter", "edge_kind")
    intra.select(order.map(col): _*).unionByName(inter.select(order.map(col): _*))
  }

  /** Clip each aligned block to its best conserved segment — the
    * reference's `conservedSegment`/`longestSegment`
    * (`sequence.py:727-787`), the kernel of the slice-consume
    * conservation filter (`filterIvalConservation`,
    * `cnestedlist.pyx:867-897`): decompose each block's letter
    * comparison into unbroken identity runs, then over all run pairs
    * (j <= i) keep spans whose identity fraction meets
    * `pIdentityMinBp` (basis points — integer math, engine-exact)
    * and pick the one covering the most letters (ni+nm), first-found
    * on ties in the reference's (i asc, j desc) scan order. Blocks
    * with no qualifying segment drop; survivors carry clipped coords
    * on both axes (orientation-aware) plus `seg_ident`/`seg_span`.
    *
    * `keyCols` must uniquely identify a block row (e.g. q_id +
    * block_id for slice output). Distributed shape: per-position
    * explode → two window passes → a per-block run self-join (runs
    * <= letters/2, so the join is quadratic only in per-block run
    * count, never in corpus size).
    */
  def conservedSegment(blocks: DataFrame, seqs: DataFrame,
                       pIdentityMinBp: Long, minAlignSize: Long = 1L,
                       keyCols: Seq[String] = Seq("block_id")): DataFrame = {
    val k = keyCols.map(col)
    val lettered = withLetters(blocks, seqs)
    val pos = lettered
      .where(col("src_end") > col("src_start"))
      .withColumn("__k",
        explode(sequence(lit(1), (col("src_end") - col("src_start")).cast("int"))))
      .withColumn("__k", col("__k").cast("long"))
      .where(expr("substr(src_text, CAST(__k AS INT), 1) = substr(dest_text, CAST(__k AS INT), 1)"))
      .select(k :+ col("__k"): _*)
    val wB = Window.partitionBy(k: _*).orderBy("__k")
    val runs = pos
      .withColumn("__isl", col("__k") - row_number().over(wB))
      .groupBy(k :+ col("__isl"): _*)
      .agg(min("__k").as("s"), count(lit(1)).as("len"))
    val wR = Window.partitionBy(k: _*).orderBy("s")
    val idx = runs
      .withColumn("i", row_number().over(wR).cast("long"))
      .withColumn("nm_before",
        coalesce(col("s") - lag(col("s") + col("len"), 1).over(wR), lit(0L)))
      .withColumn("pref_len",
        sum("len").over(wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pref_nm",
        sum("nm_before").over(wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val aj = idx.select(k :+ col("i").as("j") :+ col("s").as("sj") :+
      col("len").as("lenj") :+ col("pref_len").as("plj") :+ col("pref_nm").as("pnj"): _*)
    val bi = idx.select(k :+ col("i") :+ col("s").as("si") :+
      col("len").as("leni") :+ col("pref_len").as("pli") :+ col("pref_nm").as("pni"): _*)
    val cand = bi.join(aj, keyCols)
      .where(col("j") <= col("i"))
      .withColumn("ni", col("pli") - col("plj") + col("lenj"))
      .withColumn("nm", col("pni") - col("pnj"))
      .withColumn("l", col("si") + col("leni") - col("sj"))
      .where(col("ni") * 10000L >= lit(pIdentityMinBp) * col("l"))
      .where(col("ni") + col("nm") >= minAlignSize)
    val wBest = Window.partitionBy(k: _*)
      .orderBy((col("ni") + col("nm")).desc, col("i"), col("j").desc)
    val best = cand
      .withColumn("__rk", row_number().over(wBest)).where(col("__rk") === 1)
      .select(k :+ col("sj").as("__k1") :+ (col("si") + col("leni") - 1L).as("__k2") :+
        col("ni").as("seg_ident") :+ (col("ni") + col("nm")).as("seg_span"): _*)
    blocks.join(best, keyCols)
      .withColumn("c_src_start", col("src_start") + col("__k1") - 1L)
      .withColumn("c_src_end", col("src_start") + col("__k2"))
      .withColumn("c_dest_start",
        when(col("dest_ori") >= 0, col("dest_start") + col("__k1") - 1L)
          .otherwise(col("dest_end") - col("__k2")))
      .withColumn("c_dest_end",
        when(col("dest_ori") >= 0, col("dest_start") + col("__k2"))
          .otherwise(col("dest_end") - col("__k1") + 1L))
      .drop("__k1", "__k2")
  }

  /** Per-edge identity rollup: pIdentity/pAligned in basis points and
    * the aligned-block count (`matchIntervals` cardinality).
    *
    * `mode` mirrors pygr's denominator semantics exactly
    * (`Seq2SeqEdge.length(mode)` + `pIdentity(mode=max)`,
    * `sequence.py:702-724`): the denominator is taken over the edge's
    * bounding PATH spans (min src_start..max src_end per edge), not
    * the whole sequences — `max` (the reference default) | `min` |
    * `src` | `dest`.
    *
    * `trapOverflow` (default true, like the reference's
    * `pIdentity(trapOverflow=True)`, `sequence.py:717-724`): when a
    * region aligns to the same target multiple times, summed
    * identities can exceed the span — silently reporting >100%
    * identity hides a data problem, so the default raises on first
    * evaluation; pass false to get the raw (possibly >10000 bp)
    * value.
    */
  def identityMetrics(blocks: DataFrame, seqs: DataFrame,
                      trapOverflow: Boolean = true,
                      mode: String = "max"): DataFrame = {
    val lettered = withLetters(blocks, seqs)
    val seqLens = seqs.select(col("seq_id"), length(col("seq")).cast("long").as("len"))
    val srcSpan = col("__src_hi") - col("__src_lo")
    val destSpan = col("__dest_hi") - col("__dest_lo")
    val denom = mode match {
      case "max" => greatest(srcSpan, destSpan)
      case "min" => least(srcSpan, destSpan)
      case "src" => srcSpan
      case "dest" => destSpan
      case other => throw new IllegalArgumentException(
        s"identityMetrics mode must be max/min/src/dest, got '$other'")
    }
    val base = lettered
      .groupBy("src_id", "dest_id", "dest_ori")
      .agg(sum("n_match").as("n_ident"),
        sum(col("src_end") - col("src_start")).as("n_aligned"),
        count(lit(1)).as("n_blocks"),
        min("src_start").as("__src_lo"), max("src_end").as("__src_hi"),
        min("dest_start").as("__dest_lo"), max("dest_end").as("__dest_hi"))
      .join(seqLens.select(col("seq_id").as("src_id"), col("len").as("src_len")), "src_id")
      .join(seqLens.select(col("seq_id").as("dest_id"), col("len").as("dest_len")), "dest_id")
      .withColumn("p_identity_bp",
        floor(lit(10000L) * col("n_ident") / denom).cast("long"))
      .withColumn("p_aligned_bp",
        floor(lit(10000L) * col("n_aligned") / denom).cast("long"))
      .drop("__src_lo", "__src_hi", "__dest_lo", "__dest_hi")
    if (!trapOverflow) base
    else base
      .withColumn("p_identity_bp",
        when(col("p_identity_bp") > 10000L,
          raise_error(concat(
            lit("pIdentity overflow due to multiple hits (src="), col("src_id"),
            lit(", dest="), col("dest_id"),
            lit("); pass trapOverflow=false to allow"))).cast("long"))
          .otherwise(col("p_identity_bp")))
      // the reference traps pAligned the same way (sequence.py:789-798)
      .withColumn("p_aligned_bp",
        when(col("p_aligned_bp") > 10000L,
          raise_error(concat(
            lit("pAligned overflow due to multiple hits (src="), col("src_id"),
            lit(", dest="), col("dest_id"),
            lit("); pass trapOverflow=false to allow"))).cast("long"))
          .otherwise(col("p_aligned_bp")))
  }
}
