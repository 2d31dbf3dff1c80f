package graft.seq

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sequence scalar functions (SURVEY.md §2.7) as pure column
  * expressions — no UDFs, so whole-stage codegen applies.
  */
object SeqFunctions {

  /** Reverse complement (pygr `sequence.py:513-520`). Handles upper +
    * lower case and N; other letters pass through unchanged.
    */
  def reverseComplement(seq: Column): Column =
    translate(reverse(seq), "ACGTacgtUu", "TGCAtgcaAa")

  /** The standard genetic code (pygr `sequtil.py:121-159`; stop='*',
    * unknown codon → 'X').
    */
  val codonTable: Map[String, String] = {
    val bases = Seq("T", "C", "A", "G")
    val aas = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
    (for {
      (b1, i) <- bases.zipWithIndex
      (b2, j) <- bases.zipWithIndex
      (b3, k) <- bases.zipWithIndex
    } yield (b1 + b2 + b3) -> aas(i * 16 + j * 4 + k).toString).toMap
  }

  /** Translate a DNA string (frame 0) to protein; partial trailing
    * codon dropped; unknown codons → X (pygr `AATranslation`,
    * `sequtil.py:121-159`, `annotation.py:119-126`). Default path is
    * the native codegen expression; `translateCodonsDeclarative` is
    * the pure-functions formulation it is property-checked against.
    */
  def translateCodons(seq: Column): Column =
    graft.functions.TranslateCodons.translate_codons(seq)

  def translateCodonsDeclarative(seq: Column): Column = {
    val up = upper(seq)
    val nCodons = floor(length(up) / 3).cast("int")
    when(nCodons >= 1,
      concat_ws("",
        transform(sequence(lit(0), nCodons - 1),
          // try_element_at: a codon absent from the table (any non-ACGT
          // base) must reach the coalesce as NULL → "X"; plain
          // element_at THROWS on a missing map key under ANSI mode
          // (the Spark 4 default), never falling through
          i => coalesce(
            try_element_at(typedLit(codonTable), up.substr(lit(1) + i * 3, lit(3))),
            lit("X")))))
    .otherwise(lit(""))
  }

  /** Classify sequence content by letter ratios (pygr `guess_seqtype`,
    * `sequtil.py:7-26`): 'dna' / 'rna' / 'protein'. Ratio compared in
    * integer space (5 * acgtn >= 4 * len means >= 0.8).
    */
  def guessSeqType(seq: Column): Column = {
    val up = upper(seq)
    val len = length(up)
    val acgtnu = len - length(translate(up, "ACGTNU", ""))
    val u = length(up) - length(translate(up, "U", ""))
    val t = length(up) - length(translate(up, "T", ""))
    when(len === 0, lit("protein"))
      .when(lit(5) * acgtnu >= lit(4) * len,
        when(u > t, lit("rna")).otherwise(lit("dna")))
      .otherwise(lit("protein"))
  }

  /** Six-frame translation rows for a DNA column: array of structs
    * (frame, aa) with frames +1,+2,+3 on the forward strand and
    * -1,-2,-3 on the reverse complement (pygr `translationDB.py:
    * 76-131` six-frame annotation db; explode to get one row each).
    */
  def sixFrames(seq: Column): Column = {
    val frames = (0 to 2).map { f =>
      struct(lit(f + 1).as("frame"),
        translateCodons(substring(seq, f + 1, 1000000)).as("aa"))
    } ++ (0 to 2).map { f =>
      struct(lit(-(f + 1)).as("frame"),
        translateCodons(substring(reverseComplement(seq), f + 1, 1000000)).as("aa"))
    }
    array(frames: _*)
  }
}
