package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, n-gram shingling, language-ID scoring, quality
  * metrics, content fingerprints. All pure `functions._` expressions
  * (whole-stage codegen'd, no UDFs) and all deterministic across
  * engines: hashing is md5-hex, ratios are integer basis points
  * (10000*a div b) so no float rounding-mode ever enters a result.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped. `array_remove`
    * rather than a `filter` lambda: HOF lambdas run INTERPRETED per
    * element (DRIFT_r12 §8 — and unstably so, a per-run JIT lottery),
    * and this expression sits under every tokenizing query in the
    * suite; the builtin is whole-stage-codegen'd and identical in
    * semantics (split yields no nulls, so "remove all empties" is
    * exactly the old predicate). */
  def tokens(text: Column): Column =
    array_remove(split(trim(lower(text)), "\\s+"), "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-grams WITH multiplicity — repetition statistics need
    * occurrence counts, where `shingles` collapses them. Guarded:
    * Spark's `sequence(1, stop)` DESCENDS when stop < 1, so short
    * docs must short-circuit to an empty array.
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles of a token array (space-joined), distinct. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(ngrams(toks, n))

  /** Content fingerprint: minimum shingle hash — a 1-seed minhash;
    * equal-content (and usually near-equal) docs collide. The shingle
    * hashes come from the native [[graft.functions.ShingleHashes]]
    * kernel (ascending, so the min is element 1) — the
    * `array_min(transform(shingles, md5))` chain it replaces hashed
    * every shingle through an interpreted lambda. BIGINT (the first
    * 60 bits of the shingle md5, which DuckDB restates as
    * `('0x' || substr(md5(sh), 1, 15))::BIGINT`), comparable across
    * engines.
    *
    * Docs with fewer than n tokens produce an EMPTY hash array and
    * fingerprint NULL — `try_element_at` keeps that contract under
    * `spark.sql.ansi.enabled=true`, where plain `element_at` would
    * throw INVALID_ARRAY_INDEX on the empty array.
    */
  def fingerprint(toks: Column, n: Int = 3): Column =
    try_element_at(
      graft.functions.ShingleHashes.shingle_hashes(toks, n, 1L << 60), lit(1))

  /** Count of tokens that appear in a marker-word list (with
    * multiplicity) — the native [[graft.functions.CountInSet]] kernel;
    * the `size(filter(toks, t -> array_contains(set, t)))` form it
    * replaces ran the membership test interpreted per token per
    * language. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    graft.functions.CountInSet.count_in_set(toks, words)

  /** Ratio in integer basis points: floor(10000*num / den), 0 when
    * den=0. floor of a double quotient of ints is exact for operands
    * < 2^40, so this matches integer division in any engine.
    */
  def bp(num: Column, den: Column): Column =
    when(den === 0, lit(0L))
      .otherwise(floor(lit(10000L) * num / den).cast("long"))

  /** Marker-word sets per language for the heuristic language-ID
    * (n-gram/stopword scoring; the reference's analogous
    * content-based classifier is `guess_seqtype`, `sequtil.py:7-26`).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "ni"))
}
