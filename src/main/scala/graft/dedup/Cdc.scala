package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-defined chunking (the LBFS/restic/FastCDC family): a chunk
  * boundary is declared at position i whenever a hash of the LOCAL
  * `window`-char slice ending at i falls in the hit band (expected
  * chunk length ≈ MOD/HIT_BAND·… ≈ 32 chars). Because the decision
  * depends only on
  * window CONTENT, an edit shifts only the chunks it touches: every
  * boundary more than `window` chars past the edit lands on the same
  * content and the chunk stream resynchronizes — the property
  * fixed-size chunking lacks, and the reason storage/backup dedup and
  * delta-sync protocols are CDC-based (`CdcSpec` pins it).
  *
  * Pure column builders (codegen'd HOFs, no UDF): callers explode
  * `chunks` and aggregate chunk hashes. The boundary hash is the
  * Rabin–Karp polynomial of the window (Σ c_j·31^(window-1-j)) tested
  * against a PRIME modulus (a power-of-two modulus of a base-31
  * polynomial degenerates: 31^j mod 2^k cycles with period 2, making
  * the bucket an alternating char sum) — pure integer arithmetic,
  * identical in Spark and DuckDB, and ~4× cheaper than the md5 the
  * first version hashed per position. A rolling deployment evaluates
  * the SAME polynomial incrementally (one multiply-add per byte); the
  * recompute-per-position form here trades that constant for
  * stateless, codegen'd columns.
  */
object Cdc {

  /** 1-based boundary positions: i in [window, len] where the window
    * polynomial lands in the hit band. Delegates to the native
    * [[graft.functions.CdcBoundaries]] expression — the rolling
    * one-pass scan; a HOF formulation of the same polynomial runs
    * interpreted per element and measured ~40× slower (BENCH.md). */
  def boundaries(text: Column, window: Int = 8): Column = {
    require(window == 8,
      "the native boundary scan is compiled for the standard window of 8")
    graft.functions.CdcBoundaries.cdc_boundaries(text)
  }

  /** The chunk substrings, in order, covering the whole string (a doc
    * with no boundary hit is one chunk; empty text is one empty
    * chunk). */
  def chunks(text: Column, window: Int = 8): Column = {
    val bs = boundaries(text, window)
    val starts = concat(array(lit(1)), transform(bs, b => b + 1))
    val ends = concat(bs, array(length(text)))
    zip_with(starts, ends, (a, b) => text.substr(a, b - a + lit(1)))
  }
}
