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
  * Pure column builders (no UDF): callers explode `chunks` and
  * aggregate chunk hashes. The boundary hash is the Rabin–Karp
  * polynomial of the window (Σ c_j·31^(window-1-j)) tested against a
  * PRIME modulus (a power-of-two modulus of a base-31 polynomial
  * degenerates: 31^j mod 2^k cycles with period 2, making the bucket
  * an alternating char sum) — pure integer arithmetic, identical in
  * Spark and DuckDB, evaluated by the native rolling
  * [[graft.functions.CdcBoundaries]] expression (one
  * multiply-subtract-add per byte).
  *
  * ASCII precondition (both entry points): the native boundary scan
  * emits BYTE positions while `chunks` slices with CHARACTER-based
  * substr/length — these agree only when every char is one byte.
  * `chunks` therefore gates per row with
  * `octet_length(text) = length(text)` and returns NULL for any
  * multi-byte row rather than silently mis-slicing it; a production
  * corpus with non-ASCII text should chunk a byte representation
  * (e.g. `encode(text, 'UTF-8')` keyed by byte offsets) instead.
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
    * chunk). A boundary landing exactly on the last position is the
    * natural end of the final chunk, NOT the start of an empty
    * trailing chunk — without this filter ~HIT_BAND/MOD of docs would
    * grow a spurious ""-chunk whose shared md5 cross-matches unrelated
    * docs in dedup stats. */
  def chunks(text: Column, window: Int = 8): Column = {
    val len = length(text)
    val bs = filter(boundaries(text, window), b => b < len)
    val starts = concat(array(lit(1)), transform(bs, b => b + 1))
    val ends = concat(bs, array(len))
    // ASCII gate (see object doc): byte==char length, else NULL.
    when(octet_length(text) === len,
      zip_with(starts, ends, (a, b) => text.substr(a, b - a + lit(1))))
  }
}
