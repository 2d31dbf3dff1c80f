package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-defined chunking (the LBFS/restic/FastCDC family): a chunk
  * boundary is declared at position i whenever a hash of the LOCAL
  * `window`-char slice ending at i hits 0 mod `modulus` (expected
  * chunk length ≈ modulus). Because the decision depends only on
  * window CONTENT, an edit shifts only the chunks it touches: every
  * boundary more than `window` chars past the edit lands on the same
  * content and the chunk stream resynchronizes — the property
  * fixed-size chunking lacks, and the reason storage/backup dedup and
  * delta-sync protocols are CDC-based (`CdcSpec` pins it).
  *
  * Pure column builders (codegen'd HOFs, no UDF): callers explode
  * `chunks` and aggregate chunk hashes. The boundary hash here is md5
  * (engine-portable, so the d13 oracle recomputes it in SQL); a
  * deployment swaps in a gear/rolling family — same trade as
  * MinHashLSH's md5-vs-xxhash twins.
  */
object Cdc {

  /** 1-based boundary positions: i in [window, len] where the window
    * hash hits. The `greatest` guard keeps `sequence` ascending for
    * short strings (sequence(8, 3) would DESCEND); the i <= len
    * filter then empties it. */
  def boundaries(text: Column, window: Int = 8, modulus: Int = 32): Column = {
    val len = length(text)
    filter(sequence(lit(window), greatest(len, lit(window))),
      i => i <= len &&
        conv(substring(md5(text.substr(i - lit(window - 1), lit(window))), 1, 4), 16, 10)
          .cast("long") % modulus === 0)
  }

  /** The chunk substrings, in order, covering the whole string (a doc
    * with no boundary hit is one chunk; empty text is one empty
    * chunk). */
  def chunks(text: Column, window: Int = 8, modulus: Int = 32): Column = {
    val bs = boundaries(text, window, modulus)
    val starts = concat(array(lit(1)), transform(bs, b => b + 1))
    val ends = concat(bs, array(length(text)))
    zip_with(starts, ends, (a, b) => text.substr(a, b - a + lit(1)))
  }
}
