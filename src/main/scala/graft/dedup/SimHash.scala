package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash document fingerprints: locality-sensitive hashes where
  * near-identical token multisets land within a small Hamming
  * distance. Token hashes come from md5 hex (engine-portable); the
  * per-bit majority vote is computed by exploding bit positions —
  * `bits` rows per distinct token, aggregated map-side.
  */
object SimHash {

  /** (idCol, simhash BIGINT) from a token-array column. `bits` must
    * be a multiple of 4 and <= 60 (the hash is the leading
    * `bits / 4` hex chars of md5, kept within a signed BIGINT for
    * engine portability).
    */
  def simhash(docs: DataFrame, idCol: String, toksCol: String,
              bits: Int = 32): DataFrame = {
    require(bits > 0 && bits <= 60 && bits % 4 == 0)
    val tok = docs.select(col(idCol),
      explode(array_distinct(col(toksCol))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, bits / 4), 16, 10).cast("long"))
    tok
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .withColumn("contrib", expr("(shiftright(h, b) & 1) * 2 - 1"))
      .groupBy(col(idCol), col("b"))
      .agg(sum("contrib").as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(0L)).as("simhash"))
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))

  /** Number of pigeonhole blocks that guarantee a shared block for
    * every pair within `maxHamming` (the r+1 rule: k differing bits
    * touch at most k blocks, so k <= r leaves one block untouched).
    */
  def blocksFor(maxHamming: Int): Int = maxHamming + 1

  /** Pure-Scala reference of the block split used by the banded
    * join; property-checked for the completeness guarantee. */
  def blocksOf(h: Long, nBlocks: Int, blockBits: Int): Seq[Long] =
    (0 until nBlocks).map(b => (h >>> (b * blockBits)) & ((1L << blockBits) - 1))
}
