package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash document fingerprints: 32-bit locality-sensitive hashes
  * where near-identical token multisets land within a small Hamming
  * distance. Token hashes come from md5 hex (engine-portable); the
  * per-bit majority vote is computed by exploding bit positions —
  * 32 rows per distinct token, aggregated map-side.
  */
object SimHash {

  /** (idCol, simhash BIGINT) from a token-array column. */
  def simhash(docs: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(array_distinct(col(toksCol))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    tok
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(31))).as("b"))
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
}
