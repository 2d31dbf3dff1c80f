package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an Array[Float] column.
  *
  * `cosine` is a pure fold expression (left-to-right, double
  * arithmetic — deterministic and engine-portable). `topK` is the
  * brute-force baseline: broadcast the query set, scan the corpus
  * once, rank per query. `neardupPairs` blocks on a caller-provided
  * bucket column (label, LSH bucket, IVF cell) so the self-join never
  * goes all-pairs across the full corpus — the 100TB path is
  * bucketing first, brute force within buckets.
  */
object CosineSim {

  /** Left-to-right dot product on double-cast arrays — the native
    * codegen expression (one fused loop, zero per-pair allocation),
    * bit-identical to the `aggregate(zip_with(…))` fold it replaced
    * (same IEEE accumulation order; DotProductSpec pins parity).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(
      a.cast("array<double>"), b.cast("array<double>"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force top-k cosine neighbors for each query vector.
    * queries(qCol, vecCol) × corpus(idCol, vecCol); self-matches
    * (same id value) are excluded. Output: (q, rank, neighbor, cos).
    * Norms are precomputed once per vector (identical doubles to the
    * per-pair form, one dot instead of three per comparison).
    */
  def topK(queries: DataFrame, corpus: DataFrame, qCol: String,
           idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qCol).as("q"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).as("cv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("cn"))
    val scored = q.join(broadcast(c), col("q") =!= col("neighbor"))
      .select(col("q"), col("neighbor"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q", "rank", "neighbor", "cos")
  }

  /** Near-duplicate pairs above a cosine threshold, blocked by
    * `bucketCol` (the IVF/LSH analog: only same-bucket pairs are
    * compared). Norms precomputed per vector before the pair join.
    */
  def neardupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   bucketCol: String, threshold: Double): DataFrame = {
    val normed = corpus.select(col(bucketCol).as("bk"), col(idCol),
      col(vecCol), sqrt(dot(col(vecCol), col(vecCol))).as("nrm"))
    val a = normed.select(col("bk"), col(idCol).as("i"), col(vecCol).as("vi"),
      col("nrm").as("ni"))
    val b = normed.select(col("bk"), col(idCol).as("j"), col(vecCol).as("vj"),
      col("nrm").as("nj"))
    a.join(b, Seq("bk"))
      .where(col("i") < col("j"))
      .select(col("bk"), col("i"), col("j"),
        (dot(col("vi"), col("vj")) / (col("ni") * col("nj"))).as("cos"))
      .where(col("cos") >= threshold)
  }
}
