package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search — the memory-side
  * scale path next to IVF (`IvfFlat`) and sign-LSH (`CosineLsh`):
  * each vector is split into `nSub` subvectors, each subvector is
  * replaced by the id of its nearest codeword from a per-subspace
  * codebook, and search scores candidates with an additive lookup
  * table (ADC) — so a 64-dim float32 vector (256 B) becomes `nSub`
  * small codes (8 B at nSub=8), a 32× index compression, and scoring
  * is `nSub` integer adds per candidate instead of a 64-dim float
  * dot product.
  *
  * Everything is integer end-to-end (vectors are first quantized to
  * milli-units) and the codebook sample is the same deterministic
  * md5-order draw as `IvfFlat.codebook`, so encode AND search are
  * hash-exact against a SQL oracle — the operator itself is gated,
  * not just its plumbing.
  *
  * Plan shapes (100 TB audit): the codebook is a TakeOrderedAndProject
  * of k rows broadcast everywhere; encoding is one broadcast join +
  * per-(vector, subspace) argmin — linear in corpus size, constant
  * build side; ADC search broadcasts the (queries × nSub × k) LUT
  * (tiny) against the codes table and aggregates on (query,
  * candidate) — per-candidate work O(nSub), no float math in the
  * scan. Compose with IVF cells to restrict candidates before ADC.
  */
object ProductQuantizer {

  /** Integer milli-unit quantization: floor(x*1000) per component.
    * Exact in both engines (double multiply of identical input,
    * floor toward -inf).
    */
  def qint(v: Column): Column =
    graft.functions.QuantizeMilli.quantize_milli(v.cast("array<double>"))

  /** Integer squared L2 between two equal-length long arrays —
    * the native compiled kernel (the probe's hottest inner loop). */
  def l2(a: Column, b: Column): Column =
    graft.functions.L2SquaredLong.l2_squared_long(a, b)

  /** One row per subspace: explode a LITERAL index array (a plain
    * generate — no lambdas; the transform-over-sequence form it
    * replaces built per-row structs through interpreted lambdas) and
    * slice the subvector in the projection above it. Input df must
    * carry (`key`, `qv`); output is (`key`, m, `out`). */
  private def subvecs(df: DataFrame, key: String, nSub: Int, subDim: Int,
                      out: String): DataFrame =
    df.select(col(key), col("qv"),
        explode(typedLit((0 until nSub).toList)).as("m"))
      .select(col(key), col("m"),
        slice(col("qv"), col("m") * subDim + 1, lit(subDim)).as(out))

  /** Per-subspace codebook: k deterministic sample vectors (smallest
    * md5(id), the `IvfFlat.codebook` draw), one row per (subspace m,
    * codeword cid, quantized codeword cw). k·nSub rows total —
    * broadcast-sized no matter the corpus.
    */
  def codebook(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, nSub: Int, subDim: Int): DataFrame =
    subvecs(
      emb.select(col(idCol).as("cid"), qint(col(vecCol)).as("qv"))
        .orderBy(md5(col("cid").cast("string")), col("cid")).limit(k),
      "cid", nSub, subDim, out = "cw")
      .select("m", "cid", "cw")

  /** PQ-encode a corpus: (id, m, code) — each vector's subvector m
    * mapped to its nearest codeword (integer L2, ties to the smaller
    * cid). One broadcast join + one (id, m)-keyed argmin; the result
    * is the compressed index a scan reads instead of raw vectors.
    */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             cb: DataFrame, nSub: Int, subDim: Int): DataFrame = {
    val sub = subvecs(
      emb.select(col(idCol).as("id"), qint(col(vecCol)).as("qv")),
      "id", nSub, subDim, out = "sv")
    val w = Window.partitionBy("id", "m").orderBy(col("d"), col("cid"))
    sub.join(broadcast(cb), "m")
      .select(col("id"), col("m"), col("cid"), l2(col("sv"), col("cw")).as("d"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id"), col("m"), col("cid").as("code"))
  }

  /** Asymmetric-distance (ADC) top-k: per query build the nSub×k
    * partial-distance lookup table from the query's RAW subvectors to
    * every codeword, broadcast it, and score each encoded candidate
    * as the sum of its nSub looked-up entries. Returns (q, rank,
    * neighbor, dist) with rank 1..k by (dist asc, neighbor asc).
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, cb: DataFrame,
              qIdCol: String, vecCol: String, k: Int,
              nSub: Int, subDim: Int): DataFrame = {
    val qsub = subvecs(
      queries.select(col(qIdCol).as("q"), qint(col(vecCol)).as("qv")),
      "q", nSub, subDim, out = "qsv")
    val lut = qsub.join(broadcast(cb), "m")
      .select(col("q"), col("m"), col("cid"), l2(col("qsv"), col("cw")).as("pd"))
    val parts = codes.join(broadcast(lut),
        codes("m") === lut("m") && codes("code") === lut("cid"))
      .select(col("q"), col("id").as("neighbor"), col("pd"))
    val w = Window.partitionBy("q").orderBy(col("dist"), col("neighbor"))
    parts.where(col("q") =!= col("neighbor"))
      .groupBy("q", "neighbor").agg(sum("pd").as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("q", "rank", "neighbor", "dist")
  }
}
