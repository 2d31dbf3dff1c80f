package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver testdata by whole-corpus
  * replication with id offsets (the TPC-H-style scaling shape): every
  * foreign key moves by the same per-replica stride so join
  * cardinalities scale linearly, dimensions (region/nation) stay
  * fixed, and derived content is varied per replica so content-based
  * operators (dedup, ANN) see new mass instead of 10 exact copies —
  * replica text is a deterministic word scramble (token frequencies
  * preserved, shingle overlap destroyed), replica embeddings get a
  * hash-keyed jitter.
  *
  * Usage: runMain graft.tools.ScaleData [fromDir] [toDir] [copies]
  * Bench it with SPARK_GRAFT_SF_DIR=<toDir>.
  */
object ScaleData {

  private val Strides = Map(
    "custkey" -> 100000L, "suppkey" -> 10000L, "partkey" -> 100000L,
    "orderkey" -> 1000000L, "eventid" -> 1000000L, "userid" -> 100000L,
    "docid" -> 100000L, "vecid" -> 100000L)

  def main(args: Array[String]): Unit = {
    val from = args.headOption.getOrElse("/root/testdata/sf0.1")
    val to = args.lift(1).getOrElse("localdata/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.Graft.session("graft-scale")
    try run(spark, from, to, copies) finally spark.stop()
  }

  def run(spark: SparkSession, from: String, to: String, copies: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$from/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$to/$t.parquet")
    // replicated FACT tables spread over `copies` files (~one
    // base-corpus-sized file each): a real corpus at N× scale is N×
    // more same-sized files, not one N×-bigger file — and the base
    // fixtures are single-row-group parquet a scan cannot split, so
    // without this every ×100 table would still scan as 1-3 tasks and
    // the drift audit would measure file layout, not the operators
    def writeFact(df: DataFrame, t: String): Unit =
      df.repartition(math.max(2, copies)).write.mode("overwrite")
        .parquet(s"$to/$t.parquet")
    def rep(df: DataFrame) =
      df.withColumn("__r", explode(sequence(lit(0L), lit(copies - 1L))))
    def off(c: String, stride: Long) = col(c) + col("__r") * stride

    write(read("region"), "region")
    write(read("nation"), "nation")

    writeFact(rep(read("customer"))
      .withColumn("c_custkey", off("c_custkey", Strides("custkey")))
      .drop("__r"), "customer")

    writeFact(rep(read("supplier"))
      .withColumn("s_suppkey", off("s_suppkey", Strides("suppkey")))
      .drop("__r"), "supplier")

    writeFact(rep(read("part"))
      .withColumn("p_partkey", off("p_partkey", Strides("partkey")))
      .drop("__r"), "part")

    writeFact(rep(read("orders"))
      .withColumn("o_orderkey", off("o_orderkey", Strides("orderkey")))
      .withColumn("o_custkey", off("o_custkey", Strides("custkey")))
      .drop("__r"), "orders")

    writeFact(rep(read("lineitem"))
      .withColumn("l_orderkey", off("l_orderkey", Strides("orderkey")))
      .withColumn("l_partkey", off("l_partkey", Strides("partkey")))
      .withColumn("l_suppkey", off("l_suppkey", Strides("suppkey")))
      .drop("__r"), "lineitem")

    // ts arrives as nanos-long (Graft.session sets nanosAsLong); the
    // engine only ever reads it via integer division, so the replica
    // keeps it as BIGINT nanos
    writeFact(rep(read("events"))
      .withColumn("event_id", off("event_id", Strides("eventid")))
      .withColumn("user_id", off("user_id", Strides("userid")))
      .drop("__r"), "events")

    // replica text: tokens reordered by a per-(token, position,
    // replica) md5 — token frequencies (quality/langid/token counts)
    // are preserved, shingle sets are not, so near-dup mass stays
    // linear in corpus size rather than every replica pairing up
    writeFact(rep(read("documents"))
      .withColumn("doc_id", off("doc_id", Strides("docid")))
      .withColumn("text",
        when(col("__r") === 0, col("text")).otherwise(
          concat_ws(" ", transform(
            array_sort(zip_with(
              split(col("text"), " "),
              sequence(lit(1), size(split(col("text"), " "))),
              (w, i) => struct(
                md5(concat(w, i.cast("string"), col("__r").cast("string"))).as("k"),
                w.as("w")))),
            s => s.getField("w")))))
      .withColumn("n_chars", length(col("text")))
      .drop("__r"), "documents")

    // replica embeddings are INDEPENDENT hash-random vectors, not
    // jittered copies — a jittered copy is a true near-duplicate of
    // its original (cos ≈ 0.9999), which would add 45 cross-replica
    // dup pairs per source vector and swamp every near-dup operator
    // with quadratic mass the real corpus growth wouldn't have
    writeFact(rep(read("embeddings"))
      .withColumn("vec_id", off("vec_id", Strides("vecid")))
      .withColumn("embedding",
        when(col("__r") === 0, col("embedding")).otherwise(
          transform(
            sequence(lit(1), size(col("embedding"))),
            i => ((pmod(hash(col("vec_id"), i, col("__r")), lit(2001))
              .cast("double") - 1000.0) / 1000.0).cast("float"))))
      .drop("__r"), "embeddings")
  }
}
