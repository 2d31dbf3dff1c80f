package graft.seq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked sequence database (pygr `SequenceFileDB`,
  * `seqdb.py:180-473`; SURVEY.md §1.1): `seq_info(seq_id, length)` +
  * `seq_chunks(seq_id, chunk_no, chunk)` replace the `.pureseq`
  * flat file + offset index — parquet row-group pruning on
  * (seq_id, chunk_no) plays the role of seek(offset).
  *
  * `strslice` touches only the chunks covering [start, stop), so a
  * slice of a 100GB chromosome reads O(slice) bytes, like the
  * reference's seek-based `strslice` (`seqdb.py:458-472`).
  */
class SeqDb(val info: DataFrame, val chunks: DataFrame, val chunkSize: Int) {

  /** Batched strslice: queries(q_id, seq_id, start, stop) → per-query
    * substring, assembled from the covering chunks only.
    */
  def strslice(queries: DataFrame): DataFrame = {
    val cs = lit(chunkSize.toLong)
    val q = queries
      .withColumn("c_lo", floor(col("start") / cs).cast("long"))
      .withColumn("c_hi", floor((col("stop") - 1) / cs).cast("long"))
    q.join(chunks, Seq("seq_id"))
      .where(col("chunk_no") >= col("c_lo") && col("chunk_no") <= col("c_hi"))
      .withColumn("piece", expr(
        s"substring(chunk, CAST(greatest(start - chunk_no * $chunkSize, 0) AS INT) + 1, " +
        s"CAST(least(stop - chunk_no * $chunkSize, $chunkSize) - greatest(start - chunk_no * $chunkSize, 0) AS INT))"))
      .groupBy("q_id", "seq_id", "start", "stop")
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("chunk_no"), col("piece")))), s => s("piece")), "").as("sl"))
  }
}

object SeqDb {

  /** Build from (seq_id, seq) rows: explodes each sequence into
    * fixed-size chunks. The chunk explode happens executor-side, so
    * ingest scales with the corpus, not the driver.
    */
  def fromSequences(df: DataFrame, chunkSize: Int = 1 << 20): SeqDb = {
    val info = df.select(col("seq_id"), length(col("seq")).cast("long").as("length"))
    // native cover-mode window generator: chunks tile the sequence
    // (trailing partial kept, empty sequence = one empty chunk — the
    // same rows as the interpreted transform-over-sequence explode it
    // replaces, without the per-chunk lambda dispatch)
    val chunks = df
      .select(col("seq_id"),
        graft.functions.CharGramsExplode.char_grams_explode(
          col("seq"), chunkSize, stride = chunkSize, cover = true)
          .as(Seq("cpos", "chunk")))
      .select(col("seq_id"),
        ((col("cpos") - 1L) / chunkSize).cast("long").as("chunk_no"), col("chunk"))
    new SeqDb(info, chunks, chunkSize)
  }

  def load(spark: SparkSession, dir: String, chunkSize: Int): SeqDb =
    new SeqDb(spark.read.parquet(s"$dir/seq_info"),
      spark.read.parquet(s"$dir/seq_chunks"), chunkSize)

  def save(db: SeqDb, dir: String): Unit = {
    db.info.write.mode("overwrite").parquet(s"$dir/seq_info")
    db.chunks.repartitionByRange(col("seq_id"), col("chunk_no"))
      .sortWithinPartitions("seq_id", "chunk_no")
      .write.mode("overwrite").parquet(s"$dir/seq_chunks")
  }
}
