package graft.seq

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA ingest/export (pygr `seqfmt.pyx:21-59`, `sequtil.py:38-78`;
  * SURVEY.md S1/S2).
  *
  * Distributed parse: records are split on the `\n>` delimiter by the
  * Hadoop line reader itself (textinputformat.record.delimiter), so a
  * 100TB FASTA shards across executors without any driver-side pass;
  * each task sees whole records.
  */
object Fasta {

  /** Read FASTA → (seq_id, title, seq, length). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n>")
    val records = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
      .filter(_.nonEmpty)
      .map(parseRecord)
    records.toDF("seq_id", "title", "seq", "length")
  }

  /** One `\n>`-delimited record → (seq_id, title, seq, length).
    * Shared by the RDD reader above and the DataSourceV2 connector
    * (`graft.sources.v2.FastaDataSource`). */
  private[graft] def parseRecord(rec: String): (String, String, String, Long) = {
    val body = if (rec.startsWith(">")) rec.substring(1) else rec
    val nl = body.indexOf('\n')
    val (header, seqLines) =
      if (nl < 0) (body, "") else (body.substring(0, nl), body.substring(nl + 1))
    val sp = header.indexWhere(_.isWhitespace)
    val id = if (sp < 0) header.trim else header.substring(0, sp)
    val title = if (sp < 0) "" else header.substring(sp + 1).trim
    val seq = seqLines.replace("\n", "").replace("\r", "")
    (id, title, seq, seq.length.toLong)
  }

  /** seq_id alone — the cheapest possible peek (header line only, no
    * allocation beyond the id substring) for the pushed-filter path of
    * the V2 connector: non-matching records are skipped before any
    * sequence-string work. */
  private[graft] def recordId(rec: String): String = {
    val start = if (rec.startsWith(">")) 1 else 0
    var end = rec.indexOf('\n', start)
    if (end < 0) end = rec.length
    var sp = start
    while (sp < end && !rec.charAt(sp).isWhitespace) sp += 1
    rec.substring(start, sp).trim
  }

  /** Build the `<path>.gfidx` sidecar index the V2 connector prunes
    * splits with: one TSV row `(seq_id, file, rec_start, rec_end)` per
    * sequence, byte offsets from the Hadoop line reader's record keys
    * (the position where each `\n>`-delimited record starts). Fully
    * distributed — the same record-safe split scan as `read`; the
    * index is sequence-count-sized, the FASTA-bytes-sized input is
    * never collected. The analog of pygr's persistent seq-db index
    * (`seqdb.py:63-119`) and of samtools faidx, as a Spark job.
    */
  def writeIndex(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n>")
    spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, it) =>
        val file = split.asInstanceOf[
          org.apache.hadoop.mapreduce.lib.input.FileSplit].getPath.toString
        it.collect { case (k, v) if v.getLength > 0 =>
          (recordId(v.toString), file, k.get, k.get + v.getLength)
        }
      }
      .toDF("seq_id", "file", "rec_start", "rec_end")
      .write.mode("overwrite").option("sep", "\t").csv(path + ".gfidx")
    // Freshness stamp: byte offsets are only valid against the exact
    // bytes they were computed from, so record each source file's
    // (length, mtime). Scan planning refuses to prune when the stamp
    // is absent or disagrees with the live file status — a stale
    // index silently pointing at wrong offsets would otherwise DROP
    // rows (pruned splits are never scanned; the residual filter
    // can't resurrect them).
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(conf)
    val stamped = fs.globStatus(new Path(path)).flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile) else Array(st)
    }.map(st => s"${st.getPath}\t${st.getLen}\t${st.getModificationTime}")
    val out = fs.create(new Path(path + ".gfidx/_source_stat"), true)
    try out.write((stamped.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Header fields + sequence LENGTH without materializing the joined
    * sequence string — the hot path for a column-pruned (seq_id,
    * length) scan: length is a count of non-newline chars, no copies.
    */
  private[graft] def parseMeta(rec: String): (String, String, Long) = {
    val body = if (rec.startsWith(">")) rec.substring(1) else rec
    val nl = body.indexOf('\n')
    val header = if (nl < 0) body else body.substring(0, nl)
    val sp = header.indexWhere(_.isWhitespace)
    val id = if (sp < 0) header.trim else header.substring(0, sp)
    val title = if (sp < 0) "" else header.substring(sp + 1).trim
    var len = 0L
    var i = if (nl < 0) body.length else nl + 1
    while (i < body.length) {
      val c = body.charAt(i)
      if (c != '\n' && c != '\r') len += 1
      i += 1
    }
    (id, title, len)
  }

  /** Format (seq_id, seq) rows as FASTA text with 60-column wrap
    * (pygr `write_fasta`, `sequtil.py:60-78`); one output string per
    * record, writable via `df.write.text`.
    */
  def format(df: DataFrame, idCol: String = "seq_id", seqCol: String = "seq"): DataFrame =
    df.select(concat(lit(">"), col(idCol), lit("\n"),
      // insert a newline after every 60 chars, no trailing newline
      regexp_replace(regexp_replace(col(seqCol), "(.{60})", "$1\n"), "\n$", ""))
      .as("fasta"))
}
