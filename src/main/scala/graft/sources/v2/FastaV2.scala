package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit, LineRecordReader, TextInputFormat}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.graft.BroadcastHadoopConf
import org.apache.spark.unsafe.types.UTF8String

import graft.seq.Fasta

/** DataSourceV2 FASTA connector: `spark.read.format("fasta").load(p)`
  * (registered shortname via DataSourceRegister). The same
  * `\n>`-delimited distributed parse as [[graft.seq.Fasta.read]]
  * (pygr seqfmt.pyx:21-59), integrated as a first-class Spark source:
  *
  *  - SPLIT PLANNING rides Hadoop's `TextInputFormat.getSplits`, so
  *    one 100 TB FASTA file shards into block-sized partitions (the
  *    record delimiter makes split boundaries record-safe — each
  *    reader discards the partial record before its first delimiter
  *    and reads one past its end, the standard line-reader contract).
  *  - COLUMN PRUNING via SupportsPushDownRequiredColumns: a query
  *    touching only (seq_id, length) never materializes the sequence
  *    string into rows (`.explain` shows the pruned ReadSchema).
  *  - FILTER PUSHDOWN via SupportsPushDownFilters: `seq_id = x` /
  *    `seq_id IN (...)` predicates reach the scan. Readers skip
  *    non-matching records after parsing only the HEADER line (the
  *    sequence string is never assembled), and — when the sidecar
  *    index written by [[graft.seq.Fasta.writeIndex]] is present —
  *    split planning keeps only the partitions whose byte range
  *    overlaps a matching record, so a 100 TB slice lookup reads a
  *    handful of blocks (pygr's on-disk `.pureseq`+index layout,
  *    `seqdb.py:63-119`, re-expressed as data-source pruning). The
  *    filters are also reported back to Spark as residual, so
  *    correctness never depends on the index: the sidecar carries a
  *    `_source_stat` freshness stamp (source length+mtime) that
  *    planning validates before pruning, so a missing OR stale index
  *    only costs pruning, never rows.
  *
  * Executors see the DRIVER's filesystem settings (s3a credentials,
  * HDFS nameservices…) through a broadcast `SerializableConfiguration`
  * — the same mechanism Spark's built-in file sources use: one
  * compressed shipment per executor, not a copy of the merged conf in
  * every serialized reader factory.
  */
class FastaDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fasta"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FastaDataSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "fasta source requires a single load path"))
    new FastaTable(path)
  }
}

object FastaDataSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("seq_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("seq", StringType, nullable = false),
    StructField("length", LongType, nullable = false)))
}

class FastaTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"fasta:$path"
  override def schema(): StructType = FastaDataSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FastaScanBuilder(path)
}

class FastaScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = FastaDataSource.SCHEMA
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.collect {
      case f @ EqualTo("seq_id", _: String) => f
      case f @ In("seq_id", vs) if vs.forall(_.isInstanceOf[String]) => f
    }
    // Everything stays residual: Spark re-evaluates post-scan, so a
    // missing sidecar index can only cost pruning, never correctness.
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    val ids: Array[String] = accepted.flatMap {
      case EqualTo(_, v: String) => Seq(v)
      case In(_, vs) => vs.toSeq.map(_.asInstanceOf[String])
      case _ => Seq.empty[String]
    }
    new FastaScan(path, required,
      if (accepted.nonEmpty) Some(ids.toSet) else None)
  }
}

case class FastaPartition(file: String, start: Long, length: Long)
    extends InputPartition

class FastaScan(path: String, required: StructType,
                idFilter: Option[Set[String]]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FastaScan(path=$path" +
      idFilter.map(s => s", seq_id∈{${s.toSeq.sorted.mkString(",")}}").getOrElse("") + ")"

  override def planInputPartitions(): Array[InputPartition] = {
    // planning runs on the driver: honor the session's Hadoop conf
    // (filesystem settings, split-size overrides)
    val conf = new Configuration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n>")
    val job = Job.getInstance(conf)
    FileInputFormat.setInputPaths(job, new Path(path))
    val splits: Array[InputPartition] =
      new TextInputFormat().getSplits(job).asScala.map { s =>
        val fs = s.asInstanceOf[FileSplit]
        FastaPartition(fs.getPath.toString, fs.getStart, fs.getLength)
          : InputPartition
      }.toArray
    idFilter match {
      case Some(ids) =>
        val ranges = FastaScan.indexRanges(conf, path, ids)
        ranges match {
          case Some(rs) => splits.filter { ip =>
            val p = ip.asInstanceOf[FastaPartition]
            rs.exists { case (f, a, b) =>
              // pad by the 2-byte "\n>" delimiter: a record starting
              // exactly at a split boundary is emitted by the PREVIOUS
              // split (whose range holds its delimiter)
              f == p.file && a - 2 < p.start + p.length && b > p.start
            }
          }
          case None => splits // no sidecar index: scan everything
        }
      case None => splits
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    new FastaReaderFactory(required.fieldNames,
      org.apache.spark.graft.GraftSparkHooks.broadcastHadoopConf(
        sc, sc.hadoopConfiguration),
      idFilter)
  }
}

object FastaScan {
  /** Matching (file, recStart, recEnd) byte ranges from the sidecar
    * index directory `<path>.gfidx` (TSV part files written by
    * `Fasta.writeIndex`), or None when no index exists OR the index
    * is STALE — `_source_stat` records each source file's
    * (length, mtime) at index-build time, and any absence or mismatch
    * against the live file status disables pruning (byte offsets from
    * a rewritten file would prune splits that hold matching records;
    * the residual filter can't restore rows from splits never
    * scanned). Driver-side; the index is one small row per SEQUENCE,
    * not per byte.
    */
  private[v2] def indexRanges(conf: Configuration, path: String,
                              ids: Set[String]): Option[Seq[(String, Long, Long)]] = {
    val idx = new Path(path + ".gfidx")
    val fs = idx.getFileSystem(conf)
    if (!fs.exists(idx)) return None
    if (!indexFresh(conf, path)) return None
    val parts = fs.listStatus(idx).filter(_.isFile)
      .map(_.getPath).filterNot(_.getName.startsWith("_"))
    val out = Seq.newBuilder[(String, Long, Long)]
    parts.foreach { p =>
      val in = fs.open(p)
      try {
        scala.io.Source.fromInputStream(in, "UTF-8").getLines().foreach { line =>
          val f = line.split('\t')
          if (f.length >= 4 && ids.contains(f(0)))
            out += ((f(1), f(2).toLong, f(3).toLong))
        }
      } finally in.close()
    }
    Some(out.result())
  }

  /** True iff `_source_stat` exists and the LIVE file set — enumerated
    * exactly the way `Fasta.writeIndex` enumerates it (globStatus, dirs
    * expanded one level to their files) — EQUALS the stamped set on
    * (path, length, mtime). Set equality, not per-stamp lookup: a file
    * ADDED after writeIndex has no index rows, so a pruned scan would
    * silently drop its records; the added file makes the live set a
    * strict superset of the stamp → stale → full scan. A legacy index
    * without the stamp is likewise stale — pruning is a pure
    * optimization, so the safe answer to "can't prove fresh" is
    * "scan all splits". */
  private[v2] def indexFresh(conf: Configuration, path: String): Boolean = {
    val statP = new Path(path + ".gfidx/_source_stat")
    val fs = statP.getFileSystem(conf)
    if (!fs.exists(statP)) return false
    val in = fs.open(statP)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    val stamped = lines.filter(_.nonEmpty).flatMap { line =>
      val f = line.split('\t')
      if (f.length >= 3) Some((f(0), f(1).toLong, f(2).toLong)) else None
    }.toSet
    val srcP = new Path(path)
    val srcFs = srcP.getFileSystem(conf)
    val live =
      try {
        Option(srcFs.globStatus(srcP)).getOrElse(Array.empty).flatMap { st =>
          if (st.isDirectory) srcFs.listStatus(st.getPath).filter(_.isFile)
          else Array(st)
        }.map(st =>
          (st.getPath.toString, st.getLen, st.getModificationTime)).toSet
      } catch { case _: java.io.FileNotFoundException => return false }
    live == stamped && live.nonEmpty
  }
}

class FastaReaderFactory(fields: Array[String],
                         conf: BroadcastHadoopConf,
                         idFilter: Option[Set[String]])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FastaPartitionReader(partition.asInstanceOf[FastaPartition],
      fields, conf, idFilter)
}

class FastaPartitionReader(p: FastaPartition, fields: Array[String],
                           bc: BroadcastHadoopConf,
                           idFilter: Option[Set[String]])
    extends PartitionReader[InternalRow] {

  // copy of the broadcast conf (cheap — no XML re-parse): the
  // TaskAttemptContext may mutate its conf, and the broadcast value is
  // shared by every reader on the executor
  private val conf = new Configuration(bc.value)
  // the delimiter MUST go through the constructor: the no-arg
  // LineRecordReader ignores the conf key and splits on newlines
  // (verified empirically — header and sequence lines came back as
  // separate records)
  private val reader = new LineRecordReader(
    "\n>".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  reader.initialize(
    new FileSplit(new Path(p.file), p.start, p.length, Array.empty[String]),
    new TaskAttemptContextImpl(conf, new TaskAttemptID()))

  // a (seq_id, length)-pruned scan must not pay the sequence-string
  // materialization: length is counted from the record bytes instead
  // of building the joined string
  private val needSeqString = fields.contains("seq")
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      val rec = reader.getCurrentValue.toString
      // pushed seq_id filter: header-only peek, skip before any
      // sequence-string work (the per-record half of the pushdown;
      // the sidecar index prunes whole partitions above it)
      if (rec.nonEmpty && idFilter.forall(_.contains(Fasta.recordId(rec)))) {
        val values: Array[Any] =
          if (needSeqString) {
            val (id, title, seq, len) = Fasta.parseRecord(rec)
            fields.map {
              case "seq_id" => UTF8String.fromString(id)
              case "title"  => UTF8String.fromString(title)
              case "seq"    => UTF8String.fromString(seq)
              case "length" => java.lang.Long.valueOf(len)
            }.asInstanceOf[Array[Any]]
          } else {
            val (id, title, len) = Fasta.parseMeta(rec)
            fields.map {
              case "seq_id" => UTF8String.fromString(id)
              case "title"  => UTF8String.fromString(title)
              case "length" => java.lang.Long.valueOf(len)
            }.asInstanceOf[Array[Any]]
          }
        row = new GenericInternalRow(values)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
