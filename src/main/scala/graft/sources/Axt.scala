package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.align.AlignBlock

/** axtNet pairwise alignment reader (pygr `cnestedlist.pyx:1858-1975`;
  * SURVEY.md S5). Each record: a header line
  * `id tName tStart tEnd qName qStart qEnd strand score` (1-based,
  * inclusive) followed by two gapped sequence lines. `-` strand means
  * the query coordinates count on the reverse strand of a qSize-long
  * sequence — axt carries no qSize, so reverse coords are emitted on
  * the reverse axis with ori=-1 and left to the caller to flip when
  * the query sequence length is known (matches the reference, which
  * resolves them against the seqDict at build time).
  */
object Axt {

  def read(spark: SparkSession, path: String,
           srcPrefix: String = "", destPrefix: String = ""): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n\n")
    spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
      .filter(b => b.trim.nonEmpty && !b.trim.startsWith("#"))
      .flatMap { block =>
        val lines = block.split("\n").filter(_.nonEmpty)
        if (lines.length < 3) Seq.empty
        else {
          val h = lines(0).trim.split("\\s+")
          val (id, tName, tStart, qName, qStart, fwd) =
            (h(0).toLong, h(1), h(2).toLong - 1, h(4), h(5).toLong - 1, h(7) == "+")
          GappedAlign.ungappedRuns(lines(1), lines(2)).map { case (to, qo, len) =>
            AlignBlock(srcPrefix + tName, tStart + to, tStart + to + len,
              destPrefix + qName, qStart + qo, qStart + qo + len,
              if (fwd) 1 else -1, id)
          }
        }
      }.toDF()
  }
}
