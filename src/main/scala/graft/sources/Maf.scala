package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.align.AlignBlock

/** UCSC MAF reader (pygr `cnestedlist.pyx:1725-1837` +
  * `apps/maf2nclist.c`; SURVEY.md S4), Spark-first: blocks split on
  * blank lines by the Hadoop record reader (executor-side), each
  * block's non-reference rows emitted as pairwise ungapped runs
  * against the block's first `s` row. No LPO/union coordinates —
  * pairwise rows keyed by string seq ids (SURVEY.md §7.4).
  *
  * `s` line: `s src start size strand srcSize gappedText`; `-` strand
  * coordinates count from the reverse end and are normalized to
  * forward coords with relative orientation -1.
  */
object Maf {

  private case class SLine(src: String, start: Long, size: Long,
                           fwd: Boolean, srcSize: Long, text: String)

  private def parseS(line: String): SLine = {
    val f = line.trim.split("\\s+")
    SLine(f(1), f(2).toLong, f(3).toLong, f(4) == "+", f(5).toLong, f(6))
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n\n")
    val blocks = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString)
      .filter(_.trim.nonEmpty)
    blocks.zipWithIndex.flatMap { case (block, blockId) =>
      val sLines = block.split("\n").iterator
        .filter(_.startsWith("s ")).map(parseS).toSeq
      if (sLines.size < 2) Seq.empty
      else {
        val ref = sLines.head
        require(ref.fwd, s"MAF reference row on '-' strand not supported: ${ref.src}")
        sLines.tail.zipWithIndex.flatMap { case (other, oi) =>
          GappedAlign.ungappedRuns(ref.text, other.text).map {
            case (ro, oo, len) =>
              val srcStart = ref.start + ro
              val (destStart, destEnd, ori) =
                if (other.fwd) (other.start + oo, other.start + oo + len, 1)
                else {
                  // '-' strand start counts from the reverse end
                  val fwdEnd = other.srcSize - (other.start + oo)
                  (fwdEnd - len, fwdEnd, -1)
                }
              AlignBlock(ref.src, srcStart, srcStart + len,
                other.src, destStart, destEnd, ori,
                blockId * 1000L + oi)
          }
        }
      }
    }.toDF()
  }
}
