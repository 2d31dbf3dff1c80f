package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parser for classic `blastall` pairwise text output (pygr
  * `parse_blast.py:39-215`; SURVEY.md S6): per query, per subject,
  * per HSP — score/expect/identities header lines, then paired
  * `Query:`/`Sbjct:` gapped segments that concatenate into one gapped
  * alignment, decomposed into ungapped runs. Coordinates normalized
  * to 0-based half-open; Minus-strand subjects get ori=-1 with
  * forward coords.
  */
object BlastText {

  case class Hsp(query_id: String, hit_id: String, hsp_no: Long,
                 q_start: Long, q_end: Long, s_start: Long, s_end: Long,
                 ori: Int, bits: Double, evalue_str: String,
                 n_ident: Long, n_aligned: Long)

  private val scoreRe = """\s*Score\s*=\s*([\d.eE+-]+)\s*bits.*Expect\s*=\s*([^,\s]+).*""".r
  private val identRe = """\s*Identities\s*=\s*(\d+)/(\d+).*""".r
  private val strandRe = """\s*Strand\s*=\s*(\w+)\s*/\s*(\w+).*""".r
  private val segRe = """\s*(Query|Sbjct):?\s+(\d+)\s+(\S+)\s+(\d+)\s*""".r

  /** Parse one report (one string = whole file or one query's chunk). */
  def parseReport(text: String): Seq[Hsp] = {
    val out = Seq.newBuilder[Hsp]
    var query: String = ""
    var hit: String = ""
    var hspNo = 0L
    // current HSP accumulator
    var bits = 0.0; var expect = ""; var nid = 0L; var nal = 0L
    var minus = false
    var qText = new StringBuilder; var sText = new StringBuilder
    var qFirst = -1L; var qLast = -1L; var sFirst = -1L; var sLast = -1L

    def flush(): Unit = {
      if (qText.nonEmpty && qFirst >= 0) {
        val (qs, qe) = (qFirst - 1, qLast) // 1-based inclusive → half-open
        val (ss, se) =
          if (minus) (sLast - 1, sFirst) // minus: coords descend
          else (sFirst - 1, sLast)
        out += Hsp(query, hit, hspNo, qs, qe, ss, se,
          if (minus) -1 else 1, bits, expect, nid, nal)
        hspNo += 1
      }
      qText = new StringBuilder; sText = new StringBuilder
      qFirst = -1; qLast = -1; sFirst = -1; sLast = -1
      minus = false
    }

    text.split("\n").foreach {
      case l if l.startsWith("Query=") =>
        flush(); query = l.drop(6).trim.split("\\s+").headOption.getOrElse("")
      case l if l.startsWith(">") =>
        flush(); hit = l.drop(1).trim.split("\\s+").headOption.getOrElse("")
      case scoreRe(b, e) => flush(); bits = b.toDouble; expect = e
      case identRe(i, a) => nid = i.toLong; nal = a.toLong
      case strandRe(_, s) => minus = s.equalsIgnoreCase("Minus")
      case segRe(kind, from, seg, to) =>
        if (kind == "Query") {
          if (qFirst < 0) qFirst = from.toLong
          qLast = to.toLong; qText ++= seg
        } else {
          if (sFirst < 0) sFirst = from.toLong
          sLast = to.toLong; sText ++= seg
        }
      case _ => ()
    }
    flush()
    out.result()
  }

  /** Map protein-space HSP coordinates back to DNA coordinates for
    * blastx/tblastn-style searches over six-frame translations (pygr
    * `BlastxMapping`, `blast.py:354-384`, frame slice info
    * `translationDB.py:99-123`): a protein interval [ps,pe) on frame
    * ±k (offset o = k-1, k in 1..3 — the `sixFrames` convention)
    * covers DNA
    *   - forward: [o + 3·ps, o + 3·pe), ori +1;
    *   - reverse: the same interval on the reverse complement, i.e.
    *     [L − (o + 3·pe), L − (o + 3·ps)) on the forward strand,
    *     ori −1 (L = `seqLen`).
    * Adds `dna_start`, `dna_end`, `dna_ori`.
    */
  def toDnaCoords(hsps: DataFrame, frame: String, pStart: String,
                  pEnd: String, seqLen: String): DataFrame = {
    val o = abs(col(frame)).cast("long") - 1L
    val fwd = col(frame) > 0
    hsps
      .withColumn("dna_start",
        when(fwd, o + col(pStart) * 3L)
          .otherwise(col(seqLen) - (o + col(pEnd) * 3L)))
      .withColumn("dna_end",
        when(fwd, o + col(pEnd) * 3L)
          .otherwise(col(seqLen) - (o + col(pStart) * 3L)))
      .withColumn("dna_ori", when(fwd, 1).otherwise(-1))
  }

  /** Distributed parse of saved blast reports (one report per file or
    * `Query=`-separated chunks) → HSP rows; ungapped sub-blocks can be
    * derived by joining back through `GappedAlign` when letter-exact
    * blocks are needed.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, text) => parseReport(text) }
      .toDF()
  }
}
