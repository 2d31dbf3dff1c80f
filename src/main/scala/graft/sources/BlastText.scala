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

  /** One maximal ungapped 1:1 run inside an HSP (pygr's
    * `BlastHitParser` yields per-run intervals the same way,
    * `parse_blast.py:100-134`). Coordinates 0-based half-open,
    * forward on both axes; `ori` = -1 for minus-strand subjects.
    */
  case class HspRun(query_id: String, hit_id: String, hsp_no: Long,
                    run_no: Long, q_start: Long, q_end: Long,
                    s_start: Long, s_end: Long, ori: Int,
                    bits: Double, evalue_str: String,
                    n_ident: Long, n_aligned: Long)

  /** Streaming line-by-line parse: one report state machine over a
    * lazy line iterator, emitting each finished HSP (with its gapped
    * query/subject texts) as soon as its last segment line passes —
    * the per-partition memory bound is one HSP, not the report.
    */
  private def parseCore(lines: Iterator[String]): Iterator[(Hsp, String, String)] =
    new Iterator[(Hsp, String, String)] {
      private var query = ""; private var hit = ""; private var hspNo = 0L
      private var bits = 0.0; private var expect = ""; private var nid = 0L; private var nal = 0L
      private var minus = false
      private var qText = new StringBuilder; private var sText = new StringBuilder
      private var qFirst = -1L; private var qLast = -1L; private var sFirst = -1L; private var sLast = -1L
      private var pending: (Hsp, String, String) = _
      private var finished = false

      private def flush(): Unit = {
        if (qText.nonEmpty && qFirst >= 0) {
          val (qs, qe) = (qFirst - 1, qLast) // 1-based inclusive → half-open
          val (ss, se) =
            if (minus) (sLast - 1, sFirst) // minus: coords descend
            else (sFirst - 1, sLast)
          pending = (Hsp(query, hit, hspNo, qs, qe, ss, se,
            if (minus) -1 else 1, bits, expect, nid, nal),
            qText.toString, sText.toString)
          hspNo += 1
        }
        qText = new StringBuilder; sText = new StringBuilder
        qFirst = -1; qLast = -1; sFirst = -1; sLast = -1
        minus = false
      }

      private def step(l: String): Unit = l match {
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

      def hasNext: Boolean = {
        while (pending == null && lines.hasNext) step(lines.next())
        if (pending == null && !finished) { flush(); finished = true }
        pending != null
      }

      def next(): (Hsp, String, String) = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
    }

  /** Streaming HSP parse over a lazy line iterator. */
  def parseLines(lines: Iterator[String]): Iterator[Hsp] =
    parseCore(lines).map(_._1)

  /** Streaming parse straight to ungapped 1:1 runs: each HSP's gapped
    * query/subject texts are decomposed by `GappedAlign.ungappedRuns`
    * and mapped to forward half-open coordinates (minus-strand
    * subjects descend from the HSP's high coordinate, so run offset
    * `so` covers forward `[s_hi - so - len, s_hi - so)`).
    */
  def parseRunLines(lines: Iterator[String]): Iterator[HspRun] =
    parseCore(lines).flatMap { case (h, qt, st) =>
      GappedAlign.ungappedRuns(qt, st).zipWithIndex.map {
        case ((qo, so, len), runNo) =>
          val qs = h.q_start + qo
          val (ss, se) =
            if (h.ori < 0) (h.s_end - so - len, h.s_end - so)
            else (h.s_start + so, h.s_start + so + len)
          HspRun(h.query_id, h.hit_id, h.hsp_no, runNo.toLong,
            qs, qs + len, ss, se, h.ori,
            h.bits, h.evalue_str, h.n_ident, h.n_aligned)
      }
    }

  /** Parse one report (one string = whole file or one query's chunk). */
  def parseReport(text: String): Seq[Hsp] =
    parseLines(text.split("\n").iterator).toSeq

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
