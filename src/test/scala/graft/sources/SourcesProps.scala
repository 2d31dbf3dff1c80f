package graft.sources

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.SparkSession

/** Fuzz-roundtrip properties for the alignment text sources (S4 MAF,
  * S5 axtNet) and their shared gapped-run decomposer: random
  * alignments are RENDERED as the wire format and read back through
  * the real Spark readers; the recovered blocks must equal an
  * independently-derived expectation. The minus-strand arithmetic is
  * the target surface — MAF '-' rows count from the reverse end of a
  * srcSize-long axis (`cnestedlist.pyx:1725-1837` semantics), axt '-'
  * records stay on the reverse axis by design — exactly where an
  * off-by-one would hide from the fixture goldens in SourcesSpec.
  */
object SourcesProps extends Properties("graft.sources") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // a gapped alignment as column segments: M = letters both sides,
  // GA = gap in a (ref), GB = gap in b (other), GG = gap in both (a
  // run BREAK that consumes neither side — the decomposer must not
  // merge across it)
  private sealed trait Seg { def len: Int }
  private case class M(len: Int) extends Seg
  private case class GA(len: Int) extends Seg
  private case class GB(len: Int) extends Seg
  private case class GG(len: Int) extends Seg

  private val segsGen: Gen[List[Seg]] = Gen.choose(1, 9).flatMap { n =>
    Gen.listOfN(n, for {
      len <- Gen.choose(1, 6)
      seg <- Gen.oneOf(M(len), M(len), GA(len), GB(len), GG(len))
    } yield seg)
  }

  private def render(segs: List[Seg]): (String, String) = {
    val a = new StringBuilder; val b = new StringBuilder
    segs.foreach {
      case M(n) => a.append("A" * n); b.append("C" * n)
      case GA(n) => a.append("-" * n); b.append("G" * n)
      case GB(n) => a.append("T" * n); b.append("-" * n)
      case GG(n) => a.append("-" * n); b.append("-" * n)
    }
    (a.toString, b.toString)
  }

  /** Independent expectation: maximal both-letter column stretches,
    * offsets counting non-gap columns per side. */
  private def runsOf(segs: List[Seg]): Seq[(Long, Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long, Long)]
    var ai = 0L; var bi = 0L
    var cur: Option[(Long, Long, Long)] = None
    segs.foreach {
      case M(n) =>
        cur = cur match {
          case Some((ra, rb, l)) => Some((ra, rb, l + n))
          case None => Some((ai, bi, n.toLong))
        }
        ai += n; bi += n
      case g =>
        cur.foreach(out += _); cur = None
        g match {
          case GA(n) => bi += n
          case GB(n) => ai += n
          case _ => ()
        }
    }
    cur.foreach(out += _)
    out.result()
  }

  property("ungappedRuns == maximal both-letter stretches (incl. double-gap breaks)") =
    forAll(segsGen) { segs =>
      val (a, b) = render(segs)
      GappedAlign.ungappedRuns(a, b) == runsOf(segs)
    }

  private case class MafRow(other: String, start: Long, fwd: Boolean,
                            srcSize: Long, segs: List[Seg])

  private val mafBlockGen: Gen[(Long, List[MafRow])] = for {
    refStart <- Gen.choose(0L, 500L)
    nOthers <- Gen.choose(1, 3)
    rows <- Gen.listOfN(nOthers, for {
      oi <- Gen.choose(0, 2)
      start <- Gen.choose(0L, 300L)
      fwd <- Gen.oneOf(true, false)
      slack <- Gen.choose(0L, 50L)
      segs <- segsGen
    } yield {
      val letters = segs.collect { case M(n) => n.toLong case GA(n) => n.toLong }.sum
      MafRow(s"o$oi", start, fwd, start + letters + slack, segs)
    })
  } yield (refStart, rows)

  property("MAF render -> read == strand-normalized pairwise runs") =
    forAll(Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, mafBlockGen))) { blocks =>
      val text = new StringBuilder("##maf version=1\n\n")
      val expect = Seq.newBuilder[(String, Long, Long, String, Long, Long, Int)]
      blocks.foreach { case (refStart, rows) =>
        // every row's ref text must share one column count: pad each
        // row pair onto its own ref columns is NOT maf — instead emit
        // one two-row block per other (a valid maf file is a sequence
        // of blocks; pairwise semantics are per ref-other pair anyway)
        rows.foreach { row =>
          val (refTxt, otherTxt) = render(row.segs)
          text.append("a score=0\n")
          val refLetters = refTxt.count(_ != '-')
          text.append(s"s ref $refStart $refLetters + ${refStart + refLetters + 10} $refTxt\n")
          val oLetters = otherTxt.count(_ != '-')
          val strand = if (row.fwd) "+" else "-"
          text.append(s"s ${row.other} ${row.start} $oLetters $strand ${row.srcSize} $otherTxt\n")
          text.append("\n")
          runsOf(row.segs).foreach { case (ro, oo, len) =>
            val ss = refStart + ro
            val (ds, de, ori) =
              if (row.fwd) (row.start + oo, row.start + oo + len, 1)
              else {
                // '-' strand: offsets count on the reversed axis of a
                // srcSize-long sequence; forward coords flip the END
                val fwdEnd = row.srcSize - (row.start + oo)
                (fwdEnd - len, fwdEnd, -1)
              }
            expect += ((("ref"): String, ss, ss + len, row.other, ds, de, ori))
          }
        }
      }
      val f = java.nio.file.Files.createTempFile("maf_prop", ".maf")
      java.nio.file.Files.write(f, text.toString.getBytes("UTF-8"))
      try {
        val got = Maf.read(spark, f.toString)
          .select("src_id", "src_start", "src_end", "dest_id",
            "dest_start", "dest_end", "dest_ori")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
            r.getLong(4), r.getLong(5), r.getInt(6)))
          .toSeq.sorted
        got == expect.result().sorted
      } finally java.nio.file.Files.deleteIfExists(f)
    }

  property("axt render -> read == 1-based-header-corrected runs") =
    forAll(Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, for {
      tStart <- Gen.choose(0L, 400L)
      qStart <- Gen.choose(0L, 400L)
      fwd <- Gen.oneOf(true, false)
      segs <- segsGen
    } yield (tStart, qStart, fwd, segs)))) { recs =>
      val text = new StringBuilder
      val expect = Seq.newBuilder[(String, Long, Long, String, Long, Long, Int, Long)]
      recs.zipWithIndex.foreach { case ((tStart, qStart, fwd, segs), i) =>
        val (tTxt, qTxt) = render(segs)
        val tLen = tTxt.count(_ != '-'); val qLen = qTxt.count(_ != '-')
        // header is 1-based INCLUSIVE on both axes
        text.append(s"$i chrT ${tStart + 1} ${tStart + tLen} chrQ ${qStart + 1} " +
          s"${qStart + qLen} ${if (fwd) "+" else "-"} 99\n$tTxt\n$qTxt\n\n")
        runsOf(segs).foreach { case (to, qo, len) =>
          expect += (("chrT", tStart + to, tStart + to + len,
            "chrQ", qStart + qo, qStart + qo + len, if (fwd) 1 else -1, i.toLong))
        }
      }
      val f = java.nio.file.Files.createTempFile("axt_prop", ".axt")
      java.nio.file.Files.write(f, text.toString.getBytes("UTF-8"))
      try {
        val got = Axt.read(spark, f.toString)
          .select("src_id", "src_start", "src_end", "dest_id",
            "dest_start", "dest_end", "dest_ori", "block_id")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
            r.getLong(4), r.getLong(5), r.getInt(6), r.getLong(7)))
          .toSeq.sorted
        got == expect.result().sorted
      } finally java.nio.file.Files.deleteIfExists(f)
    }
}
