package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.align.AlignBlock

class SourcesSpec extends SparkSuite {

  private def writeTmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("src").toFile
    Files.writeString(new java.io.File(dir, name).toPath, content)
    dir.getAbsolutePath
  }

  test("gapped pair decomposes into ungapped runs") {
    assert(GappedAlign.ungappedRuns("AAA-GG", "AA--GG") ===
      Seq((0L, 0L, 2L), (3L, 2L, 2L)))
    assert(GappedAlign.ungappedRuns("----", "AAAA") === Seq.empty)
    assert(GappedAlign.ungappedRuns("ACGT", "ACGT") === Seq((0L, 0L, 4L)))
  }

  test("MAF reader: pairwise rows vs reference, minus-strand normalized") {
    val maf =
      """##maf version=1
        |a score=100.0
        |s hg.chr1 10 6 + 1000 AAA-CCC
        |s mm.chr2 20 7 + 2000 AAATCCC
        |s rn.chr3  5 6 - 100  AA-ACCC
        |
        |a score=50.0
        |s hg.chr1 50 4 + 1000 GGGG
        |s mm.chr2 70 4 + 2000 GGGG
        |""".stripMargin
    val dir = writeTmp("t.maf", maf)
    val got = Maf.read(spark, dir).as[AlignBlock](
      org.apache.spark.sql.Encoders.product[AlignBlock]).collect()
      .sortBy(b => (b.block_id, b.src_start)).toList
    // block 0 vs mm: runs AAA(3) then CCC(3): src 10-13 → 20-23; src 13-16 → 24-27
    assert(got.filter(b => b.dest_id == "mm.chr2" && b.block_id == 0) === List(
      AlignBlock("hg.chr1", 10, 13, "mm.chr2", 20, 23, 1, 0),
      AlignBlock("hg.chr1", 13, 16, "mm.chr2", 24, 27, 1, 0)))
    // block 0 vs rn ('-' strand, revStart=5, srcSize=100):
    // runs: ref[0..2)=rn[0..2), ref[3..6)=rn[3..6) (ref gap at 3 aligns rn 'A')
    val rn = got.filter(_.dest_id == "rn.chr3")
    assert(rn === List(
      AlignBlock("hg.chr1", 10, 12, "rn.chr3", 93, 95, -1, 1),
      AlignBlock("hg.chr1", 13, 16, "rn.chr3", 89, 92, -1, 1)))
    // second block
    assert(got.filter(_.block_id == 1000) === List(
      AlignBlock("hg.chr1", 50, 54, "mm.chr2", 70, 74, 1, 1000)))
  }

  test("axt reader: 1-based inclusive header, gapped lines") {
    val axt =
      """0 chrT 101 106 chrQ 201 205 + 3500
        |ACG-TT
        |ACGC-T
        |
        |1 chrT 201 204 chrQ 301 304 - 2000
        |ACGT
        |ACGT
        |""".stripMargin
    val dir = writeTmp("t.axt", axt)
    val got = Axt.read(spark, dir).as[AlignBlock](
      org.apache.spark.sql.Encoders.product[AlignBlock]).collect()
      .sortBy(b => (b.block_id, b.src_start)).toList
    assert(got === List(
      AlignBlock("chrT", 100, 103, "chrQ", 200, 203, 1, 0),
      AlignBlock("chrT", 104, 105, "chrQ", 204, 205, 1, 0),
      AlignBlock("chrT", 200, 204, "chrQ", 300, 304, -1, 1)))
  }

  test("blast text parser: plus and minus HSPs") {
    val report =
      """BLASTN 2.2.26
        |
        |Query= q1
        |         (28 letters)
        |
        |>subj1
        |          Length = 500
        |
        | Score = 54.3 bits (129), Expect = 2e-07
        | Identities = 25/28 (89%)
        | Strand = Plus / Plus
        |
        |Query: 1   ACGTACGTACGTAC 14
        |Sbjct: 101 ACGTACGTACGTAC 114
        |
        |Query: 15  GGGGACGTACGTAC 28
        |Sbjct: 115 GGGGACGTACGTAC 128
        |
        | Score = 30.1 bits (70), Expect = 0.004
        | Identities = 20/24 (83%)
        | Strand = Plus / Minus
        |
        |Query: 1   ACGTACGTACGTACGTACGTACGT 24
        |Sbjct: 424 ACGTACGTACGTACGTACGTACGT 401
        |""".stripMargin
    val hsps = BlastText.parseReport(report)
    assert(hsps.length === 2)
    val h0 = hsps.head
    assert((h0.query_id, h0.hit_id, h0.q_start, h0.q_end, h0.s_start, h0.s_end, h0.ori)
      === (("q1", "subj1", 0L, 28L, 100L, 128L, 1)))
    assert(h0.bits === 54.3 && h0.evalue_str === "2e-07" && h0.n_ident === 25L)
    val h1 = hsps(1)
    assert((h1.q_start, h1.q_end, h1.s_start, h1.s_end, h1.ori)
      === ((0L, 24L, 400L, 424L, -1)))
  }

  test("blastx frame mapping: protein HSP coords back to DNA (blast.py:354-384)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // dna=ATGGCCTTTAAACCCGGG (L=18); frame -2 translates
    // rc[1..]=CCGGGTTTAAAGGCCAT -> "PGLKA"; protein [1,3)="GL" maps to
    // dna [18-(1+9), 18-(1+3)) = [8,14) = "TAAACC", revcomp "GGTTTA",
    // translate -> "GL"
    val dna = "ATGGCCTTTAAACCCGGG"
    val hsps = Seq((1L, -2, 1L, 3L, dna.length.toLong, dna))
      .toDF("q", "frame", "p_start", "p_end", "seq_len", "dna")
    val m = BlastText.toDnaCoords(hsps, "frame", "p_start", "p_end", "seq_len")
      .withColumn("piece", col("dna").substr(col("dna_start").cast("int") + 1,
        (col("dna_end") - col("dna_start")).cast("int")))
      .withColumn("back", graft.seq.SeqFunctions.translateCodons(
        graft.seq.SeqFunctions.reverseComplement(col("piece"))))
      .select("dna_start", "dna_end", "dna_ori", "piece", "back")
      .collect().head
    assert((m.getLong(0), m.getLong(1), m.getInt(2), m.getString(3), m.getString(4))
      === ((8L, 14L, -1, "TAAACC", "GL")))

    // roundtrip across ALL six frames: map a window back, extract,
    // re-translate, compare to the protein window
    val frames = Seq((1L, dna)).toDF("q", "dna")
      .select(col("q"), col("dna"),
        explode(graft.seq.SeqFunctions.sixFrames(col("dna"))).as("f"))
      .select(col("q"), col("dna"), col("f.frame").as("frame"), col("f.aa").as("aa"))
      .where(length(col("aa")) >= 3)
      .withColumn("p_start", lit(1L)).withColumn("p_end", lit(3L))
      .withColumn("seq_len", length(col("dna")).cast("long"))
      .withColumn("aa_hit", substring(col("aa"), 2, 2))
    val rt = BlastText.toDnaCoords(frames, "frame", "p_start", "p_end", "seq_len")
      .withColumn("piece", col("dna").substr(col("dna_start").cast("int") + 1,
        (col("dna_end") - col("dna_start")).cast("int")))
      .withColumn("oriented", when(col("dna_ori") < 0,
        graft.seq.SeqFunctions.reverseComplement(col("piece"))).otherwise(col("piece")))
      .withColumn("back", graft.seq.SeqFunctions.translateCodons(col("oriented")))
      .select("frame", "aa_hit", "back")
      .collect()
    assert(rt.length === 6)
    rt.foreach(r => assert(r.getString(1) === r.getString(2), s"frame ${r.getInt(0)}"))
  }
}
