package graft.seq

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SeqSpec extends SparkSuite {

  test("FASTA roundtrip on the reference fixture shape (alignments.fa)") {
    import spark.implicits._
    // same 3-sequence shape as pygr tests/data/alignments.fa
    val fa = ">a first seq\natggcaggatggaccagatggacagataggaccagatg\n" +
      ">b\natggcagg\n>c\naccagatg\n"
    val dir = Files.createTempDirectory("fasta").toFile
    Files.writeString(new java.io.File(dir, "t.fa").toPath, fa)
    val got = Fasta.read(spark, dir.getAbsolutePath)
      .orderBy("seq_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", "first seq", "atggcaggatggaccagatggacagataggaccagatg", 38L),
      ("b", "", "atggcagg", 8L),
      ("c", "", "accagatg", 8L)))
    // format → re-read roundtrip, with 60-col wrapping on a long seq
    val longSeq = "ACGT" * 40
    val out = new java.io.File(dir, "out").getAbsolutePath
    Fasta.format(Seq(("x", longSeq)).toDF("seq_id", "seq"))
      .coalesce(1).write.text(out)
    val rt = Fasta.read(spark, out).collect().head
    assert(rt.getString(0) === "x" && rt.getString(2) === longSeq)
  }

  test("reverse complement golden (sequence.py:513-520)") {
    import spark.implicits._
    val got = Seq("atggcagg", "ACGTN").toDF("s")
      .select(SeqFunctions.reverseComplement(col("s"))).as[String].collect()
    assert(got.toSeq === Seq("cctgccat", "NACGT"))
  }

  test("codon translation incl. stops and partial codon (sequtil.py:121-159)") {
    import spark.implicits._
    val got = Seq("ATGGCC", "ATGTAAG", "AT", "ATGNNN").toDF("s")
      .select(SeqFunctions.translateCodons(col("s"))).as[String].collect()
    assert(got.toSeq === Seq("MA", "M*", "", "MX"))
  }

  test("seqtype guess (sequtil.py:7-26)") {
    import spark.implicits._
    val got = Seq("acgtacgtac", "ACGUACGUAC", "MKVLAAGICW").toDF("s")
      .select(SeqFunctions.guessSeqType(col("s"))).as[String].collect()
    assert(got.toSeq === Seq("dna", "rna", "protein"))
  }

  test("six frames of a known sequence") {
    import spark.implicits._
    val got = Seq("ATGGCCTAA").toDF("s")
      .select(explode(SeqFunctions.sixFrames(col("s"))).as("f"))
      .select("f.frame", "f.aa").as[(Int, String)].collect().toMap
    assert(got(1) === "MA*")
    assert(got(2) === "WP")  // TGGCCT -> W,P
    assert(got(-1) === "LGH") // revcomp TTAGGCCAT -> TTA,GGC,CAT
    assert(got.size === 6)
  }

  test("chunked SeqDb strslice equals substring") {
    import spark.implicits._
    val seqs = Seq(("s1", "ABCDEFGHIJKLMNOPQRSTUVWXYZ")).toDF("seq_id", "seq")
    val db = SeqDb.fromSequences(seqs, chunkSize = 4)
    assert(db.chunks.count() === 7) // ceil(26/4)
    val q = Seq((1L, "s1", 2L, 11L), (2L, "s1", 0L, 4L), (3L, "s1", 23L, 26L))
      .toDF("q_id", "seq_id", "start", "stop")
    val got = db.strslice(q).select("q_id", "sl").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "CDEFGHIJK", 2L -> "ABCD", 3L -> "XYZ"))
  }
}
