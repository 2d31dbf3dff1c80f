package graft.align

import graft.SparkSuite

class PairAlignmentSpec extends SparkSuite {

  test("letter metrics: forward and reverse-complement blocks") {
    import spark.implicits._
    val seqs = Seq(
      ("a", "ACGTACGTAC"),
      ("b", "ACGAACGTAC"),   // 1 mismatch at pos 3 (T->A)
      ("c", "GTACGTACGT")).toDF("seq_id", "seq")
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 10L), ("b", 0L, 10L, 1)),
      // a[0,4)=ACGT vs revcomp(c[6,10))=revcomp(ACGT)=ACGT
      (("a", 0L, 4L), ("c", 6L, 10L, -1))), bidirectional = false)

    val lettered = PairAlignment.withLetters(store.blocks, seqs)
      .select("src_id", "dest_id", "src_text", "dest_text", "n_match")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    assert(lettered === Set(
      ("b", "ACGTACGTAC", "ACGAACGTAC", 9L),
      ("c", "ACGT", "ACGT", 4L)))

    val metrics = PairAlignment.identityMetrics(store.blocks, seqs)
      .select("dest_id", "n_ident", "n_aligned", "p_identity_bp", "p_aligned_bp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap2
    assert(metrics("b") === ((9L, 10L, 9000L, 10000L)))
    // denominator is the edge's bounding PATH span (4), not the whole
    // sequence length — pygr pIdentity(mode=max), sequence.py:702-724
    assert(metrics("c") === ((4L, 4L, 10000L, 10000L)))
  }

  test("identityMetrics denominator modes (sequence.py:702-724)") {
    import spark.implicits._
    val seqs = Seq(("a", "ACGTACGTAC"), ("b", "ACGTACGTAC")).toDF("seq_id", "seq")
    // two blocks with different gap spread: src path [0,8) span 8,
    // dest path [0,6) span 6; 6 aligned letters, all matching
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 4L), ("b", 0L, 4L, 1)),
      (("a", 6L, 8L), ("b", 4L, 6L, 1))), bidirectional = false)
    def bp(mode: String): Long =
      PairAlignment.identityMetrics(store.blocks, seqs, trapOverflow = false, mode = mode)
        .select("p_identity_bp").head().getLong(0)
    // a[6,8)="GT" vs b[4,6)="AC": 0 matches there; a[0,4) 4 matches
    assert(bp("max") === 10000L * 4 / 8)   // max(8,6)
    assert(bp("min") === math.floor(10000.0 * 4 / 6).toLong)
    assert(bp("src") === 10000L * 4 / 8)
    assert(bp("dest") === math.floor(10000.0 * 4 / 6).toLong)
    intercept[IllegalArgumentException](bp("nope"))
  }

  test("identity overflow trap on multiple mappings (sequence.py:717-724)") {
    import spark.implicits._
    val seqs = Seq(("a", "ACGT"), ("b", "ACGT")).toDF("seq_id", "seq")
    // the same region aligned twice: summed identity 8 over length 4
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 4L), ("b", 0L, 4L, 1)),
      (("a", 0L, 4L), ("b", 0L, 4L, 1))), bidirectional = false)
    val ex = intercept[Exception] {
      PairAlignment.identityMetrics(store.blocks, seqs).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        .mkString(" | "))
    assert(rootMsg(ex).contains("pIdentity overflow"))
    // trapOverflow=false preserves the raw >100% value
    val raw = PairAlignment.identityMetrics(store.blocks, seqs, trapOverflow = false)
      .select("p_identity_bp").collect().map(_.getLong(0)).toSeq
    assert(raw === Seq(20000L))
  }

  test("conservedSegment clips to the best qualifying span (sequence.py:727-787)") {
    import spark.implicits._
    val seqs = Seq(("a", "ACGTACGTACGT"), ("b", "ACGTTTTTACGT")).toDF("seq_id", "seq")
    val blocks = Seq(("a", 0L, 12L, "b", 0L, 12L, 1, 1L))
      .toDF("src_id", "src_start", "src_end", "dest_id",
            "dest_start", "dest_end", "dest_ori", "block_id")
    def seg(bp: Long) = PairAlignment.conservedSegment(blocks, seqs, bp)
      .select("c_src_start", "c_src_end", "c_dest_start", "c_dest_end", "seg_ident", "seg_span")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // runs (1..4) and (8..12): merged span 9/12 = 0.75
    assert(seg(7000L) === Seq((0L, 12L, 0L, 12L, 9L, 12L)))  // merge allowed
    assert(seg(8000L) === Seq((7L, 12L, 7L, 12L, 5L, 5L)))   // best single run
    assert(seg(9990L) === Seq((7L, 12L, 7L, 12L, 5L, 5L)))   // pure runs only
  }

  test("conservedSegment reverse orientation clips both axes correctly") {
    import spark.implicits._
    // dest_text = revcomp(c[0,4)) = "AGGT" vs src "ACGT": runs (1,1),(3,2)
    val seqs = Seq(("a", "ACGT"), ("c", "ACCT")).toDF("seq_id", "seq")
    val blocks = Seq(("a", 0L, 4L, "c", 0L, 4L, -1, 1L))
      .toDF("src_id", "src_start", "src_end", "dest_id",
            "dest_start", "dest_end", "dest_ori", "block_id")
    val got = PairAlignment.conservedSegment(blocks, seqs, 8000L)
      .select("c_src_start", "c_src_end", "c_dest_start", "c_dest_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // best run = src [2,4) = "GT" -> dest [0,2) = "AC" (revcomp "GT")
    assert(got === Seq((2L, 4L, 0L, 2L)))
  }

  test("keyed pipe: key fidelity through one process per partition") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    // stand-in tool honoring the key<TAB>payload contract: uppercases
    // the payload, drops 'skip' rows, doubles 'dup' rows, and tags its
    // own pid so the spec can count spawned processes
    val dir = Files.createDirectories(Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_pipe_" + spark.sparkContext.applicationId))
    val script = dir.resolve("tool.sh")
    Files.write(script,
      ("#!/bin/sh\n" +
        "awk -F'\\t' -v pid=\"$$\" '{\n" +
        "  if ($2 ~ /^skip/) next\n" +
        "  print $1 \"\\t\" toupper($2) \"|\" pid\n" +
        "  if ($2 ~ /^dup/) print $1 \"\\t\" toupper($2) \"|again|\" pid\n" +
        "}'\n").getBytes)
    script.toFile.setExecutable(true)

    val rows = (0 until 200).map(i => (s"k$i", if (i % 50 == 0) s"skip$i" else if (i % 7 == 0) s"dup$i" else s"pay$i"))
    val df = rows.toDF("key", "line").repartition(3)
    val out = graft.operators.PipeJoin.pipeLinesKeyed(spark, df, Seq(script.toString))
      .as[(String, String)].collect()

    val byKey = out.groupBy(_._1)
    // skip rows vanish, dup rows double, everything else is 1:1 under its own key
    rows.foreach { case (k, pay) =>
      val got = byKey.getOrElse(k, Array.empty).map(_._2.split("\\|").head).toSeq
      if (pay.startsWith("skip")) assert(got.isEmpty, k)
      else if (pay.startsWith("dup")) assert(got === Seq(pay.toUpperCase, pay.toUpperCase), k)
      else assert(got === Seq(pay.toUpperCase), k)
    }
    // ~200 keys but at most one process per partition
    val pids = out.map(_._2.split("\\|").last).toSet
    assert(pids.size <= 3, s"expected <=3 processes (one per partition), saw ${pids.size}")
  }

  private implicit class Tup5Ops(rows: Array[(String, Long, Long, Long, Long)]) {
    def toMap2: Map[String, (Long, Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
