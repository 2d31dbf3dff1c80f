package graft.align

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** End-to-end composed external-aligner pipeline (pygr `BlastMapping`
  * `blast.py:86-221`; the `tests/blast_test.py` pipeline cases): seqs
  * stream as FASTA through a stand-in aligner executable, its blast
  * text report streams back, and the parsed ungapped runs land as an
  * `AlignmentStore` that answers slice queries — all as ONE operator,
  * `AlignmentStore.fromBlast`.
  */
class BlastPipelineSpec extends SparkSuite {

  /** Stand-in aligner: per FASTA record emits one fake blast HSP with
    * a query gap in the middle (two ungapped runs); ids ending in 'm'
    * report on the Minus subject strand with descending coordinates.
    */
  private lazy val alignerScript: String = {
    val dir = Files.createDirectories(Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_blast_" + spark.sparkContext.applicationId))
    val script = dir.resolve("fake_aligner.sh")
    Files.write(script,
      ("#!/bin/sh\n" +
        "awk '\n" +
        "/^>/ { id = substr($0, 2); next }\n" +
        "{\n" +
        "  L = length($0); h = int(L / 2)\n" +
        "  q = substr($0, 1, h) \"-\" substr($0, h + 1)\n" +
        "  s = \"\"\n" +
        "  for (i = 0; i <= L; i++) s = s \"N\"\n" +
        "  print \"Query= \" id\n" +
        "  print \">hit_\" id\n" +
        "  print \" Score = 50.0 bits (25),  Expect = 1e-09\"\n" +
        "  print \" Identities = \" L \"/\" (L + 1)\n" +
        "  if (id ~ /m$/) {\n" +
        "    print \" Strand = Plus / Minus\"\n" +
        "    print \"Query: 1 \" q \" \" L\n" +
        "    print \"Sbjct: \" (11 + L + 1) \" \" s \" \" 12\n" +
        "  } else {\n" +
        "    print \" Strand = Plus / Plus\"\n" +
        "    print \"Query: 1 \" q \" \" L\n" +
        "    print \"Sbjct: 11 \" s \" \" (11 + L)\n" +
        "  }\n" +
        "}'\n").getBytes)
    script.toFile.setExecutable(true)
    script.toString
  }

  test("fromBlast: FASTA in, alignment store out, key fidelity across partitions") {
    import spark.implicits._
    val seqs = Seq(
      ("q1", "ACGTACGT"), ("q2m", "TTTTCCCC"), ("q3", "AACCGGTT"))
      .toDF("seq_id", "seq").repartition(2)

    val store = AlignmentStore.fromBlast(spark, seqs, Seq(alignerScript))
    val got = store.blocks
      .select("src_id", "src_start", "src_end", "dest_id", "dest_start", "dest_end", "dest_ori")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toSet

    // each query: gap after col 4 → runs [0,4) and [4,8); plus-strand
    // subjects sit at [10,14)/[15,19); minus-strand descend from 20 →
    // [16,20) then [11,15), ori -1 (query ids flowed through the report)
    assert(got === Set(
      ("q1", 0L, 4L, "hit_q1", 10L, 14L, 1),
      ("q1", 4L, 8L, "hit_q1", 15L, 19L, 1),
      ("q3", 0L, 4L, "hit_q3", 10L, 14L, 1),
      ("q3", 4L, 8L, "hit_q3", 15L, 19L, 1),
      ("q2m", 0L, 4L, "hit_q2m", 16L, 20L, -1),
      ("q2m", 4L, 8L, "hit_q2m", 11L, 15L, -1)))

    // block ids unique even with per-partition parses
    assert(store.blocks.select("block_id").distinct().count() === 6L)

    // and the composed store answers downstream slice queries
    val q = Seq((0L, "q1", 2L, 6L)).toDF("q_id", "src_id", "q_start", "q_end")
    val sliced = store.slice(q)
      .select("src_start", "src_end", "dest_start", "dest_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sliced === Set((2L, 4L, 12L, 14L), (4L, 6L, 15L, 17L)))
  }

  /** Stand-in RepeatMasker (`repeat_mask`, blast.py:120-143): lowercases
    * tandem ACAC+ runs (the "repeats") and WRAPS output sequence lines at
    * 6 columns, exercising the multi-line FASTA fold on read-back.
    */
  private lazy val maskerScript: String = {
    val dir = Files.createDirectories(Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_blast_" + spark.sparkContext.applicationId))
    val script = dir.resolve("fake_masker.sh")
    Files.write(script,
      ("#!/bin/sh\n" +
        "awk '\n" +
        "/^>/ { print; next }\n" +
        "{\n" +
        "  s = $0\n" +
        "  out = \"\"\n" +
        "  while (match(s, /(ACAC)+/)) {\n" +
        "    out = out substr(s, 1, RSTART - 1) tolower(substr(s, RSTART, RLENGTH))\n" +
        "    s = substr(s, RSTART + RLENGTH)\n" +
        "  }\n" +
        "  out = out s\n" +
        "  for (i = 1; i <= length(out); i += 6) print substr(out, i, 6)\n" +
        "}'\n").getBytes)
    script.toFile.setExecutable(true)
    script.toString
  }

  test("repeatMask: repeats lowercased, wrapped FASTA folded, order-free ids") {
    import spark.implicits._
    val seqs = Seq(
      ("r1", "ttACACACgg"),  // lowercase input is uppercased before masking
      ("r2", "GGGGGGGGGG"),  // no repeat — comes back untouched
      ("r3", "ACACACACACAC")) // all repeat
      .toDF("seq_id", "seq").repartition(2)
    val masked = AlignmentStore.repeatMask(seqs, Seq(maskerScript))
      .as[(String, String)].collect().toMap
    // (ACAC)+ matches whole 4-mers: TTACACACGG masks its first ACAC,
    // the trailing AC stays upper
    assert(masked === Map(
      "r1" -> "TTacacACGG",
      "r2" -> "GGGGGGGGGG",
      "r3" -> "acacacacacac"))
  }

  test("fromBlast with maskCmd composes mask -> align; coordinates unaffected") {
    import spark.implicits._
    val seqs = Seq(("q1", "ACACACGT")).toDF("seq_id", "seq")
    val got = AlignmentStore
      .fromBlast(spark, seqs, Seq(alignerScript), maskCmd = Some(Seq(maskerScript)))
      .blocks
      .select("src_id", "src_start", "src_end", "dest_id", "dest_start", "dest_end", "dest_ori")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toSet
    // same HSP geometry as the unmasked path: masking changes letter
    // CASE (seeding behavior in a real aligner), never coordinates
    assert(got === Set(
      ("q1", 0L, 4L, "hit_q1", 10L, 14L, 1),
      ("q1", 4L, 8L, "hit_q1", 15L, 19L, 1)))
  }
}
