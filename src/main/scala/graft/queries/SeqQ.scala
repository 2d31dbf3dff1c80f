package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Graft.table
import graft.seq.{Fasta, SeqDb, SeqFunctions}

/** Sequence-engine operators (SURVEY.md §2.1/2.7): FASTA roundtrip,
  * chunked strslice, reverse complement, codon translation, seqtype
  * guessing, six-frame translation, prefix-union databases and
  * qualified-key routing, id munging.
  *
  * The testdata has no sequences, so a deterministic 64nt DNA string
  * is derived per document: md5(text)+md5(reverse(text)) hex mapped
  * onto ACGT — reproduced identically in the oracle SQL.
  */
object SeqQ {

  private val HEX = "0123456789abcdef"
  private val ACGT = "ACGTACGTACGTACGT"

  private[queries] def withDna(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"), col("text"), col("source"),
      translate(concat(md5(col("text")), md5(reverse(col("text")))), HEX, ACGT).as("dna"))

  private[queries] val dnaSql =
    s"SELECT doc_id, text, source, translate(md5(text) || md5(reverse(text)), '$HEX', '$ACGT') AS dna FROM documents"

  /** DuckDB codon translation of the SQL string expression `sExpr`,
    * generated from the same codon table the Spark side uses.
    */
  private def codonCaseSql(sExpr: String): String = {
    val whens = SeqFunctions.codonTable.toSeq.sorted
      .map { case (c, a) => s"WHEN '$c' THEN '$a'" }.mkString(" ")
    s"array_to_string(list_transform(range(0, length($sExpr)//3), " +
      s"i -> CASE substr($sExpr, CAST(i*3+1 AS INT), 3) $whens ELSE 'X' END), '')"
  }

  val defs: Map[String, Q] = Map(
    // F1: reverse complement — via the native codegen Expression
    // (graft.functions.ReverseComplement), not the 2-pass composition.
    "f1_revcomp" -> { (s, dir) =>
      withDna(s, dir)
        .select(col("doc_id"), col("dna"),
          graft.functions.ReverseComplement.reverse_complement(col("dna")).as("rc"))
        .orderBy("doc_id")
    },

    // F2: codon → amino-acid translation.
    "f2_translate" -> { (s, dir) =>
      withDna(s, dir)
        .select(col("doc_id"), SeqFunctions.translateCodons(col("dna")).as("aa"))
        .orderBy("doc_id")
    },

    // F3: content-based sequence-type guessing on mixed inputs.
    "f3_seqtype" -> { (s, dir) =>
      withDna(s, dir)
        .withColumn("probe",
          when(col("doc_id") % 2 === 0, col("dna")).otherwise(substring(col("text"), 1, 64)))
        .select(col("doc_id"), SeqFunctions.guessSeqType(col("probe")).as("seqtype"))
        .orderBy("doc_id")
    },

    // F4: six-frame translation (explode of the frame generator).
    "f4_sixframe" -> { (s, dir) =>
      withDna(s, dir)
        .select(col("doc_id"), explode(SeqFunctions.sixFrames(col("dna"))).as("f"))
        .select(col("doc_id"), col("f.frame").as("frame"), col("f.aa").as("aa"))
        .orderBy("doc_id", "frame")
    },

    // F10: best ORF across all six frames — translate, extract
    // M...-to-stop candidates, rank (len desc, frame asc, orf asc).
    "f10_orf" -> { (s, dir) =>
      val frames = withDna(s, dir)
        .select(col("doc_id"), explode(SeqFunctions.sixFrames(col("dna"))).as("f"))
        .select(col("doc_id"), col("f.frame").as("frame"), col("f.aa").as("aa"))
      val orfs = frames
        .select(col("doc_id"), col("frame"),
          explode(regexp_extract_all(col("aa"), lit("M[^*]*"), lit(0))).as("orf"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(length(col("orf")).desc, col("frame"), col("orf"))
      orfs.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("doc_id"), col("frame"), col("orf"),
          length(col("orf")).cast("long").as("orf_len"))
        .orderBy("doc_id")
    },

    // J8/S6 depth: blastx/tblastn frame mapping — a protein HSP
    // window on every frame of the six-frame corpus mapped back to
    // DNA coords (blast.py:354-384); the dna_hit column extracts the
    // mapped interval (reverse-complemented for ori=-1) and aa_match
    // proves translate(dna_hit) == the protein window, so a wrong
    // mapping cannot hash-match.
    "j8b_blastx_map" -> { (s, dir) =>
      val frames = withDna(s, dir)
        .select(col("doc_id"), col("dna"),
          explode(SeqFunctions.sixFrames(col("dna"))).as("f"))
        .select(col("doc_id"), col("dna"), col("f.frame").as("frame"), col("f.aa").as("aa"))
      val hsps = frames
        .withColumn("p_start", lit(2L)).withColumn("p_end", lit(7L))
        .withColumn("aa_hit", substring(col("aa"), 3, 5))
        .withColumn("seq_len", length(col("dna")).cast("long"))
      val mapped = graft.sources.BlastText.toDnaCoords(
        hsps, "frame", "p_start", "p_end", "seq_len")
      mapped
        .withColumn("__piece",
          col("dna").substr(col("dna_start").cast("int") + 1,
            (col("dna_end") - col("dna_start")).cast("int")))
        .withColumn("dna_hit",
          when(col("dna_ori") < 0, SeqFunctions.reverseComplement(col("__piece")))
            .otherwise(col("__piece")))
        .withColumn("aa_match",
          SeqFunctions.translateCodons(col("dna_hit")) === col("aa_hit"))
        .select("doc_id", "frame", "dna_start", "dna_end", "dna_ori",
          "aa_hit", "dna_hit", "aa_match")
        .orderBy("doc_id", "frame")
    },

    // S1/S2: FASTA write → distributed re-parse → info roundtrip.
    "s1_fasta_roundtrip" -> { (s, dir) =>
      val tmp = tmpPath(s, "graft_fasta_rt")
      Fasta.format(withDna(s, dir)
          .select(concat(lit("doc_"), col("doc_id")).as("seq_id"), col("dna").as("seq")))
        .coalesce(1).write.mode("overwrite").text(tmp)
      Fasta.read(s, tmp)
        .select(col("seq_id"), col("length"), md5(col("seq")).as("seq_hash"))
        .orderBy("seq_id")
    },

    // S1 via the DataSourceV2 connector: the same roundtrip as s1 but
    // read back through `spark.read.format("fasta")` — Hadoop-split
    // planning (one 100 TB file shards into block-sized, record-safe
    // partitions) and column pruning at the scan; the spec forces
    // 512-byte splits to pin exactly-once records across boundaries.
    "s1c_fasta_v2" -> { (s, dir) =>
      val tmp = tmpPath(s, "graft_fasta_v2")
      Fasta.format(withDna(s, dir)
          .select(concat(lit("doc_"), col("doc_id")).as("seq_id"), col("dna").as("seq")))
        .coalesce(1).write.mode("overwrite").text(tmp)
      s.read.format("fasta").load(tmp)
        .select(col("seq_id"), col("length"), md5(col("seq")).as("seq_hash"))
        .orderBy("seq_id")
    },

    // S4 roundtrip: write MAF text (one block per doc: a gapped '+'
    // row and a '-' strand row against the reference row), re-parse
    // it distributed through Maf.read, and emit the normalized
    // pairwise ungapped runs — the oracle re-derives the expected
    // coordinate math (gap split, reverse-strand normalization)
    // directly, so a parser regression cannot hash-match.
    "s4b_maf_roundtrip" -> { (s, dir) =>
      val tmp = tmpPath(s, "graft_maf_rt")
      withDna(s, dir).where(col("doc_id") % 5 === 0)
        .select(concat(
          lit("a score=1\n"),
          lit("s hg.chr"), col("doc_id"), lit(" "),
          (col("doc_id") + 1000L).cast("string"), lit(" 17 + 100000 "),
          substring(col("dna"), 1, 17), lit("\n"),
          lit("s mm.c"), col("doc_id"), lit(" "),
          (col("doc_id") + 2000L).cast("string"), lit(" 16 + 100000 "),
          substring(col("dna"), 20, 8), lit("-"), substring(col("dna"), 28, 8), lit("\n"),
          lit("s rn.c"), col("doc_id"), lit(" "),
          (col("doc_id") + 300L).cast("string"), lit(" 17 - 5000 "),
          substring(col("dna"), 40, 17), lit("\n")).as("value"))
        .coalesce(1).write.mode("overwrite").text(tmp)
      graft.sources.Maf.read(s, tmp)
        .select("src_id", "src_start", "src_end", "dest_id",
          "dest_start", "dest_end", "dest_ori")
        .orderBy("src_id", "src_start", "dest_id")
    },

    // S5 roundtrip: write axt records (a gapped '+' record and a '-'
    // strand record per doc), re-parse distributed through Axt.read,
    // emit the ungapped runs; the oracle re-derives the 1-based
    // header normalization and gap split directly.
    "s5b_axt_roundtrip" -> { (s, dir) =>
      val tmp = tmpPath(s, "graft_axt_rt")
      withDna(s, dir).where(col("doc_id") % 5 === 3)
        .select(concat(
          col("doc_id"), lit(" chrT "), (col("doc_id") + 1001L).cast("string"),
          lit(" 9999 chrQ "), (col("doc_id") + 2001L).cast("string"),
          lit(" 9999 + 100\n"),
          substring(col("dna"), 1, 17), lit("\n"),
          substring(col("dna"), 20, 8), lit("-"), substring(col("dna"), 28, 8),
          lit("\n\n"),
          col("doc_id"), lit(" chrT "), (col("doc_id") + 3001L).cast("string"),
          lit(" 9999 chrQ "), (col("doc_id") + 501L).cast("string"),
          lit(" 9999 - 50\n"),
          substring(col("dna"), 40, 12), lit("\n"),
          substring(col("dna"), 50, 12), lit("\n")).as("value"))
        .coalesce(1).write.mode("overwrite").text(tmp)
      graft.sources.Axt.read(s, tmp)
        .orderBy("src_start", "dest_id")
    },

    // S6 roundtrip: write blastall-style text reports (one per doc,
    // a Plus/Plus and a Plus/Minus HSP), re-parse through
    // BlastText.read, emit normalized HSPs; the oracle re-derives the
    // 1-based-inclusive → half-open and minus-strand normalization.
    "s6b_blast_roundtrip" -> { (s, dir) =>
      val tmp = tmpPath(s, "graft_blast_rt")
      val p1 = substring(col("dna"), 1, 12)
      val p2 = substring(col("dna"), 30, 12)
      withDna(s, dir).where(col("doc_id") % 7 === 0)
        .select(concat(
          lit("Query= q"), col("doc_id"), lit("\n"),
          lit(">subj"), col("doc_id"), lit("\n"),
          lit(" Score = "), (col("doc_id") % 50).cast("string"), lit(".5 bits (10), Expect = 1e-07\n"),
          lit(" Identities = 10/12\n"),
          lit(" Strand = Plus / Plus\n"),
          lit("Query: "), (col("doc_id") + 1L).cast("string"), lit(" "), p1,
          lit(" "), (col("doc_id") + 12L).cast("string"), lit("\n"),
          lit("Sbjct: "), (col("doc_id") + 101L).cast("string"), lit(" "), p1,
          lit(" "), (col("doc_id") + 112L).cast("string"), lit("\n"),
          lit(" Score = 30.5 bits (7), Expect = 0.004\n"),
          lit(" Identities = 8/12\n"),
          lit(" Strand = Plus / Minus\n"),
          lit("Query: 1 "), p2, lit(" 12\n"),
          lit("Sbjct: "), (col("doc_id") + 212L).cast("string"), lit(" "), p2,
          lit(" "), (col("doc_id") + 201L).cast("string"), lit("\n")).as("value"))
        .coalesce(1).write.mode("overwrite").text(tmp)
      graft.sources.BlastText.read(s, tmp)
        .select("query_id", "hit_id", "q_start", "q_end", "s_start", "s_end",
          "ori", "bits", "evalue_str", "n_ident", "n_aligned")
        .orderBy("query_id", "ori")
    },

    // J8 end-to-end: the COMPOSED external-aligner pipeline
    // (AlignmentStore.fromBlast = FASTA → per-partition subprocess →
    // streaming report parse → ungapped blocks; pygr BlastMapping,
    // blast.py:86-221). The stand-in aligner emits a deterministic
    // report per record (query gap at the midpoint; ids ending 'm' on
    // the Minus strand), so even the subprocess hop is oracle-exact.
    "j8c_blast_pipeline" -> { (s, dir) =>
      val script = java.nio.file.Paths.get(tmpPath(s, "graft_aligner"), "fake_aligner.sh")
      java.nio.file.Files.createDirectories(script.getParent)
      java.nio.file.Files.write(script,
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
      val seqs = withDna(s, dir).where(col("doc_id") < 30)
        .select(concat(lit("q"), col("doc_id"),
          when(col("doc_id") % 3 === 0, lit("m")).otherwise(lit(""))).as("seq_id"),
          col("dna").as("seq"))
      graft.align.AlignmentStore.fromBlast(s, seqs, Seq(script.toString))
        .blocks
        .select("src_id", "src_start", "src_end", "dest_id",
          "dest_start", "dest_end", "dest_ori")
        .orderBy("src_id", "src_start")
    },

    // S3: chunked strslice — only covering chunks are read.
    "s3_strslice" -> { (s, dir) =>
      val db = SeqDb.fromSequences(
        withDna(s, dir).select(concat(lit("doc_"), col("doc_id")).as("seq_id"),
          col("dna").as("seq")), chunkSize = 16)
      val queries = withDna(s, dir).select(col("doc_id").as("q_id"),
        concat(lit("doc_"), col("doc_id")).as("seq_id"),
        lit(10L).as("start"), lit(50L).as("stop"))
      db.strslice(queries).select("q_id", "sl").orderBy("q_id")
    },

    // U1: prefix union of two sequence databases.
    "u1_prefix_union" -> { (s, dir) =>
      val docs = withDna(s, dir).select(lit("docs").as("prefix"),
        concat(lit("doc_"), col("doc_id")).as("sid"), length(col("dna")).cast("long").as("len"))
      val sups = table(s, dir, "supplier").select(lit("sup").as("prefix"),
        concat(lit("s_"), col("s_suppkey")).as("sid"),
        length(col("s_name")).cast("long").as("len"))
      docs.unionByName(sups)
        .groupBy("prefix")
        .agg(count(lit(1)).as("n"), sum("len").as("sum_len"))
        .orderBy("prefix")
    },

    // J11: qualified-key routing through the union (prefix split).
    "j11_union_routing" -> { (s, dir) =>
      val keys = withDna(s, dir).where(col("doc_id") % 50 === 0)
        .select(concat(lit("docs.doc_"), col("doc_id")).as("qkey"))
      val docs = withDna(s, dir)
        .select(concat(lit("doc_"), col("doc_id")).as("sid"), md5(col("dna")).as("h"))
      keys
        .withColumn("prefix", split(col("qkey"), "\\.").getItem(0))
        .withColumn("sid", split(col("qkey"), "\\.").getItem(1))
        .where(col("prefix") === "docs")
        .join(docs, "sid")
        .select(col("qkey"), col("h"))
        .orderBy("qkey")
    },

    // F7: NCBI-style id munging (gi|...| unpack).
    "f7_id_munging" -> { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("gi|"), col("doc_id"), lit("|src|"), col("source")).as("nid"))
        .select(col("doc_id"), col("nid"),
          split(col("nid"), "\\|").getItem(1).cast("long").as("gi"),
          split(col("nid"), "\\|").getItem(3).as("tag"))
        .orderBy("doc_id")
    },

    // K1: k-mer spectrum — the classic distributed sequence
    // aggregate (count every length-4 substring corpus-wide, report
    // the top of the spectrum with doc frequency). One explode
    // (rows = Σ(len-3)) + one kmer-keyed count + bounded top-k. At
    // 100 TB the count is map-side combinable into at most 4^k
    // distinct keys, and the top-k is TakeOrderedAndProject — no
    // global sort, no skew (the key space is uniform by
    // construction of the hash-derived dna).
    "k1_kmer_spectrum" -> { (s, dir) =>
      val K = 4
      // guard: sequence(1, stop) DESCENDS when stop < 1 (the
      // TextFunctions.ngrams hazard) — short dna must yield NO k-mers
      val top = withDna(s, dir)
        .where(length(col("dna")) >= K)
        .select(col("doc_id"),
          graft.functions.CharGramsExplode.char_grams_explode(col("dna"), K)
            .as(Seq("pos", "kmer")))
        .select("doc_id", "kmer")
        .groupBy("kmer")
        .agg(count(lit(1)).as("n_occ"), countDistinct("doc_id").as("n_docs"))
        .orderBy(col("n_occ").desc, col("kmer")).limit(30)
      top.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n_occ").desc, col("kmer"))).cast("long"))
        .select("rk", "kmer", "n_occ", "n_docs")
        .orderBy("rk")
    }
  )

  val oracle: Map[String, String] = Map(
    "f1_revcomp" ->
      s"""WITH d AS ($dnaSql)
        |SELECT doc_id, dna, translate(reverse(dna), 'ACGT', 'TGCA') AS rc
        |FROM d ORDER BY doc_id""".stripMargin,

    "f2_translate" ->
      s"""WITH d AS ($dnaSql)
        |SELECT doc_id, ${codonCaseSql("dna")} AS aa
        |FROM d ORDER BY doc_id""".stripMargin,

    "f3_seqtype" ->
      s"""WITH d AS ($dnaSql),
        |p AS (SELECT doc_id,
        |  upper(CASE WHEN doc_id % 2 = 0 THEN dna ELSE substr(text, 1, 64) END) AS up
        |  FROM d),
        |m AS (SELECT doc_id, length(up) AS len,
        |  length(up) - length(translate(up, 'ACGTNU', '')) AS acgtnu,
        |  length(up) - length(translate(up, 'U', '')) AS u,
        |  length(up) - length(translate(up, 'T', '')) AS t
        |  FROM p)
        |SELECT doc_id,
        |  CASE WHEN len = 0 THEN 'protein'
        |       WHEN 5 * acgtnu >= 4 * len THEN
        |         CASE WHEN u > t THEN 'rna' ELSE 'dna' END
        |       ELSE 'protein' END AS seqtype
        |FROM m ORDER BY doc_id""".stripMargin,

    "f4_sixframe" -> {
      val branches = (1 to 3).map(f =>
        s"SELECT doc_id, $f AS frame, ${codonCaseSql(s"substr(dna, $f)")} AS aa FROM d"
      ) ++ (1 to 3).map(f =>
        s"SELECT doc_id, -$f AS frame, ${codonCaseSql(s"substr(rc, $f)")} AS aa FROM d")
      s"""WITH d0 AS ($dnaSql),
        |d AS (SELECT doc_id, dna, translate(reverse(dna), 'ACGT', 'TGCA') AS rc FROM d0)
        |${branches.mkString("\nUNION ALL\n")}
        |ORDER BY doc_id, frame""".stripMargin
    },

    "f10_orf" -> {
      val branches = (1 to 3).map(f =>
        s"SELECT doc_id, $f AS frame, ${codonCaseSql(s"substr(dna, $f)")} AS aa FROM d"
      ) ++ (1 to 3).map(f =>
        s"SELECT doc_id, -$f AS frame, ${codonCaseSql(s"substr(rc, $f)")} AS aa FROM d")
      s"""WITH d0 AS ($dnaSql),
        |d AS (SELECT doc_id, dna, translate(reverse(dna), 'ACGT', 'TGCA') AS rc FROM d0),
        |fr AS (${branches.mkString("\nUNION ALL\n")}),
        |orfs AS (SELECT doc_id, frame, unnest(regexp_extract_all(aa, 'M[^*]*')) AS orf FROM fr),
        |best AS (SELECT doc_id, frame, orf,
        |  ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY length(orf) DESC, frame, orf) AS rk
        |  FROM orfs)
        |SELECT doc_id, frame, orf, CAST(length(orf) AS BIGINT) AS orf_len
        |FROM best WHERE rk = 1 ORDER BY doc_id""".stripMargin
    },

    "j8b_blastx_map" -> {
      val branches = (1 to 3).map(f =>
        s"SELECT doc_id, $f AS frame, ${codonCaseSql(s"substr(dna, $f)")} AS aa FROM d"
      ) ++ (1 to 3).map(f =>
        s"SELECT doc_id, -$f AS frame, ${codonCaseSql(s"substr(rc, $f)")} AS aa FROM d")
      s"""WITH d0 AS ($dnaSql),
        |d AS (SELECT doc_id, dna, translate(reverse(dna), 'ACGT', 'TGCA') AS rc FROM d0),
        |fr AS (${branches.mkString("\nUNION ALL\n")}),
        |h AS (SELECT doc_id, frame, substr(aa, 3, 5) AS aa_hit FROM fr),
        |m AS (SELECT h.doc_id, frame, aa_hit, dna,
        |  CAST(CASE WHEN frame > 0 THEN (abs(frame)-1) + 3*2
        |       ELSE 64 - ((abs(frame)-1) + 3*7) END AS BIGINT) AS dna_start,
        |  CAST(CASE WHEN frame > 0 THEN (abs(frame)-1) + 3*7
        |       ELSE 64 - ((abs(frame)-1) + 3*2) END AS BIGINT) AS dna_end,
        |  CASE WHEN frame > 0 THEN 1 ELSE -1 END AS dna_ori
        |  FROM h JOIN d ON h.doc_id = d.doc_id),
        |x AS (SELECT *, substr(dna, CAST(dna_start AS INT)+1,
        |  CAST(dna_end - dna_start AS INT)) AS piece FROM m),
        |y AS (SELECT doc_id, frame, dna_start, dna_end, dna_ori, aa_hit,
        |  CASE WHEN dna_ori < 0 THEN translate(reverse(piece), 'ACGT', 'TGCA')
        |       ELSE piece END AS dna_hit FROM x)
        |SELECT doc_id, frame, dna_start, dna_end, dna_ori, aa_hit, dna_hit,
        |  (${codonCaseSql("dna_hit")} = aa_hit) AS aa_match
        |FROM y ORDER BY doc_id, frame""".stripMargin
    },

    "s1_fasta_roundtrip" ->
      s"""WITH d AS ($dnaSql)
        |SELECT 'doc_' || doc_id AS seq_id, CAST(length(dna) AS BIGINT) AS length,
        |  md5(dna) AS seq_hash
        |FROM d ORDER BY seq_id""".stripMargin,

    "s1c_fasta_v2" ->
      s"""WITH d AS ($dnaSql)
        |SELECT 'doc_' || doc_id AS seq_id, CAST(length(dna) AS BIGINT) AS length,
        |  md5(dna) AS seq_hash
        |FROM d ORDER BY seq_id""".stripMargin,

    "s4b_maf_roundtrip" ->
      s"""WITH d AS ($dnaSql),
        |s5 AS (SELECT doc_id FROM d WHERE doc_id % 5 = 0),
        |r AS (
        |  SELECT 'hg.chr' || doc_id AS src_id,
        |    CAST(1000 + doc_id AS BIGINT) AS src_start,
        |    CAST(1008 + doc_id AS BIGINT) AS src_end,
        |    'mm.c' || doc_id AS dest_id,
        |    CAST(2000 + doc_id AS BIGINT) AS dest_start,
        |    CAST(2008 + doc_id AS BIGINT) AS dest_end, 1 AS dest_ori FROM s5
        |  UNION ALL
        |  SELECT 'hg.chr' || doc_id, CAST(1009 + doc_id AS BIGINT),
        |    CAST(1017 + doc_id AS BIGINT), 'mm.c' || doc_id,
        |    CAST(2008 + doc_id AS BIGINT), CAST(2016 + doc_id AS BIGINT), 1 FROM s5
        |  UNION ALL
        |  SELECT 'hg.chr' || doc_id, CAST(1000 + doc_id AS BIGINT),
        |    CAST(1017 + doc_id AS BIGINT), 'rn.c' || doc_id,
        |    CAST(5000 - (300 + doc_id) - 17 AS BIGINT),
        |    CAST(5000 - (300 + doc_id) AS BIGINT), -1 FROM s5)
        |SELECT * FROM r ORDER BY src_id, src_start, dest_id""".stripMargin,

    "s5b_axt_roundtrip" ->
      s"""WITH d AS ($dnaSql),
        |s5 AS (SELECT doc_id FROM d WHERE doc_id % 5 = 3),
        |r AS (
        |  SELECT 'chrT' AS src_id, CAST(1000 + doc_id AS BIGINT) AS src_start,
        |    CAST(1008 + doc_id AS BIGINT) AS src_end,
        |    'chrQ' AS dest_id, CAST(2000 + doc_id AS BIGINT) AS dest_start,
        |    CAST(2008 + doc_id AS BIGINT) AS dest_end, 1 AS dest_ori,
        |    doc_id AS block_id FROM s5
        |  UNION ALL
        |  SELECT 'chrT', CAST(1009 + doc_id AS BIGINT), CAST(1017 + doc_id AS BIGINT),
        |    'chrQ', CAST(2008 + doc_id AS BIGINT), CAST(2016 + doc_id AS BIGINT),
        |    1, doc_id FROM s5
        |  UNION ALL
        |  SELECT 'chrT', CAST(3000 + doc_id AS BIGINT), CAST(3012 + doc_id AS BIGINT),
        |    'chrQ', CAST(500 + doc_id AS BIGINT), CAST(512 + doc_id AS BIGINT),
        |    -1, doc_id FROM s5)
        |SELECT * FROM r ORDER BY src_start, dest_id""".stripMargin,

    "s6b_blast_roundtrip" ->
      s"""WITH d AS ($dnaSql),
        |s7 AS (SELECT doc_id FROM d WHERE doc_id % 7 = 0),
        |r AS (
        |  SELECT 'q' || doc_id AS query_id, 'subj' || doc_id AS hit_id,
        |    CAST(doc_id AS BIGINT) AS q_start, CAST(doc_id + 12 AS BIGINT) AS q_end,
        |    CAST(doc_id + 100 AS BIGINT) AS s_start, CAST(doc_id + 112 AS BIGINT) AS s_end,
        |    1 AS ori, CAST(doc_id % 50 AS DOUBLE) + 0.5 AS bits,
        |    '1e-07' AS evalue_str, CAST(10 AS BIGINT) AS n_ident,
        |    CAST(12 AS BIGINT) AS n_aligned FROM s7
        |  UNION ALL
        |  SELECT 'q' || doc_id, 'subj' || doc_id,
        |    CAST(0 AS BIGINT), CAST(12 AS BIGINT),
        |    CAST(doc_id + 200 AS BIGINT), CAST(doc_id + 212 AS BIGINT),
        |    -1, 30.5, '0.004', CAST(8 AS BIGINT), CAST(12 AS BIGINT) FROM s7)
        |SELECT * FROM r ORDER BY query_id, ori""".stripMargin,

    "j8c_blast_pipeline" ->
      s"""WITH d AS ($dnaSql),
        |ids AS (SELECT doc_id,
        |    'q' || doc_id || (CASE WHEN doc_id % 3 = 0 THEN 'm' ELSE '' END) AS src_id,
        |    doc_id % 3 = 0 AS minus
        |  FROM d WHERE doc_id < 30),
        |r AS (
        |  -- dna is 64 chars; the fake aligner gaps the query at 32 →
        |  -- two runs; plus subjects start at 11 (1-based), minus ones
        |  -- descend from 76
        |  SELECT src_id, CAST(0 AS BIGINT) AS src_start, CAST(32 AS BIGINT) AS src_end,
        |    'hit_' || src_id AS dest_id,
        |    CAST(CASE WHEN minus THEN 44 ELSE 10 END AS BIGINT) AS dest_start,
        |    CAST(CASE WHEN minus THEN 76 ELSE 42 END AS BIGINT) AS dest_end,
        |    CAST(CASE WHEN minus THEN -1 ELSE 1 END AS INTEGER) AS dest_ori FROM ids
        |  UNION ALL
        |  SELECT src_id, CAST(32 AS BIGINT), CAST(64 AS BIGINT), 'hit_' || src_id,
        |    CAST(CASE WHEN minus THEN 11 ELSE 43 END AS BIGINT),
        |    CAST(CASE WHEN minus THEN 43 ELSE 75 END AS BIGINT),
        |    CAST(CASE WHEN minus THEN -1 ELSE 1 END AS INTEGER) FROM ids)
        |SELECT * FROM r ORDER BY src_id, src_start""".stripMargin,

    "s3_strslice" ->
      s"""WITH d AS ($dnaSql)
        |SELECT doc_id AS q_id, substr(dna, 11, 40) AS sl
        |FROM d ORDER BY q_id""".stripMargin,

    "u1_prefix_union" ->
      s"""WITH d AS ($dnaSql),
        |u AS (
        |  SELECT 'docs' AS prefix, CAST(length(dna) AS BIGINT) AS len FROM d
        |  UNION ALL
        |  SELECT 'sup', CAST(length(s_name) AS BIGINT) FROM supplier)
        |SELECT prefix, COUNT(*) AS n, CAST(SUM(len) AS BIGINT) AS sum_len
        |FROM u GROUP BY prefix ORDER BY prefix""".stripMargin,

    "j11_union_routing" ->
      s"""WITH d AS ($dnaSql)
        |SELECT 'docs.doc_' || doc_id AS qkey, md5(dna) AS h
        |FROM d WHERE doc_id % 50 = 0 ORDER BY qkey""".stripMargin,

    "f7_id_munging" ->
      """WITH n AS (SELECT doc_id,
        |  'gi|' || doc_id || '|src|' || source AS nid FROM documents)
        |SELECT doc_id, nid,
        |  CAST(string_split(nid, '|')[2] AS BIGINT) AS gi,
        |  string_split(nid, '|')[4] AS tag
        |FROM n ORDER BY doc_id""".stripMargin,

    "k1_kmer_spectrum" ->
      s"""WITH d AS ($dnaSql),
        |km AS (SELECT doc_id, substr(dna, CAST(i AS INT), 4) AS kmer
        |  FROM d, UNNEST(range(1, length(dna) - 2)) AS t(i)),
        |c AS (SELECT kmer, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM km GROUP BY kmer),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, kmer) AS BIGINT) AS rk
        |  FROM c)
        |SELECT rk, kmer, n_occ, n_docs FROM r WHERE rk <= 30
        |ORDER BY rk""".stripMargin
  )
}
