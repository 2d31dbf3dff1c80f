package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.align.AlignmentStore
import graft.annot.AnnotationDb
import graft.core.Graft.table
import graft.queries.SeqQ.{dnaSql, withDna}

/** Alignment-derived metrics and annotation joins over the doc-DNA
  * corpus: pairwise identity (A6), longest conserved run (A7/P8),
  * per-position letter iteration (W2), -log10 score transform (F6),
  * and the annotation↔sequence interval join with strand-aware
  * sequence extraction (J10).
  */
object AlignFnQ {

  /** Aligned doc pairs (i even, j=i+1) with both DNA strings. */
  private def pairs(s: SparkSession, dir: String): DataFrame = {
    val d = withDna(s, dir).select(col("doc_id"), col("dna"))
    d.where(col("doc_id") % 2 === 0).select(col("doc_id").as("i"), col("dna").as("s1"))
      .join(d.select((col("doc_id") - 1).as("i"), col("dna").as("s2")), "i")
  }

  private val pairsSql =
    s"""WITH d AS ($dnaSql),
      |pr AS (SELECT a.doc_id AS i, a.dna AS s1, b.dna AS s2
      |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0)""".stripMargin

  val defs: Map[String, Q] = Map(
    // A6: pairwise %identity over the aligned region — through the
    // PairAlignment letter-join path (Seq2SeqEdge consume semantics).
    "a6_identity" -> { (s, dir) =>
      val d = withDna(s, dir)
      val seqs = d.select(concat(lit("d"), col("doc_id")).as("seq_id"), col("dna").as("seq"))
      val blocks = d.where(col("doc_id") % 2 === 0).select(
        col("doc_id").as("i"),
        concat(lit("d"), col("doc_id")).as("src_id"),
        lit(0L).as("src_start"), lit(64L).as("src_end"),
        concat(lit("d"), col("doc_id") + 1).as("dest_id"),
        lit(0L).as("dest_start"), lit(64L).as("dest_end"),
        lit(1).as("dest_ori"), col("doc_id").as("block_id"))
      graft.align.PairAlignment.withLetters(blocks, seqs)
        .select(col("i"), col("n_match").as("matches"),
          floor(lit(10000L) * col("n_match") / 64L).cast("long").as("identity_bp"))
        .orderBy("i")
    },

    // A7/P8: longest conserved segment (max run of matching letters,
    // earliest on ties) — the gaps-and-islands form of pygr
    // `conservedSegment`, `sequence.py:727-787`.
    "p8_conserved_run" -> { (s, dir) =>
      val matched = pairs(s, dir)
        .select(col("i"), explode(sequence(lit(1), lit(64))).as("p"),
          col("s1"), col("s2"))
        .where(col("s1").substr(col("p"), lit(1)) === col("s2").substr(col("p"), lit(1)))
        .select(col("i"), col("p").cast("long").as("p"))
      val w = Window.partitionBy("i").orderBy("p")
      val runs = matched
        .withColumn("island", col("p") - row_number().over(w))
        .groupBy("i", "island")
        .agg(count(lit(1)).as("run_len"), min("p").as("run_start"))
      val best = Window.partitionBy("i")
        .orderBy(col("run_len").desc, col("run_start"))
      runs.withColumn("rk", row_number().over(best))
        .where(col("rk") === 1)
        .select("i", "run_start", "run_len")
        .orderBy("i")
    },

    // W2: per-position letter iterator over a slice.
    "w2_letters" -> { (s, dir) =>
      withDna(s, dir).where(col("doc_id") < 20)
        .select(col("doc_id"), explode(sequence(lit(1), lit(16))).as("p"), col("dna"))
        .select(col("doc_id"), col("p").cast("long").as("pos"),
          col("dna").substr(col("p"), lit(1)).as("letter"))
        .orderBy("doc_id", "pos")
    },

    // P8 complete: slice + conservation filter — every slice hit
    // clipped to its best segment with >= 50% identity
    // (conservedSegment, sequence.py:727-787, wired as the
    // filterIvalConservation consume path, cnestedlist.pyx:867-897).
    // One forward and one reverse-orientation lane per doc pair.
    "p8b_conserved_clip" -> { (s, dir) =>
      val d = withDna(s, dir)
      val seqs = d.select(concat(lit("d"), col("doc_id")).as("seq_id"), col("dna").as("seq"))
      val srcs = d.where(col("doc_id") % 2 === 0 && col("doc_id") < 100)
      val blocks = srcs.select(col("doc_id"), explode(array(
          struct(lit(1).as("dest_ori"), (col("doc_id") * 2).as("block_id")),
          struct(lit(-1).as("dest_ori"), (col("doc_id") * 2 + 1).as("block_id")))).as("b"))
        .select(concat(lit("d"), col("doc_id")).as("src_id"),
          lit(0L).as("src_start"), lit(64L).as("src_end"),
          concat(lit("d"), col("doc_id") + 1).as("dest_id"),
          lit(0L).as("dest_start"), lit(64L).as("dest_end"),
          col("b.dest_ori").as("dest_ori"), col("b.block_id").as("block_id"))
      val queries = srcs.select(col("doc_id").as("q_id"),
        concat(lit("d"), col("doc_id")).as("src_id"),
        lit(4L).as("q_start"), lit(60L).as("q_end"))
      new AlignmentStore(blocks)
        .sliceConserved(queries, seqs, pIdentityMinBp = 5000L,
          minAlignSize = 2L, binWidth = 64L)
        .select("q_id", "src_id", "dest_id", "dest_ori", "block_id",
          "c_src_start", "c_src_end", "c_dest_start", "c_dest_end",
          "seg_ident", "seg_span")
        .orderBy("q_id", "block_id")
    },

    // W2 proper: alignment COLUMN view — per-position letters across
    // ALL target sequences of a slice with letter edges
    // (cnestedlist.pyx:1093-1278). Each src doc aligns to two targets
    // (one minus-strand); the slice window clips, then every source
    // position fans out to one row per target lane.
    "w2b_columns" -> { (s, dir) =>
      val d = withDna(s, dir)
      val seqs = d.select(concat(lit("d"), col("doc_id")).as("seq_id"), col("dna").as("seq"))
      val srcs = d.where(col("doc_id") % 4 === 0 && col("doc_id") < 40)
      val blocks = srcs.select(col("doc_id"), explode(array(
          struct(concat(lit("d"), col("doc_id") + 1).as("dest_id"),
            lit(4L).as("src_start"), lit(20L).as("src_end"),
            lit(4L).as("dest_start"), lit(20L).as("dest_end"), lit(1).as("dest_ori"),
            (col("doc_id") * 10).as("block_id")),
          struct(concat(lit("d"), col("doc_id") + 2).as("dest_id"),
            lit(8L).as("src_start"), lit(24L).as("src_end"),
            lit(40L).as("dest_start"), lit(56L).as("dest_end"), lit(-1).as("dest_ori"),
            (col("doc_id") * 10 + 1).as("block_id")))).as("b"))
        .select(concat(lit("d"), col("doc_id")).as("src_id"),
          col("b.src_start").as("src_start"), col("b.src_end").as("src_end"),
          col("b.dest_id").as("dest_id"),
          col("b.dest_start").as("dest_start"), col("b.dest_end").as("dest_end"),
          col("b.dest_ori").as("dest_ori"), col("b.block_id").as("block_id"))
      val queries = srcs.select(col("doc_id").as("q_id"),
        concat(lit("d"), col("doc_id")).as("src_id"),
        lit(6L).as("q_start"), lit(18L).as("q_end"))
      val sliced = new AlignmentStore(blocks).slice(queries, binWidth = 16L)
      graft.align.PairAlignment.columns(sliced, seqs)
        .select("q_id", "src_id", "src_pos", "dest_id", "dest_pos", "dest_ori",
          "src_letter", "dest_letter", "is_match")
        .orderBy("q_id", "dest_id", "src_pos")
    },

    // W2 letter EDGES: node→node transitions per lane over the column
    // view — NLMSANode.nodeEdges semantics (cnestedlist.pyx:1240-1278)
    // with all three edge kinds: within-block continuation, cross-block
    // bridge (target coords abut), and indel jump (src skips, target
    // continues). Lane M exercises the minus-strand bridge.
    "w2c_letter_edges" -> { (s, dir) =>
      val d = withDna(s, dir)
      val seqs = d.select(concat(lit("d"), col("doc_id")).as("seq_id"), col("dna").as("seq"))
      val srcs = d.where(col("doc_id") % 5 === 0 && col("doc_id") < 50)
      def b(destOff: Int, ss: Long, se: Long, ds: Long, de: Long, ori: Int, bo: Int) =
        struct(concat(lit("d"), col("doc_id") + destOff).as("dest_id"),
          lit(ss).as("src_start"), lit(se).as("src_end"),
          lit(ds).as("dest_start"), lit(de).as("dest_end"), lit(ori).as("dest_ori"),
          (col("doc_id") * 100L + bo).as("block_id"))
      val blocks = srcs.select(col("doc_id"), explode(array(
          b(1, 4L, 12L, 10L, 18L, 1, 0), b(1, 12L, 20L, 18L, 26L, 1, 1),
          b(2, 4L, 12L, 40L, 48L, -1, 2), b(2, 12L, 20L, 32L, 40L, -1, 3),
          b(3, 4L, 10L, 10L, 16L, 1, 4), b(3, 14L, 20L, 16L, 22L, 1, 5))).as("b"))
        .select(concat(lit("d"), col("doc_id")).as("src_id"),
          col("b.src_start").as("src_start"), col("b.src_end").as("src_end"),
          col("b.dest_id").as("dest_id"),
          col("b.dest_start").as("dest_start"), col("b.dest_end").as("dest_end"),
          col("b.dest_ori").as("dest_ori"), col("b.block_id").as("block_id"))
      val cols = graft.align.PairAlignment.columns(blocks, seqs)
      graft.align.PairAlignment.letterEdges(cols)
        .orderBy("src_id", "dest_id", "block_id", "src_pos")
    },

    // F6: e-value style -log10 transform.
    "f6_neglog" -> { (s, dir) =>
      // libm log10 differs in the last ulp across engines — quantize
      // to integer micro-units so the oracle hash-matches.
      IntervalsQ.events(s, dir)
        .where(col("value") > 0)
        .select(col("event_id"),
          floor(-log10(col("value")) * 1e6).cast("long").as("neglog_u"))
        .orderBy("event_id")
    },

    // J10: annotations (typed intervals on sequences) ⋈ query windows,
    // clipped, with strand-aware sequence extraction.
    "j10_annotation_join" -> { (s, dir) =>
      val d = withDna(s, dir)
      val seqs = d.select(concat(lit("doc_"), col("doc_id")).as("seq_id"), col("dna").as("seq"))
      val annots = d.select(col("doc_id"), concat(lit("doc_"), col("doc_id")).as("seq_id"))
        .select(col("seq_id"), explode(array(
          struct(concat(col("seq_id"), lit(":a1")).as("annot_id"), lit("exon").as("annot_type"),
            lit(5L).as("start"), lit(20L).as("stop"), lit(1).as("ori")),
          struct(concat(col("seq_id"), lit(":a2")).as("annot_id"), lit("exon").as("annot_type"),
            lit(30L).as("start"), lit(60L).as("stop"), lit(-1).as("ori")),
          struct(concat(col("seq_id"), lit(":g1")).as("annot_id"), lit("gene").as("annot_type"),
            lit(0L).as("start"), lit(63L).as("stop"), lit(1).as("ori")))).as("a"))
        .select(col("seq_id"), col("a.annot_id").as("annot_id"),
          col("a.annot_type").as("annot_type"), col("a.start").as("start"),
          col("a.stop").as("stop"), col("a.ori").as("ori"))
      val queries = seqs.select(col("seq_id").as("q_id"), col("seq_id"),
        lit(10L).as("q_start"), lit(40L).as("q_end"))
      val db = new AnnotationDb(annots)
      db.withSequence(db.sliceAnnotations(queries), seqs)
        .select("q_id", "annot_id", "annot_type", "c_start", "c_end", "ori", "aseq")
        .orderBy("annot_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "a6_identity" ->
      s"""$pairsSql
        |SELECT i,
        |  CAST(len(list_filter(range(1, 65), p -> substr(s1, CAST(p AS INT), 1) = substr(s2, CAST(p AS INT), 1))) AS BIGINT) AS matches,
        |  (10000 * CAST(len(list_filter(range(1, 65), p -> substr(s1, CAST(p AS INT), 1) = substr(s2, CAST(p AS INT), 1))) AS BIGINT)) // 64 AS identity_bp
        |FROM pr ORDER BY i""".stripMargin,

    "p8_conserved_run" ->
      s"""$pairsSql,
        |m AS (SELECT i, p FROM pr, UNNEST(range(1, 65)) AS t(p)
        |  WHERE substr(s1, CAST(p AS INT), 1) = substr(s2, CAST(p AS INT), 1)),
        |isl AS (SELECT i, p, p - ROW_NUMBER() OVER (PARTITION BY i ORDER BY p) AS island FROM m),
        |runs AS (SELECT i, island, COUNT(*) AS run_len, MIN(p) AS run_start
        |  FROM isl GROUP BY i, island),
        |best AS (SELECT i, run_start, run_len,
        |  ROW_NUMBER() OVER (PARTITION BY i ORDER BY run_len DESC, run_start) AS rk
        |  FROM runs)
        |SELECT i, run_start, run_len FROM best WHERE rk = 1 ORDER BY i""".stripMargin,

    "w2_letters" ->
      s"""WITH d AS ($dnaSql)
        |SELECT doc_id, p AS pos, substr(dna, CAST(p AS INT), 1) AS letter
        |FROM d, UNNEST(range(1, 17)) AS t(p)
        |WHERE doc_id < 20 ORDER BY doc_id, pos""".stripMargin,

    "p8b_conserved_clip" ->
      s"""$pairsSql,
        |pp AS (SELECT i, s1, s2 FROM pr WHERE i < 100),
        |lanes AS (
        |  SELECT i AS q_id, 1 AS dest_ori, CAST(i*2 AS BIGINT) AS block_id, s1, s2 FROM pp
        |  UNION ALL
        |  SELECT i, -1, CAST(i*2+1 AS BIGINT), s1, s2 FROM pp),
        |m AS (SELECT q_id, dest_ori, block_id, CAST(p AS BIGINT) AS k
        |  FROM lanes, UNNEST(range(1, 57)) AS t(p)
        |  WHERE CASE WHEN dest_ori >= 0
        |    THEN substr(s1, CAST(4+p AS INT), 1) = substr(s2, CAST(4+p AS INT), 1)
        |    ELSE substr(s1, CAST(4+p AS INT), 1) =
        |         translate(substr(s2, CAST(61-p AS INT), 1), 'ACGT', 'TGCA') END),
        |isl AS (SELECT *, k - ROW_NUMBER() OVER (PARTITION BY q_id, block_id ORDER BY k) AS g
        |  FROM m),
        |runs AS (SELECT q_id, dest_ori, block_id, MIN(k) AS s, COUNT(*) AS len
        |  FROM isl GROUP BY q_id, dest_ori, block_id, g),
        |i1 AS (SELECT *,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id, block_id ORDER BY s) AS BIGINT) AS ri,
        |  COALESCE(s - LAG(s + len) OVER (PARTITION BY q_id, block_id ORDER BY s), 0) AS nmb
        |  FROM runs),
        |i2 AS (SELECT *,
        |  SUM(len) OVER (PARTITION BY q_id, block_id ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
        |  SUM(nmb) OVER (PARTITION BY q_id, block_id ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn
        |  FROM i1),
        |cand AS (SELECT b.q_id, b.dest_ori, b.block_id, a.ri AS j, b.ri AS i2x,
        |    a.s AS sj, b.s AS si, b.len AS leni,
        |    b.pl - a.pl + a.len AS ni, b.pn - a.pn AS nm,
        |    b.s + b.len - a.s AS l
        |  FROM i2 b JOIN i2 a ON a.q_id = b.q_id AND a.block_id = b.block_id
        |    AND a.ri <= b.ri),
        |ok AS (SELECT * FROM cand WHERE ni * 10000 >= 5000 * l AND ni + nm >= 2),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, block_id
        |    ORDER BY ni + nm DESC, i2x, j DESC) AS rk FROM ok)
        |SELECT q_id, 'd' || q_id AS src_id, 'd' || (q_id + 1) AS dest_id,
        |  dest_ori, block_id,
        |  CAST(4 + sj - 1 AS BIGINT) AS c_src_start,
        |  CAST(4 + si + leni - 1 AS BIGINT) AS c_src_end,
        |  CAST(CASE WHEN dest_ori >= 0 THEN 4 + sj - 1
        |       ELSE 60 - (si + leni - 1) END AS BIGINT) AS c_dest_start,
        |  CAST(CASE WHEN dest_ori >= 0 THEN 4 + si + leni - 1
        |       ELSE 60 - sj + 1 END AS BIGINT) AS c_dest_end,
        |  CAST(ni AS BIGINT) AS seg_ident, CAST(ni + nm AS BIGINT) AS seg_span
        |FROM best WHERE rk = 1 ORDER BY q_id, block_id""".stripMargin,

    "w2b_columns" ->
      s"""WITH d AS ($dnaSql),
        |src AS (SELECT doc_id, dna FROM d WHERE doc_id % 4 = 0 AND doc_id < 40),
        |lanes AS (
        |  SELECT doc_id AS q_id, 'd' || doc_id AS src_id, 'd' || (doc_id+1) AS dest_id,
        |    4 AS ss, 20 AS se, 4 AS ds, 20 AS de, 1 AS ori FROM src
        |  UNION ALL
        |  SELECT doc_id, 'd' || doc_id, 'd' || (doc_id+2), 8, 24, 40, 56, -1 FROM src),
        |cl AS (SELECT q_id, src_id, dest_id, ori,
        |  GREATEST(ss, 6) AS cs, LEAST(se, 18) AS ce,
        |  CASE WHEN ori >= 0 THEN ds + (GREATEST(ss, 6) - ss)
        |       ELSE ds + (se - LEAST(se, 18)) END AS cds,
        |  CASE WHEN ori >= 0 THEN de - (se - LEAST(se, 18))
        |       ELSE de - (GREATEST(ss, 6) - ss) END AS cde
        |  FROM lanes WHERE ss < 18 AND 6 < se),
        |pos AS (SELECT cl.*, CAST(p AS BIGINT) AS src_pos
        |  FROM cl, UNNEST(range(cs, ce)) AS t(p)),
        |x AS (SELECT q_id, src_id, dest_id, ori AS dest_ori, src_pos,
        |  CAST(CASE WHEN ori >= 0 THEN cds + (src_pos - cs)
        |       ELSE cde - 1 - (src_pos - cs) END AS BIGINT) AS dest_pos
        |  FROM pos),
        |y AS (SELECT q_id, x.src_id, src_pos, x.dest_id, dest_pos, dest_ori,
        |  substr(sd.dna, CAST(src_pos AS INT) + 1, 1) AS src_letter,
        |  CASE WHEN dest_ori < 0
        |    THEN translate(substr(dd.dna, CAST(dest_pos AS INT) + 1, 1), 'ACGT', 'TGCA')
        |    ELSE substr(dd.dna, CAST(dest_pos AS INT) + 1, 1) END AS dest_letter
        |  FROM x
        |  JOIN d sd ON 'd' || sd.doc_id = x.src_id
        |  JOIN d dd ON 'd' || dd.doc_id = x.dest_id)
        |SELECT *, (src_letter = dest_letter) AS is_match FROM y
        |ORDER BY q_id, dest_id, src_pos""".stripMargin,

    "w2c_letter_edges" ->
      s"""WITH d AS ($dnaSql),
        |src AS (SELECT doc_id, dna FROM d WHERE doc_id % 5 = 0 AND doc_id < 50),
        |blocks AS (
        |  SELECT 'd' || doc_id AS src_id, 'd' || (doc_id+1) AS dest_id, 1 AS ori,
        |    CAST(doc_id*100 AS BIGINT) AS block_id, 4 AS ss, 12 AS se, 10 AS ds, 18 AS de FROM src
        |  UNION ALL SELECT 'd'||doc_id, 'd'||(doc_id+1), 1, doc_id*100+1, 12, 20, 18, 26 FROM src
        |  UNION ALL SELECT 'd'||doc_id, 'd'||(doc_id+2), -1, doc_id*100+2, 4, 12, 40, 48 FROM src
        |  UNION ALL SELECT 'd'||doc_id, 'd'||(doc_id+2), -1, doc_id*100+3, 12, 20, 32, 40 FROM src
        |  UNION ALL SELECT 'd'||doc_id, 'd'||(doc_id+3), 1, doc_id*100+4, 4, 10, 10, 16 FROM src
        |  UNION ALL SELECT 'd'||doc_id, 'd'||(doc_id+3), 1, doc_id*100+5, 14, 20, 16, 22 FROM src),
        |pos AS (SELECT src_id, dest_id, ori, block_id, CAST(p AS BIGINT) AS src_pos,
        |  CAST(CASE WHEN ori >= 0 THEN ds + (p - ss) ELSE de - 1 - (p - ss) END AS BIGINT) AS dest_pos
        |  FROM blocks, UNNEST(range(ss, se)) AS t(p)),
        |lp AS (SELECT pos.*,
        |  substr(sd.dna, CAST(src_pos AS INT)+1, 1) AS src_letter,
        |  CASE WHEN ori < 0 THEN translate(substr(dd.dna, CAST(dest_pos AS INT)+1, 1), 'ACGT', 'TGCA')
        |       ELSE substr(dd.dna, CAST(dest_pos AS INT)+1, 1) END AS dest_letter,
        |  MIN(src_pos) OVER (PARTITION BY block_id) AS first_pos,
        |  MAX(src_pos) OVER (PARTITION BY block_id) AS last_pos
        |  FROM pos
        |  JOIN d sd ON 'd' || sd.doc_id = pos.src_id
        |  JOIN d dd ON 'd' || dd.doc_id = pos.dest_id)
        |SELECT a.src_id, a.dest_id, a.ori AS dest_ori, a.block_id, a.src_pos, a.dest_pos,
        |  b.block_id AS next_block_id, b.src_pos AS next_src_pos, b.dest_pos AS next_dest_pos,
        |  a.src_letter, a.dest_letter,
        |  b.src_letter AS next_src_letter, b.dest_letter AS next_dest_letter,
        |  CASE WHEN a.block_id = b.block_id THEN 'within'
        |       WHEN b.src_pos = a.src_pos + 1 THEN 'bridge' ELSE 'jump' END AS edge_kind
        |FROM lp a JOIN lp b
        |  ON a.src_id = b.src_id AND a.dest_id = b.dest_id AND a.ori = b.ori
        |  AND b.dest_pos = a.dest_pos + (CASE WHEN a.ori >= 0 THEN 1 ELSE -1 END)
        |  AND ((a.block_id = b.block_id AND b.src_pos = a.src_pos + 1)
        |    OR (a.block_id <> b.block_id AND a.src_pos = a.last_pos
        |        AND b.src_pos = b.first_pos AND b.src_pos > a.src_pos))
        |ORDER BY a.src_id, a.dest_id, a.block_id, a.src_pos""".stripMargin,

    "f6_neglog" ->
      """SELECT event_id, CAST(floor(-log10(value) * 1e6) AS BIGINT) AS neglog_u
        |FROM events WHERE value > 0 ORDER BY event_id""".stripMargin,

    "j10_annotation_join" ->
      s"""WITH d AS ($dnaSql),
        |sq AS (SELECT 'doc_' || doc_id AS seq_id, dna AS seq FROM d),
        |an AS (
        |  SELECT seq_id, seq_id || ':a1' AS annot_id, 'exon' AS annot_type,
        |    5 AS start, 20 AS stop, 1 AS ori FROM sq
        |  UNION ALL SELECT seq_id, seq_id || ':a2', 'exon', 30, 60, -1 FROM sq
        |  UNION ALL SELECT seq_id, seq_id || ':g1', 'gene', 0, 63, 1 FROM sq),
        |sl AS (SELECT seq_id AS q_id, seq_id, annot_id, annot_type,
        |    GREATEST(start, 10) AS c_start, LEAST(stop, 40) AS c_end, ori
        |  FROM an WHERE start < 40 AND 10 < stop),
        |wseq AS (SELECT q_id, annot_id, annot_type, c_start, c_end, ori,
        |    substr(seq, CAST(c_start AS INT) + 1, CAST(c_end - c_start AS INT)) AS piece
        |  FROM sl JOIN sq USING (seq_id))
        |SELECT q_id, annot_id, annot_type, CAST(c_start AS BIGINT) AS c_start,
        |  CAST(c_end AS BIGINT) AS c_end, ori,
        |  CASE WHEN ori < 0 THEN translate(reverse(piece), 'ACGT', 'TGCA')
        |       ELSE piece END AS aseq
        |FROM wseq ORDER BY annot_id""".stripMargin
  )
}
