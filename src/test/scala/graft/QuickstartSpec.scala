package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.align.AlignmentStore
import graft.catalog.{Catalog, Relation, Resource}
import graft.dedup.MinHashLSH
import graft.graph.{MotifEdge, MotifQuery}
import graft.seq.Fasta

/** Executes QUICKSTART.md's walkthrough end-to-end on one small
  * fixture — FASTA ingest → slice → groupByIntervals → graph motif →
  * LSH dedup → catalog — so the doc can never drift from the real
  * API (the reference ships tutorial docs under `doc/rest/tutorials/`;
  * this is their CI-checked analog).
  */
class QuickstartSpec extends SparkSuite {

  test("quickstart walkthrough runs end-to-end") {
    import spark.implicits._

    // §1 sequence ingest: FASTA → DataFrame, pruned + filtered reads
    val dir = Files.createTempDirectory("quickstart").toString
    Files.writeString(java.nio.file.Paths.get(dir, "genome.fa"),
      (0 until 40).map(i => s">chr$i sample\n${"ACGTTGCA" * (4 + i % 3)}")
        .mkString("\n") + "\n")
    val seqs = spark.read.format("fasta").load(dir)
    assert(seqs.count() === 40)
    assert(seqs.select("seq_id", "length").columns.toSeq ===
      Seq("seq_id", "length"))
    assert(seqs.where(col("seq_id") === "chr7").count() === 1)
    Fasta.writeIndex(spark, dir)
    assert(spark.read.format("fasta").load(dir)
      .where(col("seq_id") === "chr7").count() === 1)

    // §2 alignment store + slice
    val blocks = (0 until 200).map { i =>
      (s"chr${i % 4}", i * 10L, i * 10L + 25L,
       s"t${i % 7}", i * 100L, i * 100L + 25L, if (i % 3 == 0) -1 else 1, i.toLong)
    }.toDF("src_id", "src_start", "src_end",
           "dest_id", "dest_start", "dest_end", "dest_ori", "block_id")
    val store = new AlignmentStore(blocks)
    val queries = Seq((1L, "chr1", 100L, 400L), (2L, "chr2", 0L, 250L))
      .toDF("q_id", "src_id", "q_start", "q_end")
    val hits = store.slice(queries)
    assert(hits.count() > 0)
    // clip contract: every hit lies inside its query window
    assert(hits.where(col("src_start") < col("q_start") ||
      col("src_end") > col("q_end")).count() === 0)
    val persistDir = s"$dir/store"
    store.persist(persistDir, buckets = 4)
    assert(AlignmentStore.load(spark, persistDir).blocks.count() === 200)

    // §3 interval grouping
    assert(store.groupByIntervals(maxGap = 100L).count() > 0)
    val segs = graft.operators.Coverage.segments(
      blocks, Seq("src_id"), "src_start", "src_end")
    // interior zero-depth gaps are legitimate segments; depth is
    // never negative and real coverage exists
    assert(segs.where(col("depth") < 0).count() === 0)
    assert(segs.where(col("depth") >= 1).count() > 0)

    // §4 graph motif DSL
    // 20 nodes, out-degree 15 each (src i%20 → 15 distinct dsts), so
    // neighborhoods genuinely overlap and shared-neighbor pairs exist
    val edges = (0 until 300).map { i =>
      (i % 20L, (i % 20 + i / 20 + 1) % 20L, i % 5)
    }.toDF("src", "dst", "weight")
    val m = MotifQuery.find(Seq(
      MotifEdge("a", "b", edges),
      MotifEdge("b", "c", edges, filter = Some(col("c") =!= 0L))))
    assert(m.count() > 0)
    val pairsShared = MotifQuery.sharedNeighbors(edges).where(col("n_shared") >= 2)
    assert(pairsShared.count() > 0)

    // §5 corpus dedup: banded LSH, never all-pairs
    val docs = ((0 until 50).map(i => (i.toLong, s"alpha beta gamma delta tok$i end")) ++
      Seq((100L, "alpha beta gamma delta tok1 end"))) // near-dup of doc 1
      .toDF("doc_id", "text")
    val toks = docs.withColumn("toks", graft.text.TextFunctions.tokens(col("text")))
    val sigs = MinHashLSH.signatureExprsU(toks, "toks", k = 8, shingleN = 2)
    val pairs = MinHashLSH.candidatePairs(
      MinHashLSH.bandBucketsU(sigs.where(col("sig0").isNotNull), "doc_id", 8, 4),
      "doc_id")
    assert(pairs.where(col("i") === 1L && col("j") === 100L).count() === 1)

    // §5 streaming sessionization: the documented production default
    // (StreamOps.sessionize, NOT session_window — see BENCH.md A/B)
    {
      import graft.streaming.StreamOps
      implicit val sqlCtx = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[StreamOps.Ev]
      val events = in.toDS()
      val sessions = StreamOps.sessionize(events, gapSec = 1800L, timeoutMs = 0L)
      val qn = "quickstart_sessions"
      val q = sessions.writeStream.outputMode("append")
        .format("memory").queryName(qn)
        .option("checkpointLocation", StreamOps.scratchCheckpoint("qs"))
        .start()
      try {
        in.addData(StreamOps.Ev(1L, 100L), StreamOps.Ev(1L, 200L),
          StreamOps.Ev(1L, 5000L), // > gap: second session
          StreamOps.Ev(1L, StreamOps.FlushAt))
        q.processAllAvailable()
      } finally q.stop()
      assert(spark.table(qn).count() === 2)
    }

    // §5 streaming skew-salting through a declared prior (r18): the
    // bootstrap measurement + declaration lets the stream ride
    // buckets = 0; the joined rows equal the batch join
    {
      import graft.operators.Salt
      implicit val sqlCtx = spark.sqlContext
      val boot = (0 until 400).map(i =>
        (if (i % 5 != 4) 7L else i.toLong, i.toLong)).toDF("user_id", "click_id")
      Salt.declareHotShare(spark, Seq("user_id"),
        Salt.heavyHitterShare(boot, Seq("user_id"), fraction = 0.5))
      try {
        val in = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Long)]
        val userDim = Seq((7L, "hot"), (3L, "cold")).toDF("user_id", "tier")
        val qn = "quickstart_salted"
        val q = Salt.saltedJoin(in.toDF().toDF("user_id", "click_id"), userDim,
            Seq("user_id"), saltExpr = col("click_id"))
          .writeStream.outputMode("append").format("memory").queryName(qn)
          .start()
        try {
          in.addData((0 until 400).map(i =>
            (if (i % 5 != 4) 7L else i.toLong, i.toLong)))
          q.processAllAvailable()
        } finally q.stop()
        assert(spark.table(qn).count() === 320) // the 320 hot-user clicks
      } finally spark.conf.unset(Salt.hotShareKey(Seq("user_id")))
    }

    // §6 catalog
    val wh = Files.createTempDirectory("quickstart_cat").toString
    blocks.write.mode("overwrite").parquet(s"$dir/genes")
    blocks.limit(50).write.mode("overwrite").parquet(s"$dir/exons")
    val cat = new Catalog(spark, wh)
    cat.register(Resource("Bio.Anno.genes", "table", "parquet", s"$dir/genes"))
    cat.register(Resource("Bio.Anno.exons", "table", "parquet", s"$dir/exons"))
    cat.addRelation(Relation("gene_exon", "Bio.Anno.genes", "block_id",
      "Bio.Anno.exons", "block_id", "one-to-one"))
    assert(cat.resolve(spark, "Bio.Anno.genes").count() === 200)
    assert(cat.bind(spark, "gene_exon").count() === 50)
  }
}
