package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.seq.Fasta

/** The V2 connector must parse identically to the RDD reader, prune
  * columns at the scan, and survive records that straddle split
  * boundaries.
  */
class FastaV2Spec extends SparkSuite {

  private def writeFasta(content: String): String = {
    val dir = Files.createTempDirectory("fastav2")
    Files.writeString(dir.resolve("x.fasta"), content)
    dir.toString
  }

  private val fixture =
    """>seq1 first title
      |ACGTACGT
      |ACGT
      |>seq2
      |TTTT
      |>seq3 third one here
      |GGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGG
      |CCCC
      |""".stripMargin

  test("format(\"fasta\") parses identically to Fasta.read") {
    val dir = writeFasta(fixture)
    val v2 = spark.read.format("fasta").load(dir)
      .orderBy("seq_id").collect().toSeq
    val rdd = Fasta.read(spark, dir)
      .select("seq_id", "title", "seq", "length")
      .orderBy("seq_id").collect().toSeq
    assert(v2 === rdd)
    assert(v2.size === 3)
    assert(v2.head.getString(0) === "seq1")
    assert(v2.head.getString(2) === "ACGTACGTACGT")
  }

  test("column pruning reaches the scan (seq never materialized)") {
    val dir = writeFasta(fixture)
    val df = spark.read.format("fasta").load(dir).select("seq_id", "length")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val pruned = scans.head.scan.readSchema().fieldNames.toSet
    assert(pruned === Set("seq_id", "length"), s"got $pruned")
  }

  test("seq_id filter pushdown: reader-side skip, and sidecar index prunes partitions") {
    val recs = (0 until 200).map(i => s">r$i t$i\n${"ACGT" * (10 + i % 7)}")
    val dir = writeFasta(recs.mkString("\n") + "\n")
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    try {
      spark.sparkContext.hadoopConfiguration.set(key, "512")
      def partitions(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.inputRDD.getNumPartitions
        }.head
      }
      val all = spark.read.format("fasta").load(dir)
      val totalParts = partitions(all.select("seq_id"))
      assert(totalParts > 10, s"fixture must split many ways, got $totalParts")
      // no index yet: filter is pushed (reader-side skip) but no pruning
      def lenOf(i: Int): Long = 4L * (10 + i % 7)
      val filtered = all.where(col("seq_id") === "r42")
      assert(filtered.select("seq", "length").collect().toSeq.map(r =>
        (r.getString(0).length.toLong, r.getLong(1))) ===
        Seq((lenOf(42), lenOf(42))))
      // write the sidecar index → the same query now plans FEWER partitions
      Fasta.writeIndex(spark, dir)
      val pruned = spark.read.format("fasta").load(dir)
        .where(col("seq_id").isin("r42", "r77"))
      val prunedParts = partitions(pruned)
      assert(prunedParts < totalParts,
        s"index should prune: $prunedParts vs $totalParts")
      assert(pruned.select("seq_id", "length").orderBy("seq_id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("r42", lenOf(42)), ("r77", lenOf(77))))
      // results identical with and without the index (pruning is a
      // superset guarantee, residual filter does the exact cut)
      val byIdx = pruned.select("seq_id", "title", "seq", "length")
        .orderBy("seq_id").collect().toSeq
      val direct = Fasta.read(spark, dir)
        .where(col("seq_id").isin("r42", "r77"))
        .select("seq_id", "title", "seq", "length").orderBy("seq_id")
        .collect().toSeq
      assert(byIdx === direct)
    } finally spark.sparkContext.hadoopConfiguration.unset(key)
  }

  test("stale sidecar index disables pruning instead of dropping rows") {
    val recs = (0 until 200).map(i => s">r$i t$i\n${"ACGT" * (10 + i % 7)}")
    val dir = writeFasta(recs.mkString("\n") + "\n")
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    try {
      spark.sparkContext.hadoopConfiguration.set(key, "512")
      Fasta.writeIndex(spark, dir)
      def partsAndRows(ids: String*): (Int, Seq[String]) = {
        val df = spark.read.format("fasta").load(dir)
          .where(col("seq_id").isin(ids: _*)).select("seq_id")
        val rows = df.orderBy("seq_id").collect().map(_.getString(0)).toSeq
        val parts = df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.inputRDD.getNumPartitions
        }.head
        (parts, rows)
      }
      val (freshParts, freshRows) = partsAndRows("r42", "r77")
      assert(freshRows === Seq("r42", "r77"))
      // REWRITE the FASTA with records in reverse order: every byte
      // offset in the sidecar is now wrong. The freshness stamp must
      // disable pruning (all splits scanned) and the rows must still
      // be exact — the pre-fix behavior silently LOST rows here.
      val f = java.nio.file.Paths.get(dir, "x.fasta")
      java.nio.file.Files.writeString(f, recs.reverse.mkString("\n") + "\n")
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(
          java.nio.file.Files.getLastModifiedTime(f).toMillis + 5000))
      val (staleParts, staleRows) = partsAndRows("r42", "r77")
      assert(staleRows === Seq("r42", "r77"), "stale index must not drop rows")
      assert(staleParts >= freshParts,
        s"stale index must not prune: $staleParts vs fresh $freshParts")
      // re-indexing the rewritten file restores pruning
      Fasta.writeIndex(spark, dir)
      val (reParts, reRows) = partsAndRows("r42", "r77")
      assert(reRows === Seq("r42", "r77"))
      assert(reParts < staleParts,
        s"fresh re-index should prune again: $reParts vs $staleParts")
    } finally spark.sparkContext.hadoopConfiguration.unset(key)
  }

  test("file ADDED after writeIndex marks the index stale (no silent row loss)") {
    val recs = (0 until 100).map(i => s">a$i t$i\n${"ACGT" * (10 + i % 7)}")
    val dir = writeFasta(recs.mkString("\n") + "\n")
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    try {
      spark.sparkContext.hadoopConfiguration.set(key, "512")
      Fasta.writeIndex(spark, dir)
      // a NEW file appears after indexing: its records have no index rows,
      // so a pruned scan would silently drop them. indexFresh must compare
      // the LIVE file set against the stamp (set equality), not just
      // verify the stamped files are unchanged.
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "y.fasta"),
        (0 until 50).map(i => s">b$i u$i\n${"TTTT" * (5 + i % 3)}")
          .mkString("\n") + "\n")
      val rows = spark.read.format("fasta").load(dir)
        .where(col("seq_id").isin("a42", "b17")).select("seq_id")
        .orderBy("seq_id").collect().map(_.getString(0)).toSeq
      assert(rows === Seq("a42", "b17"),
        "added-after-index file's rows must survive a pushed filter")
      // re-indexing covers both files and restores pruning with all rows
      Fasta.writeIndex(spark, dir)
      val rows2 = spark.read.format("fasta").load(dir)
        .where(col("seq_id").isin("a42", "b17")).select("seq_id")
        .orderBy("seq_id").collect().map(_.getString(0)).toSeq
      assert(rows2 === Seq("a42", "b17"))
    } finally spark.sparkContext.hadoopConfiguration.unset(key)
  }

  test("records survive split boundaries (forced tiny splits)") {
    // many records, then read with a tiny max split size so records
    // straddle split edges; the delimiter contract must keep every
    // record whole and exactly-once
    val recs = (0 until 200).map(i => s">r$i t$i\n${"ACGT" * (10 + i % 7)}")
    val dir = writeFasta(recs.mkString("\n") + "\n")
    // read prev from the SAME store being mutated (the shared session
    // hadoopConfiguration), so a pre-set value is restored, not lost
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val prev = Option(spark.sparkContext.hadoopConfiguration.get(key))
    try {
      spark.sparkContext.hadoopConfiguration.set(key, "512")
      val got = spark.read.format("fasta").load(dir)
        .select(col("seq_id"), col("length")).orderBy("seq_id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val want = (0 until 200).map(i => (s"r$i", 4L * (10 + i % 7)))
        .sortBy(_._1)
      assert(got === want)
    } finally {
      spark.sparkContext.hadoopConfiguration.unset(key)
      prev.foreach(v => spark.sparkContext.hadoopConfiguration.set(key, v))
    }
  }
}
