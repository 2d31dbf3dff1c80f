package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** The c-family COMPOSITE bench (r7 verdict #6): c1 → c10 → c13 run
  * as one chained session, the way a production cleaning pipeline
  * actually executes them — all three share the `documents` scan +
  * tokenize lineage, so the open 100 TB design question is whether
  * that shared input should be materialized once (cache/stage) or
  * recomputed per stage. This tool measures BOTH protocols on the
  * same JVM and emits one JSON line:
  *
  *   {"chain_fresh_s":…,  per-query fresh times,
  *    "cache_materialize_s":…, "chain_cached_s":…, per-query cached
  *    times, "sf":…}
  *
  * "cached" persists the BASE TABLE (documents.parquet scan) at
  * MEMORY_AND_DISK — Spark's cache manager then serves every
  * stage's `documents` subtree from the one materialization (the
  * tokenize explode above it stays per-stage either way: TextQ and
  * DedupQ project different column sets, so their token subtrees
  * don't canonically match and a token-level cache would only serve
  * one family). The decision the numbers feed is recorded in
  * BENCH.md.
  *
  * Usage: runMain graft.tools.ChainBench  (env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_BENCH_OUT as in Bench).
  */
object ChainBench {

  private val chain =
    Seq("c1_clean_corpus", "c10_neardup_removal", "c13_curriculum")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same tmpfs local-dir policy as Bench (shared measurement rails)
    val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
      case Some("disk") => None
      case Some(d)      => Some(d)
      case None         => Scratch.tmpfsDir("graft_local_")
    }
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graphx.pregel.checkpointInterval", "10")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    val spark = localDir.fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def scrub(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    // protocol A: fresh — every stage recomputes the shared lineage
    val fresh = chain.map { n =>
      n -> time(graft.SparkEntry.queries(n)(spark, sfDir).count())
    }
    scrub()
    // protocol B: base-table cache — one materialization feeds all 3
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tMat = time(docs.count())
    val cached = chain.map { n =>
      n -> time(graft.SparkEntry.queries(n)(spark, sfDir).count())
    }
    docs.unpersist(blocking = true)
    scrub()
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).stripSuffix(".")).getOrElse("0")
    val qs = (fresh.map { case (k, v) => s""""${k}__fresh_s":${fmt(v)}""" } ++
      cached.map { case (k, v) => s""""${k}__cached_s":${fmt(v)}""" })
      .mkString(",")
    val line =
      s"""{"metric":"chain","chain_fresh_s":${fmt(fresh.map(_._2).sum)},""" +
        s""""cache_materialize_s":${fmt(tMat)},""" +
        s""""chain_cached_s":${fmt(cached.map(_._2).sum)},$qs,"sf":$sfNum}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_chain.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      java.nio.file.Files.deleteIfExists(p)
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
