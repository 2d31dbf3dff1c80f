package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.MinHashLSH

/** Stage-by-stage cost decomposition of the sketch/bucket family for
  * the r9 drift audit: counts + wall per sub-stage at a given SF dir,
  * to localize which stage breaks linearity. Throwaway diagnostics —
  * not part of the library surface.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Graft.session("drift-probe")
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    def t[T](name: String)(body: => T): T = {
      org.apache.spark.graft.GraftSparkHooks.drainListenerBus(spark.sparkContext)
      listener.snapshotAndReset()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.GraftSparkHooks.drainListenerBus(spark.sparkContext)
      val m = listener.snapshotAndReset().toMap
      println(f"[probe] $name%-28s $wall%8.2f s  cpu=${m("task_cpu_ms")/1000.0}%8.1f s gc=${m("gc_ms")/1000.0}%5.1f spill=${m("spill_mem_b")/1e9}%5.2fG tasks=${m("tasks")}%d")
      r
    }
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey").as("src"), (col("l_partkey") + 1000000L).as("dst"))
    println(s"[probe] edges=${t("edge scan count")(edges.count())}")

    if (sys.env.get("PROBE_J5").contains("1")) {
      val e = edges.select(col("src").as("__src"), col("dst").as("__dst")).distinct()
      println(s"[probe] distinct=${t("e.distinct")(e.count())}")
      val deg = e.groupBy("__dst").agg(count(lit(1)).as("__deg"))
      println(s"[probe] deg rows=${t("deg")(deg.count())}")
      val hot = deg.where(col("__deg") > 1024L)
      val eCold = e.join(hot.select("__dst"), Seq("__dst"), "left_anti")
      println(s"[probe] eCold=${t("eCold anti-join")(eCold.count())}")
      val coldPairs = eCold
        .join(eCold.select(col("__src").as("__src2"), col("__dst")), Seq("__dst"))
        .where(col("__src") < col("__src2"))
        .select(col("__src").as("s1"), col("__src2").as("s2"))
      println(s"[probe] coldPairs=${t("coldPairs join")(coldPairs.count())}")
      val agg = coldPairs.groupBy("s1", "s2").agg(count(lit(1)).as("n_shared"))
      println(s"[probe] groups=${t("pair agg")(agg.count())}")
      val agg2 = coldPairs.repartition(col("s1"), col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("n_shared"))
      println(s"[probe] groups2=${t("pair agg repart-first")(agg2.count())}")
      // single packed-long group key: does the one-column long path
      // (vectorized/fast hashmap eligible) beat the two-long composite?
      // pack assumes 0 <= s1, s2 < 2^32 (injective then even when pk
      // goes negative) — out-of-range keys would COLLIDE and
      // undercount groups3, so they are filtered; the packed-input
      // row count is printed so an A/B against groups/groups2 on a
      // fixture with dropped rows is visibly not like-for-like
      // (ADVICE r15 + r16 review)
      val packed = coldPairs
        .where(col("s2") >= 0L && col("s2") < (1L << 32) &&
               col("s1") >= 0L && col("s1") < (1L << 32))
        .select((shiftleft(col("s1").cast("long"), 32)
          .bitwiseOR(col("s2").cast("long"))).as("pk"))
      println(s"[probe] packedRows=${packed.count()} (compare coldPairs above; a gap = dropped out-of-range keys)")
      val agg3 = packed.repartition(col("pk"))
        .groupBy("pk").agg(count(lit(1)).as("n_shared"))
      println(s"[probe] groups3=${t("pair agg packed-key")(agg3.count())}")
      t("full sharedNeighbors")(
        graft.graph.MotifQuery.sharedNeighbors(edges).count())
      spark.stop(); return
    }
    val nbrs = edges
      .select(col("src").as("__src"), col("dst").cast("string").as("__dst"))
      .groupBy("__src").agg(collect_set("__dst").as("__toks"))
      .persist()
    println(s"[probe] nodes=${t("nbrs build")(nbrs.count())}")
    val sigs = t("signatures md5") {
      val s = MinHashLSH.signatures(nbrs, "__src", "__toks", 16, shingleN = 1).persist()
      s.count(); s
    }
    val buckets = t("bandBuckets") {
      val b = MinHashLSH.bandBuckets(sigs, "__src", 16, 4).persist()
      b.count(); b
    }
    // bucket-size distribution: the quadratic suspect
    t("bucket sizes") {
      buckets.groupBy("band", "bucket").count()
        .agg(count(lit(1)).as("n_buckets"), max("count").as("max_sz"),
          sum(col("count") * col("count")).as("sum_sq"))
        .show(false)
    }
    val cand = t("candidatePairs") {
      val c = MinHashLSH.candidatePairs(buckets, "__src").persist()
      println(s"[probe] pairs=${c.count()}")
      c
    }
    t("FULL sharedNeighborsSketch") {
      println(s"[probe] sketch rows=${graft.graph.MotifQuery
        .sharedNeighborsSketch(edges, k = 16, bands = 4, hasher = "md5").count()}")
    }
    t("estimate joins (full j5b tail)") {
      val sz = nbrs.select(col("__src"), size(col("__toks")).cast("long").as("__sz"))
      val sigA = sigs.select(col("__src").as("i") +:
        (0 until 16).map(x => col(s"sig$x").as(s"__a$x")): _*)
      val sigB = sigs.select(col("__src").as("j") +:
        (0 until 16).map(x => col(s"sig$x").as(s"__b$x")): _*)
      val m = (0 until 16).map(x =>
        when(col(s"__a$x") === col(s"__b$x"), 1L).otherwise(0L)).reduce(_ + _)
      val r = cand.join(sigA, "i").join(sigB, "j").withColumn("__m", m)
        .join(sz.select(col("__src").as("i"), col("__sz").as("__szi")), "i")
        .join(sz.select(col("__src").as("j"), col("__sz").as("__szj")), "j")
        .count()
      println(s"[probe] est rows=$r")
    }
    spark.stop()
  }
}
