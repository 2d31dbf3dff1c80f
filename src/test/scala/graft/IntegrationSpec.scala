package graft

import java.nio.file.Files

import graft.align.AlignmentStore
import graft.graph.EdgeGraph
import graft.sources.Maf

class IntegrationSpec extends SparkSuite {

  test("MAF ingest → AlignmentStore → slice end-to-end") {
    import spark.implicits._
    val maf =
      """##maf version=1
        |a score=1.0
        |s hg.chr1 100 8 + 1000 ACGTACGT
        |s mm.chr2 500 8 + 2000 ACGTACGT
        |
        |a score=2.0
        |s hg.chr1 300 4 + 1000 GGGG
        |s mm.chr3  10 4 - 100  GGGG
        |""".stripMargin
    val dir = Files.createTempDirectory("mafint").toFile
    Files.writeString(new java.io.File(dir, "x.maf").toPath, maf)
    val store = new AlignmentStore(Maf.read(spark, dir.getAbsolutePath))
    val q = Seq((1L, "hg.chr1", 104L, 302L)).toDF("q_id", "src_id", "q_start", "q_end")
    val got = store.slice(q).orderBy("src_start")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
                 r.getString(4), r.getLong(5), r.getLong(6), r.getInt(7)))
      .toList
    assert(got === List(
      // first block clipped [104,108): dest follows forward
      ("hg.chr1", 104L, 108L, "mm.chr2", 504L, 508L, 1),
      // second block clipped [300,302): '-' strand dest, trimmed from LOW end
      ("hg.chr1", 300L, 302L, "mm.chr3", 88L, 90L, -1)))
  }

  test("MAF ingest → bidirectional store → TWO-HOP slice (mm vs rn via hg)") {
    import spark.implicits._
    // MAF stores every genome vs the hg reference only; querying
    // mouse-vs-rat exists ONLY through the two-hop path
    val maf =
      """##maf version=1
        |a score=1.0
        |s hg.chr1 100 8 + 1000 ACGTACGT
        |s mm.chr2 500 8 + 2000 ACGTACGT
        |s rn.chr5 40  8 - 100  ACGTACGT
        |""".stripMargin
    val dir = Files.createTempDirectory("maf2hop").toFile
    Files.writeString(new java.io.File(dir, "x.maf").toPath, maf)
    val fwd = Maf.read(spark, dir.getAbsolutePath)
    val store = new AlignmentStore(
      fwd.unionByName(new AlignmentStore(fwd).inverse.blocks))
    val q = Seq((1L, "mm.chr2", 502L, 506L)).toDF("q_id", "src_id", "q_start", "q_end")
    val got = store.slice2hop(q, binWidth = 64L)
      .select("src_id", "src_start", "src_end", "dest_id",
        "dest_start", "dest_end", "dest_ori", "axis_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
                 r.getLong(4), r.getLong(5), r.getInt(6), r.getString(7)))
      .toList
    // rn block on hg is '-' strand [52,60); hg window [102,106) maps
    // to rn [54,58) reversed; the mm->hg->mm self-match is dropped
    assert(got === List(
      ("mm.chr2", 502L, 506L, "rn.chr5", 54L, 58L, -1, "hg.chr1")))
  }

  test("EdgeGraph append/save/load snapshot semantics") {
    import spark.implicits._
    val g = new EdgeGraph(Seq((1L, 2L)).toDF("src", "dst"))
    val g2 = g.append(Seq((2L, 3L)).toDF("src", "dst"))
    assert(g.edges.count() === 1) // original snapshot unchanged
    assert(g2.edges.count() === 2)
    val path = Files.createTempDirectory("eg").toString + "/edges"
    g2.save(path)
    val loaded = EdgeGraph.load(spark, path)
    assert(loaded.adjacency(2L).collect().map(_.getLong(1)).toSet === Set(3L))
    assert(loaded.outDegrees.count() === 2)
  }

  // r17 (VERDICT r16 #4): x2/x6 are tolerance-gated now — the gated
  // output is the exact group stats plus in-engine bounded-error
  // booleans the DuckDB oracle pins to TRUE. The specs assert the
  // booleans hold and re-derive the rank/error checks independently.
  test("x6 approx quantiles: bounded-rank booleans hold against an independent rank check") {
    import org.apache.spark.sql.functions.{col, expr, element_at}
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x6_approx_quantiles")(spark, dir).collect()
      .map(r => (r.getString(0), (r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got.nonEmpty && got.values.forall(v => v._1 && v._2),
      s"a quantile sketch left its rank envelope: $got")
    // independent check of the estimates the query computed internally
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val est = orders.groupBy("o_orderpriority")
      .agg(expr("percentile_approx(o_totalprice, array(0.5D, 0.9D), 1000)").as("pq"))
      .select(col("o_orderpriority"),
        element_at(col("pq"), 1).as("p50"), element_at(col("pq"), 2).as("p90"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    for ((prio, (p50, p90)) <- est) {
      val vals = orders.where(col("o_orderpriority") === prio)
        .select(expr("o_totalprice")).collect().map(_.getDouble(0)).sorted
      def rankOf(v: Double) = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(p50) - 0.5) < 0.02, s"$prio p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) < 0.02, s"$prio p90 rank ${rankOf(p90)}")
    }
  }

  test("x2 HLL approx distinct: bound boolean holds and exact side matches") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("x2_approx_distinct")(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getBoolean(3)))).toMap
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.keySet === exact.keySet)
    for ((k, ex) <- exact) {
      assert(got(k)._1 === ex, s"$k: exact side ${got(k)._1} vs recomputed $ex")
      assert(got(k)._2, s"$k: HLL estimate left its 8% (4-sigma) bound")
    }
  }

  // The sketch ESTIMATES are deterministic for fixed data on a fixed
  // engine version (HLL++ register merges are max-commutative; GK
  // summaries merge deterministically under fixed partitioning) — so
  // pin them at sf0.01, recomputed in-spec now that the gated queries
  // output bounded-error booleans instead of raw estimates (r17). A
  // failure here means the sketch path changed silently (Spark
  // upgrade, rsd/accuracy drift, plan change altering merge order) —
  // re-derive the constants only after explaining the change.
  test("x2 HLL estimates are pinned (engine-deterministic)") {
    import org.apache.spark.sql.functions.approx_count_distinct
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val got = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", rsd = 0.02).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val pinned = Map(
      "click" -> 150L, "error" -> 150L, "purchase" -> 150L,
      "signup" -> 150L, "view" -> 150L)
    assert(got === pinned, s"HLL estimates moved: $got")
  }

  test("x6 GK quantile estimates are pinned (engine-deterministic)") {
    import org.apache.spark.sql.functions.{col, element_at, expr}
    val got = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(expr("percentile_approx(o_totalprice, array(0.5D, 0.9D), 1000)").as("pq"))
      .select(col("o_orderpriority"),
        element_at(col("pq"), 1).as("p50"), element_at(col("pq"), 2).as("p90"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val pinned = Map(
      "1-URGENT" -> (256388.54, 452453.7),
      "2-HIGH" -> (252150.18, 454612.93),
      "3-MEDIUM" -> (249321.51, 445816.06),
      "4-NOT SPECIFIED" -> (251361.09, 448979.21),
      "5-LOW" -> (247608.99, 443656.0))
    assert(got === pinned, s"GK estimates moved: $got")
  }
}
