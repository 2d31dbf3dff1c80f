package graft.catalog

import java.nio.file.Files

import graft.SparkSuite

class CatalogSpec extends SparkSuite {

  test("register/resolve/relations roundtrip (worldbase semantics)") {
    val dir = Files.createTempDirectory("catalog").toString
    val cat = new Catalog(spark, dir)
    cat.register(Resource("Test.TPCH.customer", "table", "parquet",
      "/root/testdata/sf0.001/customer.parquet"))
    cat.register(Resource("Test.TPCH.nation", "table", "parquet",
      "/root/testdata/sf0.001/nation.parquet"))
    cat.addRelation(Relation("customer_nation", "Test.TPCH.customer", "c_nationkey",
      "Test.TPCH.nation", "n_nationkey", "one-to-many"))

    // a fresh Catalog instance sees the persisted metadata
    val cat2 = new Catalog(spark, dir)
    assert(cat2.ls("Test.TPCH") ===
      Seq("Test.TPCH.customer", "Test.TPCH.nation"))
    val c = cat2.resolve(spark, "Test.TPCH.customer")
    assert(c.count() > 0)
    val joined = cat2.bind(spark, "customer_nation")
    assert(joined.count() === c.count()) // left join keeps all customers
    assert(joined.columns.contains("n_name"))
    // replace keeps the map keyed by name
    cat2.register(Resource("Test.TPCH.customer", "table", "parquet",
      "/root/testdata/sf0.01/customer.parquet"))
    assert(new Catalog(spark, dir).resources("Test.TPCH.customer").path.contains("sf0.01"))
    intercept[NoSuchElementException](cat2.resolve(spark, "Nope.Missing"))
  }

  test("ref resources resolve recursively; cycles fail loudly (metabase.py:181-220)") {
    val dir = Files.createTempDirectory("catalog_ref").toString
    val cat = new Catalog(spark, dir)
    cat.register(Resource("Base.nation", "table", "parquet",
      "/root/testdata/sf0.001/nation.parquet"))
    // two-level chain: My -> Alias -> Base
    cat.register(Resource("Alias.nation", "table", "ref", "Base.nation"))
    cat.register(Resource("My.nation", "table", "ref", "Alias.nation"))
    assert(cat.resolve(spark, "My.nation").count() ===
      cat.resolve(spark, "Base.nation").count())
    // a dangling ref surfaces the missing target
    cat.register(Resource("Bad.ref", "table", "ref", "Nope.Missing"))
    intercept[NoSuchElementException](cat.resolve(spark, "Bad.ref"))
    // a reference cycle is detected, not an infinite loop
    cat.register(Resource("Cyc.a", "table", "ref", "Cyc.b"))
    cat.register(Resource("Cyc.b", "table", "ref", "Cyc.a"))
    val err = intercept[IllegalArgumentException](cat.resolve(spark, "Cyc.a"))
    assert(err.getMessage.contains("cycle"))
  }

  test("two writers registering different names both survive (entry-level merge)") {
    val dir = Files.createTempDirectory("catalog_mw").toString
    val a = new Catalog(spark, dir)
    val b = new Catalog(spark, dir)
    a.register(Resource("W.one", "table", "parquet", "/tmp/one"))
    // b's instance cache predates a's write; its register must merge
    // against the LIVE table, not clobber it with the stale snapshot
    b.register(Resource("W.two", "table", "parquet", "/tmp/two"))
    val merged = new Catalog(spark, dir).resources.keySet
    assert(merged === Set("W.one", "W.two"),
      s"concurrent writers must not drop entries, got $merged")
  }

  test("interleaved same-name writers: last-writer-wins, no table loss") {
    val dir = Files.createTempDirectory("catalog_race").toString
    val a = new Catalog(spark, dir)
    val b = new Catalog(spark, dir)
    a.register(Resource("R.shared", "table", "parquet", "/tmp/from_a"))
    a.register(Resource("R.only_a", "table", "parquet", "/tmp/only_a"))
    // b rewrites the SAME entry from a stale cache; the merge-before-swap
    // must keep a's other entry and the final value of the contested name
    // must be the last writer's (documented whole-entry last-writer-wins)
    b.register(Resource("R.shared", "table", "parquet", "/tmp/from_b"))
    a.register(Resource("R.shared", "table", "parquet", "/tmp/from_a2"))
    val fin = new Catalog(spark, dir).resources
    assert(fin.keySet === Set("R.shared", "R.only_a"),
      s"interleaved writers must not drop entries, got ${fin.keySet}")
    assert(fin("R.shared").path === "/tmp/from_a2", "last writer wins")
  }

  test("concurrent threaded writers all survive (retry on lost swap race)") {
    val dir = Files.createTempDirectory("catalog_thr").toString
    new Catalog(spark, dir).register(
      Resource("T.seed", "table", "parquet", "/tmp/seed"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try {
          val c = new Catalog(spark, dir)
          (0 until 3).foreach { i =>
            c.register(Resource(s"T.w$t.e$i", "table", "parquet", s"/tmp/$t/$i"))
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"writer threads failed: ${errs.peek()}")
    val names = new Catalog(spark, dir).resources.keySet
    val want = Set("T.seed") ++
      (for (t <- 0 until 2; i <- 0 until 3) yield s"T.w$t.e$i")
    assert(names === want, s"lost entries under concurrency: ${want -- names}")
  }

  test("reader polling through a slow writer's commits never sees empty, no sleeps") {
    val dir = Files.createTempDirectory("catalog_poll").toString
    new Catalog(spark, dir).register(
      Resource("P.seed", "table", "parquet", "/tmp/seed"))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      try {
        val c = new Catalog(spark, dir)
        (0 until 6).foreach { i =>
          c.register(Resource(s"P.w$i", "table", "parquet", s"/tmp/$i"))
        }
      } catch { case e: Throwable => errs.add(e) }
      finally stop.set(true)
    })
    writer.start()
    // fresh-instance reads race every phase of the writer's commit
    // (stage, marker create, GC of the superseded version): the marker
    // protocol must keep a live version resolvable at every instant
    var polls = 0
    while (!stop.get()) {
      val seen = new Catalog(spark, dir).resources.keySet
      assert(seen.contains("P.seed"),
        s"reader observed a catalog without the seed entry: $seen")
      polls += 1
    }
    writer.join()
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    assert(polls > 0, "reader never overlapped the writer")
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("P.seed") ++ (0 until 6).map(i => s"P.w$i"))
  }

  test("crashed writer (staged version without marker) is invisible; no data loss") {
    val dir = Files.createTempDirectory("catalog_crash").toString
    val cat = new Catalog(spark, dir)
    cat.register(Resource("R.x", "table", "parquet", "/tmp/x"))
    // simulate a writer dying after staging its version directory but
    // before creating the marker: the orphan must be unreachable
    spark.createDataFrame(Seq(
      Resource("R.ghost", "table", "parquet", "/tmp/ghost"))).coalesce(1)
      .write.parquet(s"$dir/resources.vdeadbeef00000000")
    assert(new Catalog(spark, dir).resources.keySet === Set("R.x"),
      "an unmarked staged version must not be visible to readers")
    // and the next writer merges from the LIVE table, not the orphan
    val c2 = new Catalog(spark, dir)
    c2.register(Resource("R.y", "table", "parquet", "/tmp/y"))
    assert(new Catalog(spark, dir).resources.keySet === Set("R.x", "R.y"))
  }

  test("pre-pointer layout reads (incl. crashed .bak state) and migrates on write") {
    val dir = Files.createTempDirectory("catalog_legacy").toString
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/resources")
    val bak = new org.apache.hadoop.fs.Path(s"$dir/resources.bak")
    // a warehouse written by the old rename protocol: plain table dir
    spark.createDataFrame(Seq(
      Resource("L.old", "table", "parquet", "/tmp/old"))).coalesce(1)
      .write.parquet(live.toString)
    assert(new Catalog(spark, dir).resources.keySet === Set("L.old"))
    // old protocol's crashed-swap state: live gone, .bak is the only copy
    assert(fs.rename(live, bak))
    assert(new Catalog(spark, dir).resources.keySet === Set("L.old"),
      "reads must restore the legacy .bak")
    assert(fs.exists(live) && !fs.exists(bak))
    // a write merges the legacy entries and migrates to the marker layout
    val c = new Catalog(spark, dir)
    c.register(Resource("L.new", "table", "parquet", "/tmp/new"))
    assert(!fs.exists(live) && !fs.exists(bak), "legacy layout not migrated")
    assert(new Catalog(spark, dir).resources.keySet === Set("L.old", "L.new"))
  }

  test("many-to-many edge relation binds forward and inverse (metabase.py:1577-1617)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("catalog_mm").toString
    val cat = new Catalog(spark, dir)
    val sf = "/root/testdata/sf0.001"
    cat.register(Resource("T.part", "table", "parquet", s"$sf/part.parquet"))
    cat.register(Resource("T.supplier", "table", "parquet", s"$sf/supplier.parquet"))
    cat.register(Resource("T.lineitem", "table", "parquet", s"$sf/lineitem.parquet"))
    cat.addRelation(Relation("ps", "T.part", "p_partkey",
      "T.supplier", "s_suppkey", "many-to-many",
      edge = "T.lineitem", edgeSrcCol = "l_partkey", edgeDstCol = "l_suppkey"))
    // a fresh instance round-trips the 9-field TSV row
    val cat2 = new Catalog(spark, dir)
    assert(cat2.relations("ps").edge === "T.lineitem")
    val fwd = cat2.bind(spark, "ps")
    // edge data columns ride along with both endpoint tables
    assert(Seq("p_name", "s_name", "l_quantity").forall(fwd.columns.contains))
    val inv = cat2.bindInverse(spark, "ps")
    // same edge set either way
    assert(fwd.count() === inv.count())
    val fwdPairs = fwd.select(col("p_partkey"), col("s_suppkey")).distinct().count()
    val invPairs = inv.select(col("p_partkey"), col("s_suppkey")).distinct().count()
    assert(fwdPairs === invPairs)
    // one-to-many inverse flips to many-to-one (right-preserving)
    cat2.addRelation(Relation("supp_nation", "T.supplier", "s_nationkey",
      "T.part", "p_partkey", "one-to-many"))
    assert(cat2.bindInverse(spark, "supp_nation").count() > 0)
  }
}
