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

  test("reader does not heal through an IN-FLIGHT swap (.tmp present)") {
    val dir = Files.createTempDirectory("catalog_inflight").toString
    val cat = new Catalog(spark, dir)
    cat.register(Resource("R.old", "table", "parquet", "/tmp/old"))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/resources")
    val bak = new org.apache.hadoop.fs.Path(s"$dir/resources.bak")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/resources.tmp")
    // freeze a writer mid-swap: new table staged at .tmp, live moved aside
    spark.createDataFrame(Seq(
      Resource("R.new", "table", "parquet", "/tmp/new"))).coalesce(1)
      .write.parquet(tmp.toString)
    assert(fs.rename(live, bak))
    // a concurrent reader must NOT rename .bak back (that would make the
    // frozen writer's forward rename fail spuriously); it reports absent
    assert(new Catalog(spark, dir).resources === Map.empty)
    assert(fs.exists(bak) && fs.exists(tmp) && !fs.exists(live),
      "reader healed through an in-flight swap")
    // the writer lands its rename; the next read sees the NEW table
    assert(fs.rename(tmp, live)); fs.delete(bak, true)
    assert(new Catalog(spark, dir).resources.keySet === Set("R.new"))
  }

  test("crashed swap (live table gone, .bak present) heals on next read") {
    val dir = Files.createTempDirectory("catalog_bak").toString
    val cat = new Catalog(spark, dir)
    cat.register(Resource("R.x", "table", "parquet", "/tmp/x"))
    // simulate a writer dying between rename(dst, bak) and
    // rename(tmp, dst): live dir moved aside, nothing renamed in
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/resources")
    val bak = new org.apache.hadoop.fs.Path(s"$dir/resources.bak")
    assert(fs.rename(live, bak))
    val healed = new Catalog(spark, dir)
    assert(healed.resources.keySet === Set("R.x"), "reads must restore .bak")
    assert(fs.exists(live) && !fs.exists(bak))
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
