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

  test("recycled-claim backout disclaims a behalf-published marker of its own commit (r18)") {
    // the r18 residual: a writer that wins a RECYCLED generation claim
    // (its gen's claim file was GC'd by two later commits landing
    // between its stage and its claim) backs out when it sees the
    // foreign newer marker — and if a peer behalf-published the
    // writer's own (gen, id) marker while it stalled, that marker must
    // be removed WITH the version dir, not left dangling at nothing.
    val dir = Files.createTempDirectory("catalog_recycle").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val c1 = new Catalog(spark, dir)
    c1.register(Resource("R.seed", "table", "parquet", "/tmp/seed")) // gen1
    val stale = new Catalog(spark, dir)
    val firstStage = new java.util.concurrent.atomic.AtomicReference[String](null)
    // ONE-SHOT hooks on the stale writer's first attempt:
    //  - after it stages (base = gen1, so it will claim gen2), two
    //    competing commits land: gen2 and gen3 — gen3's GC deletes
    //    gen2's claim file, arming the recycled window (the path lock
    //    is reentrant on this thread, so in-hook registers are safe);
    //  - after it then WINS the recycled gen2 claim, simulate a peer's
    //    behalf-publish of its own (gen2, id) marker.
    stale.onStaged = m =>
      if (firstStage.compareAndSet(null, s"${m.gen}.${m.id}")) {
        c1.register(Resource("R.c1a", "table", "parquet", "/tmp/a")) // gen2
        c1.register(Resource("R.c1b", "table", "parquet", "/tmp/b")) // gen3, GCs gen2 claim
        assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/resources.gen.${m.gen}")),
          "recycled window not armed: the stale gen's claim file still exists")
      }
    stale.onClaimed = m =>
      if (s"${m.gen}.${m.id}" == firstStage.get)
        fs.create(new org.apache.hadoop.fs.Path(
          s"$dir/resources.ptr.${m.gen}.${m.id}"), false).close()
    // the decisive observation point is BETWEEN backout and the retry
    // commit (the retry's own GC would eventually sweep a dangling
    // sub-max marker, so the end state can't distinguish the fix):
    // at the second attempt's start the behalf marker must already be
    // gone — the backout itself disclaimed it, not later housekeeping
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val danglingAtRetry = new java.util.concurrent.atomic.AtomicBoolean(false)
    stale.onBeforeCommit = () =>
      if (attempts.incrementAndGet() == 2 && firstStage.get != null)
        danglingAtRetry.set(fs.exists(new org.apache.hadoop.fs.Path(
          s"$dir/resources.ptr.${firstStage.get}")))
    stale.register(Resource("R.stale", "table", "parquet", "/tmp/s"))
    assert(attempts.get() >= 2, "backout/retry never happened — scenario not armed")
    assert(!danglingAtRetry.get,
      "behalf-published marker still dangled after the backout (pre-r18 behavior)")
    // everything committed: the stale writer re-merged after backout
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("R.seed", "R.c1a", "R.c1b", "R.stale"))
    // the disclaimed behalf marker is GONE (pre-r18 it dangled at a
    // deleted version dir), and the warehouse converged to one live
    // marker whose version dir exists
    assert(firstStage.get != null, "scenario never armed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/resources.ptr.${firstStage.get}")),
      s"dangling behalf marker resources.ptr.${firstStage.get} survived the backout")
    val markers = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.ptr.*"))
    assert(markers.length === 1, s"expected one live marker, got ${markers.length}")
    val vid = markers.head.getPath.getName.split('.').last
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/resources.v$vid")))
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

  /** Plays a CROSS-PROCESS writer with raw FS ops (bypassing the
    * per-JVM lock), executing the full CLAIM-protocol commit: read
    * live through the max marker, merge, stage, atomically claim the
    * next generation, mark, GC strictly older. `ignoreId` simulates
    * this writer having LISTED before a marker with that version id
    * existed (both writers then compute the same next generation —
    * the claim, not any marker tie-break, decides who owns it). A
    * lost claim re-lists fresh and retries, like the real protocol. */
  private def rawCommit(dir: String, id: String, extra: Seq[Resource],
                        ignoreId: Option[String] = None): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val table = s"$dir/resources"
    def markers(): Seq[(Long, String)] = {
      val sts = fs.globStatus(new org.apache.hadoop.fs.Path(table + ".ptr.*"))
      if (sts == null) Seq.empty
      else sts.toSeq.map { st =>
        val rest = st.getPath.getName.stripPrefix("resources.ptr.")
        val dot = rest.indexOf('.')
        (rest.take(dot).toLong, rest.drop(dot + 1))
      }
    }
    def attempt(ignore: Option[String]): Boolean = {
      val (liveGen, liveId) =
        markers().filterNot(m => ignore.contains(m._2)).max
      val live = spark.read.parquet(s"$table.v$liveId")
        .as[Resource](org.apache.spark.sql.Encoders.product[Resource])
        .collect().map(r => r.name -> r).toMap
      val merged = (live ++ extra.map(r => r.name -> r)).values.toSeq.sortBy(_.name)
      spark.createDataFrame(merged).coalesce(1).write
        .mode("overwrite").parquet(s"$table.v$id")
      val gen = liveGen + 1
      // the atomic claim (hard link, like the protocol's local path)
      val claim = java.nio.file.Paths.get(s"$table.gen.$gen")
      val tmp = java.nio.file.Paths.get(s"$table.gen.$gen.stage.$id")
      java.nio.file.Files.write(tmp, id.getBytes("UTF-8"))
      val won =
        try { java.nio.file.Files.createLink(claim, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      java.nio.file.Files.deleteIfExists(tmp)
      if (!won) return false
      fs.create(new org.apache.hadoop.fs.Path(s"$table.ptr.$gen.$id"),
        false).close()
      val ord = Ordering.Tuple2[Long, String]
      markers().filter(m => ord.lt(m, (gen, id))).foreach {
        case (g, i) =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$table.ptr.$g.$i"), false)
          fs.delete(new org.apache.hadoop.fs.Path(s"$table.v$i"), true)
          fs.delete(new org.apache.hadoop.fs.Path(s"$table.gen.$g"), false)
      }
      true
    }
    if (!attempt(ignoreId))
      assert(attempt(None), "foreign writer lost the claim twice")
  }

  test("foreign commit completing inside the stage window is never lost") {
    // the r14 hole hunt: writer B runs a COMPLETE commit (list, stage,
    // mark, winner-check, GC) in the window after A computed its
    // generation and staged, but BEFORE A's marker exists. B's winner
    // check cannot see A (no marker yet) — B returns success. If A's
    // id then sorts above B's, a tie-break on marker order alone lets
    // A's winner check pass too, and A's GC silently retires B's
    // ACKNOWLEDGED commit. The protocol must not lose B's entry under
    // this schedule regardless of id order ("0"*16 sorts below any
    // random hex id, forcing the bad order).
    val dir = Files.createTempDirectory("catalog_xstage").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("H.seed", "table", "parquet", "/tmp/seed"))
    var fired = false
    a.onStaged = m => if (!fired) {
      fired = true
      rawCommit(dir, "0" * 16, Seq(
        Resource("H.from_b", "table", "parquet", "/tmp/b")))
    }
    a.register(Resource("H.from_a", "table", "parquet", "/tmp/a"))
    a.onStaged = _ => ()
    assert(fired, "the race window hook never fired")
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("H.seed", "H.from_a", "H.from_b"),
      "a foreign commit acknowledged inside the stage window must survive")
  }

  test("foreign commit in the read-merge window forces a re-merge (stale base)") {
    // the second r14 hole: writer A reads the live table, merges its
    // entry, and a foreign commit lands BEFORE A commits. If A's
    // generation were "current max + 1" (computed at commit time,
    // decoupled from the base A merged from), A would claim the
    // foreign successor and publish a table merged from the
    // PRE-foreign base — the foreign writer's acknowledged entry
    // silently gone. Generations are coupled to the base (CAS): A's
    // claim of base+1 must fail against the foreign claim and A must
    // re-merge.
    val dir = Files.createTempDirectory("catalog_stale").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("S.seed", "table", "parquet", "/tmp/seed"))
    var fired = false
    a.onBeforeCommit = () => if (!fired) {
      fired = true
      rawCommit(dir, "b" * 16, Seq(
        Resource("S.from_b", "table", "parquet", "/tmp/b")))
    }
    a.register(Resource("S.from_a", "table", "parquet", "/tmp/a"))
    a.onBeforeCommit = () => ()
    assert(fired, "the race window hook never fired")
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("S.seed", "S.from_a", "S.from_b"),
      "a foreign commit in the read-merge window must force a re-merge")
  }

  test("cross-process same-generation contention: the claim decides, no entry lost") {
    val dir = Files.createTempDirectory("catalog_xgen").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("X.seed", "table", "parquet", "/tmp/seed"))
    // writer B (a 'foreign process') listed BEFORE A's marker existed
    // (ignoreId), so it computes the SAME generation — pre-claim, this
    // was the (gen, id) marker tie the old winner check adjudicated;
    // now B's claim of that generation must FAIL outright (A holds the
    // claim from before its marker), and B re-merges through A's live
    // table into the next generation
    var fired = false
    a.onMarkerCreated = m => if (!fired) {
      fired = true
      rawCommit(dir, "z" * 16, Seq(
        Resource("X.from_b", "table", "parquet", "/tmp/b")),
        ignoreId = Some(m.id)) // B listed before A's marker: same gen
    }
    a.register(Resource("X.from_a", "table", "parquet", "/tmp/a"))
    a.onMarkerCreated = _ => ()
    assert(fired, "the race window hook never fired")
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("X.seed", "X.from_a", "X.from_b"),
      "losing the same-generation claim must re-merge through the winner")
  }

  test("newer generation landing mid-commit: GC never touches it, no catalog loss") {
    val dir = Files.createTempDirectory("catalog_xgc").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("G.seed", "table", "parquet", "/tmp/seed"))
    // writer B commits generation N+1 AFTER A created its gen-N marker
    // but BEFORE A's GC runs: A's GC must only touch strictly older
    // generations (deleting B's here left ZERO markers and version
    // dirs — total silent catalog loss, the r12 ADVICE-high), and A
    // must stay acknowledged through B's GC of A's claim (B's base
    // contains A's entry, because B listed A's marker)
    var fired = false
    a.onMarkerCreated = m => if (!fired) {
      fired = true
      rawCommit(dir, "z" * 16, Seq(
        Resource("G.from_b", "table", "parquet", "/tmp/b")))
    }
    a.register(Resource("G.from_a", "table", "parquet", "/tmp/a"))
    a.onMarkerCreated = _ => ()
    assert(fired, "the race window hook never fired")
    val fin = new Catalog(spark, dir).resources.keySet
    assert(fin === Set("G.seed", "G.from_a", "G.from_b"),
      s"mid-commit newer generation must survive the loser's GC, got $fin")
    // the warehouse converged: exactly one marker, its version dir present
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ms = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.ptr.*"))
    assert(ms != null && ms.length === 1,
      s"expected one live marker, got ${Option(ms).map(_.length)}")
    val vid = ms.head.getPath.getName.split('.').last
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/resources.v$vid")),
      "the live marker must point at an existing version directory")
  }

  test("recycled claim: a stale writer re-claiming a GC'd generation backs out") {
    // the foreign writer commits TWO generations inside A's stage
    // window; its second GC deletes the first generation's claim file,
    // so A's claim of base+1 SUCCEEDS on the recycled name even though
    // that generation's marker existed — the guard (any marker at or
    // past the claimed gen) must make A release and re-merge, never
    // publish a second marker for a superseded generation
    val dir = Files.createTempDirectory("catalog_recycle").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("R2.seed", "table", "parquet", "/tmp/seed"))
    var fired = false
    a.onStaged = _ => if (!fired) {
      fired = true
      rawCommit(dir, "b" * 16, Seq(
        Resource("R2.b1", "table", "parquet", "/tmp/b1")))
      rawCommit(dir, "c" * 16, Seq(
        Resource("R2.b2", "table", "parquet", "/tmp/b2")))
    }
    a.register(Resource("R2.from_a", "table", "parquet", "/tmp/a"))
    a.onStaged = _ => ()
    assert(fired, "the race window hook never fired")
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("R2.seed", "R2.b1", "R2.b2", "R2.from_a"),
      "a recycled claim must not let a stale base skip committed entries")
    // exactly one marker per generation ever: the live warehouse holds
    // one marker and its generation is past the foreign pair's
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ms = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.ptr.*"))
    assert(ms != null && ms.length === 1)
  }

  test("superseded versions are swept only past the grace age") {
    val dir = Files.createTempDirectory("catalog_grace").toString
    val a = new Catalog(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def versions(): Int = {
      val sts = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.v*"))
      if (sts == null) 0 else sts.length
    }
    a.register(Resource("V.a", "table", "parquet", "/tmp/a"))
    a.register(Resource("V.b", "table", "parquet", "/tmp/b"))
    // default grace (10 min): the superseded gen-1 version LINGERS so a
    // mid-scan reader finishes on it (its marker+claim are gone)
    assert(versions() === 2, "superseded version must survive inside the grace age")
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$dir/resources.ptr.*")).length === 1, "but its marker must not")
    // grace 0: the next commit sweeps everything unreferenced
    a.versionGraceMs = 0L
    try {
      Thread.sleep(20) // mtimes must fall behind the cutoff
      a.register(Resource("V.c", "table", "parquet", "/tmp/c"))
      assert(versions() === 1, "past the grace age only the live version remains")
    } finally a.versionGraceMs = 600000L
    assert(new Catalog(spark, dir).resources.keySet === Set("V.a", "V.b", "V.c"))
  }

  test("writer dead between claim and marker: published on its behalf, not lost") {
    // a complete-but-unpointed commit (version staged, generation
    // claimed with content, marker never created — the writer died in
    // between): the next writer loses the claim, finds no marker, and
    // after publishBehalfAfterMs creates the dead writer's marker from
    // the claim content — the staged version is complete before any
    // claim by construction, so publishing it is always sound
    val dir = Files.createTempDirectory("catalog_dead1").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("D.seed", "table", "parquet", "/tmp/seed"))
    val deadId = "d" * 16
    spark.createDataFrame(Seq(
        Resource("D.dead", "table", "parquet", "/tmp/dead"),
        Resource("D.seed", "table", "parquet", "/tmp/seed")))
      .coalesce(1).write.parquet(s"$dir/resources.v$deadId")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/resources.gen.2"), deadId.getBytes("UTF-8"))
    a.publishBehalfAfterMs = 50
    a.awaitPtrMs = 3000
    a.register(Resource("D.from_a", "table", "parquet", "/tmp/a"))
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("D.seed", "D.dead", "D.from_a"),
      "a claimed-and-staged commit must be published, never skipped")
  }

  test("content-less corpse claim is swept after the deadline; commits proceed") {
    // a claim with no content can only come from a writer that died
    // INSIDE claim creation on a filesystem without atomic
    // link-with-content (impossible locally; modeled by hand) — it was
    // never acknowledged, so sweeping it is safe and unblocks the
    // generation
    val dir = Files.createTempDirectory("catalog_dead2").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("E.seed", "table", "parquet", "/tmp/seed"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/resources.gen.2"))
    a.awaitPtrMs = 300
    a.register(Resource("E.from_a", "table", "parquet", "/tmp/a"))
    assert(new Catalog(spark, dir).resources.keySet ===
      Set("E.seed", "E.from_a"))
  }

  test("winner whose marker was behalf-published treats it as its own commit") {
    // a claim-losing peer behalf-publishes the (gen, id) marker after
    // publishBehalfAfterMs; a winner stalled >1 s between claim and
    // marker (GC pause, slow globStatus) then finds its OWN marker
    // pre-created — that marker has this commit's gen+id, so the commit
    // is already acknowledged: register must SUCCEED and still run its
    // GC/cache update, not throw FileAlreadyExistsException (ADVICE r14)
    val dir = Files.createTempDirectory("catalog_behalf_tie").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("B.seed", "table", "parquet", "/tmp/seed"))
    a.onClaimed = { m =>
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$dir/resources.ptr.${m.gen}.${m.id}"))
    }
    try a.register(Resource("B.two", "table", "parquet", "/tmp/two"))
    finally a.onClaimed = _ => ()
    assert(new Catalog(spark, dir).resources.keySet === Set("B.seed", "B.two"))
    // GC ran despite the pre-created marker: the superseded gen-1
    // marker is retired, exactly one marker remains
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ms = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.ptr.*"))
    assert(ms != null && ms.length === 1,
      s"winner must still GC superseded markers, got ${Option(ms).map(_.length)}")
  }

  test("claim naming a nonexistent version never mints a marker; catalog stays readable") {
    // a truncated/garbled claim id (short read, or content visibility
    // lagging the create on a remote FS) must not be behalf-published:
    // a max-generation marker pointing at nothing would exhaust every
    // reader's retries and brick the table until manual repair
    // (ADVICE r14). The garbled claim is swept at the corpse deadline
    // and the writer recommits.
    val dir = Files.createTempDirectory("catalog_garbled").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("G.seed", "table", "parquet", "/tmp/seed"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/resources.gen.2"), ("z" * 16).getBytes("UTF-8"))
    a.publishBehalfAfterMs = 50
    a.awaitPtrMs = 400
    a.register(Resource("G.two", "table", "parquet", "/tmp/two"))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$dir/resources.ptr.*.${"z" * 16}")) match {
      case null => true
      case arr => arr.isEmpty
    }, "a claim whose version directory does not exist must never be published")
    assert(new Catalog(spark, dir).resources.keySet === Set("G.seed", "G.two"))
  }

  test("non-atomic claim filesystem: writes fail fast unless explicitly opted in") {
    // the generation claim is only a CAS on filesystems with atomic
    // put-if-absent; a bare object store's create(overwrite=false) is
    // HEAD-then-PUT — last-writer-wins on the claim itself. The
    // catalog must refuse such schemes with a named error instead of
    // silently degrading (VERDICT r14 #5).
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mocks3.impl", classOf[MockObjectStoreFs].getName)
    hc.setBoolean("fs.mocks3.impl.disable.cache", true)
    val local = Files.createTempDirectory("catalog_mocks3").toString
    val dir = s"mocks3://$local"
    val err = intercept[UnsupportedOperationException] {
      new Catalog(spark, dir).register(
        Resource("N.one", "table", "parquet", "/tmp/one"))
    }
    assert(err.getMessage.contains("mocks3") &&
      err.getMessage.contains("acceptNonAtomicClaims"))
    // nothing was staged — the refusal precedes any write
    assert(new java.io.File(local).listFiles().isEmpty)
    // explicit opt-in (store known to provide conditional puts) proceeds
    spark.conf.set("spark.graft.catalog.acceptNonAtomicClaims", "true")
    try {
      new Catalog(spark, dir).register(
        Resource("N.one", "table", "parquet", "/tmp/one"))
      assert(new Catalog(spark, dir).resources.keySet === Set("N.one"))
    } finally spark.conf.unset("spark.graft.catalog.acceptNonAtomicClaims")
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

/** RawLocalFileSystem masquerading as an object-store scheme with no
  * atomic put-if-absent guarantee — drives the fail-fast envelope test.
  * Top-level class: Hadoop instantiates it by name via fs.mocks3.impl. */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: java.net.URI = java.net.URI.create("mocks3:///")
}
