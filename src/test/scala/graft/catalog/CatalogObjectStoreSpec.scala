package graft.catalog

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** The conditional-put claim backend against a filesystem that
  * emulates a bare object store's HEAD-then-PUT create (VERDICT r15
  * #2): first pin that the naive create really does double-win on
  * such a store (the refusal envelope is not hypothetical), then that
  * `ConditionalPutClaim`'s verify schedule admits exactly one winner
  * under the same race, then that the catalog's refusal lifts for a
  * declared scheme and full concurrent commits survive — including
  * against a SECOND JVM running the unmodified register path.
  */
class CatalogObjectStoreSpec extends SparkSuite {

  private def hadoopConf = spark.sparkContext.hadoopConfiguration

  private def initMockFs(windowMs: Long): Unit = {
    hadoopConf.set("fs.mockobj.impl", classOf[MockObjectStoreFileSystem].getName)
    hadoopConf.setLong("fs.mockobj.race.window.ms", windowMs)
  }

  private def mockDir(prefix: String): String =
    "mockobj:" + Files.createTempDirectory(prefix).toString

  /** Race `n` threads through `backend.putIfAbsent` on one fresh
    * path; returns the per-thread results and the final content. */
  private def race(backend: ClaimBackend, n: Int, windowMs: Long): (Seq[Boolean], String) = {
    initMockFs(windowMs)
    val dir = mockDir("claim_race")
    val p = new Path(s"$dir/table.gen.1")
    val fs = p.getFileSystem(hadoopConf)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    val threads = (0 until n).map { i =>
      val t = new Thread(() => {
        start.await(10, TimeUnit.SECONDS)
        results.put(i, backend.putIfAbsent(fs, p, s"writer$i".getBytes("UTF-8")))
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(30000))
    val content = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    ((0 until n).map(results.get(_)), content)
  }

  test("the emulated race window really engages on the claim path (r17 regression guard)") {
    // r16's mock overrode only the permission-variant create, which
    // `fs.create(p, false)` never reaches on RawLocalFileSystem — the
    // races ran on the local FS's natural µs window instead of the
    // configured one. Pin the engagement: a solo create through the
    // exact ClaimBackend call path must pay the configured window.
    initMockFs(windowMs = 300L)
    val p = new Path(s"${mockDir("window_guard")}/t.gen.1")
    val fs = p.getFileSystem(hadoopConf)
    val t0 = System.nanoTime()
    assert(AtomicCreateClaim.putIfAbsent(fs, p, "w".getBytes("UTF-8")))
    val ms = (System.nanoTime() - t0) / 1000000
    assert(ms >= 300L, s"claim create finished in ${ms}ms — the ${300}ms " +
      "HEAD-then-PUT window did not engage on the claim path")
  }

  test("naive create(overwrite=false) double-wins on a HEAD-then-PUT store") {
    // both writers pass the HEAD before either PUTs — enforced by the
    // mock FS's armed rendezvous, not scheduler luck (ADVICE r16) —
    // both PUT, both believe they own the claim: the lost-update
    // class the catalog refuses bare object stores over
    MockObjectStoreFileSystem.headBarrier =
      new java.util.concurrent.CyclicBarrier(2)
    try {
      val (wins, _) = race(AtomicCreateClaim, n = 2, windowMs = 20L)
      assert(wins === Seq(true, true),
        s"expected the naive primitive to double-win under the race, got $wins")
    } finally MockObjectStoreFileSystem.headBarrier = null
  }

  test("transient store faults rethrow instead of masquerading as a lost race (ADVICE r16)") {
    import java.net.URI
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{FSDataOutputStream, RawLocalFileSystem}
    import org.apache.hadoop.util.Progressable
    val dir = Files.createTempDirectory("claim_transient")
    val claim = new ConditionalPutClaim(settleMs = 0L)

    // create-time fault: nothing was PUT, so the call must RETHROW
    // (the caller can retry) — the old blanket `false` left the
    // caller believing a race it never entered was lost
    // NB: override the SIX-arg overload — `fs.create(p, false)`
    // resolves there on RawLocalFileSystem and never reaches the
    // permission variant (see MockObjectStoreFileSystem's note)
    val createFails = new RawLocalFileSystem {
      override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                          replication: Short, blockSize: Long,
                          progress: Progressable): FSDataOutputStream =
        throw new java.io.IOException("503 slow down")
    }
    createFails.initialize(URI.create("file:///"), new Configuration())
    val p1 = new Path(s"file:$dir/a.gen.1")
    intercept[java.io.IOException] {
      claim.putIfAbsent(createFails, p1, "w".getBytes("UTF-8"))
    }
    assert(!dir.resolve("a.gen.1").toFile.exists, "no claim corpse on a create fault")

    // close-time fault AFTER the content landed: the store says this
    // writer's content owns the claim, so it WON — a transient close
    // error must not make the winner back out (its claim file would
    // persist as a corpse stalling every writer for the deadline)
    val closeThrows = new RawLocalFileSystem {
      override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                          replication: Short, blockSize: Long,
                          progress: Progressable): FSDataOutputStream = {
        val real = super.create(f, overwrite, bufferSize,
          replication, blockSize, progress)
        new FSDataOutputStream(new java.io.FilterOutputStream(real) {
          override def close(): Unit = { super.close(); throw new java.io.IOException("conn reset") }
        }, null)
      }
    }
    closeThrows.initialize(URI.create("file:///"), new Configuration())
    val p2 = new Path(s"file:$dir/b.gen.1")
    assert(claim.putIfAbsent(closeThrows, p2, "winner".getBytes("UTF-8")),
      "a close fault whose PUT landed is a WIN, not a lost race")

    // close-time fault where a COMPETING content landed: genuine loss
    val p3 = new Path(s"file:$dir/c.gen.1")
    java.nio.file.Files.write(dir.resolve("c.gen.1"), "other".getBytes("UTF-8"))
    val overwriteLies = new RawLocalFileSystem {
      override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                          replication: Short, blockSize: Long,
                          progress: Progressable): FSDataOutputStream = {
        // like an object store mid-race: the create "succeeds"…
        val sink = new java.io.ByteArrayOutputStream()
        new FSDataOutputStream(new java.io.FilterOutputStream(sink) {
          // …but the conditional put is rejected at commit (close)
          override def close(): Unit = throw new java.io.IOException("412 precondition failed")
        }, null)
      }
    }
    overwriteLies.initialize(URI.create("file:///"), new Configuration())
    assert(!claim.putIfAbsent(overwriteLies, p3, "loser".getBytes("UTF-8")),
      "a rejected conditional put with a competing claim present is a loss")
  }

  test("a transient claim fault is retried in place and leaks no staged version (r17)") {
    // the backend throws once (a 503-class blip), then behaves; the
    // commit path must absorb it — retry the SAME claim in place —
    // and a persistent fault must not orphan the staged parquet dir
    val dir = Files.createTempDirectory("cat_flaky").toString
    val faults = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky = new ClaimBackend {
      def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                      content: Array[Byte]): Boolean = {
        if (faults.getAndIncrement() == 0)
          throw new java.io.IOException("503 slow down")
        HardLinkClaim.putIfAbsent(fs, p, content)
      }
    }
    Catalog.registerClaimBackend("file", flaky)
    try {
      val c = new Catalog(spark, dir)
      c.register(Resource("F.a", "table", "parquet", "/tmp/a")) // faulted once
      c.register(Resource("F.b", "table", "parquet", "/tmp/b"))
      assert(faults.get() >= 3, s"fault injected + 2 real claims, saw ${faults.get()}")
      assert(new Catalog(spark, dir).resources.keySet === Set("F.a", "F.b"))
      // every version dir must belong to a committed generation — the
      // faulted attempt retried with the SAME staged id, so the two
      // commits leave at most two resources.v* dirs (GC may prune)
      val vdirs = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("resources.v")).toSeq
      assert(vdirs.size <= 2, s"orphaned staged versions: $vdirs")

      // persistent fault: the commit must THROW (not hang, not
      // corrupt) and clean its staged dir up
      Catalog.registerClaimBackend("file", new ClaimBackend {
        def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                        content: Array[Byte]): Boolean =
          throw new java.io.IOException("store down")
      })
      val before = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("resources.v")).toSet
      intercept[java.io.IOException] {
        new Catalog(spark, dir).register(Resource("F.c", "table", "parquet", "/tmp/c"))
      }
      val after = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("resources.v")).toSet
      assert(after === before, s"staged version leaked: ${after -- before}")
    } finally Catalog.unregisterClaimBackend("file")
  }

  test("a landed own-content claim behind faults is a recovered WIN, not a self-corpse (ADVICE r17)") {
    // the r17 self-corpse: the PUT lands, the close/read-backs fault,
    // the in-place retry then sees AlreadyExists and reports false —
    // and the r17 code deleted the staged version dir while the claim
    // (content = our id) persisted, opening the behalf-publish TOCTOU
    // (a waiting loser could mint a marker at the deleted version —
    // a bricked generation). The fix: a false whose claim content is
    // OUR OWN id is a win — continue through the normal marker path
    // with the version dir alive.
    val dir = Files.createTempDirectory("cat_selfcorpse").toString
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val backend = new ClaimBackend {
      def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                      content: Array[Byte]): Boolean = {
        calls.incrementAndGet()
        if (fs.exists(p)) false // the retry sees AlreadyExists
        else {
          // the PUT lands…
          HardLinkClaim.putIfAbsent(fs, p, content)
          // …but the winner never learns it
          throw new java.io.IOException("conn reset after landed PUT")
        }
      }
    }
    Catalog.registerClaimBackend("file", backend)
    try {
      val c = new Catalog(spark, dir)
      c.register(Resource("S.a", "table", "parquet", "/tmp/a"))
      // the win was RECOVERED from the own-content claim, not re-merged
      // through a fresh generation: exactly the faulted call + its one
      // retry, and the commit is readable
      assert(calls.get() === 2, s"expected fault + retry only, saw ${calls.get()} claim calls")
      assert(new Catalog(spark, dir).resources.keySet === Set("S.a"))
      // marker/version consistency: the live marker's version dir exists
      val files = new java.io.File(dir).listFiles().map(_.getName).toSet
      val markers = files.filter(_.startsWith("resources.ptr."))
      assert(markers.size === 1, s"expected one marker, got $markers")
      val vid = markers.head.split('.').last
      assert(files.contains(s"resources.v$vid"),
        s"marker $markers points at a missing version dir (files: $files)")
    } finally Catalog.unregisterClaimBackend("file")
  }

  test("a throw after a landed PUT preserves the claim+version pair for behalf-publish (ADVICE r17)") {
    // total store outage AFTER the first PUT landed: every claim call
    // faults, the commit path rethrows — and must NOT delete the
    // staged version out from under the persisting own-content claim.
    // A later healthy writer then behalf-publishes the pair, making
    // the throw-reported commit live (the standard fault-after-PUT
    // ambiguity), instead of finding a claim that points at nothing
    // and stalling on the corpse deadline.
    val dir = Files.createTempDirectory("cat_landed_throw").toString
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var healed = false
    val backend = new ClaimBackend {
      def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                      content: Array[Byte]): Boolean = {
        if (healed) return HardLinkClaim.putIfAbsent(fs, p, content)
        if (puts.getAndIncrement() == 0 && !fs.exists(p))
          HardLinkClaim.putIfAbsent(fs, p, content) // first PUT lands
        throw new java.io.IOException("store down")
      }
    }
    Catalog.registerClaimBackend("file", backend)
    try {
      val c1 = new Catalog(spark, dir)
      c1.publishBehalfAfterMs = 200L
      intercept[java.io.IOException] {
        c1.register(Resource("T.a", "table", "parquet", "/tmp/a"))
      }
      // the pair survives the throw: own-content claim + its version dir
      val files = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(files.exists(_.startsWith("resources.gen.")), s"claim missing: $files")
      val vdirs = files.filter(_.startsWith("resources.v"))
      assert(vdirs.size === 1, s"staged version not preserved: $files")

      healed = true
      val c2 = new Catalog(spark, dir)
      c2.publishBehalfAfterMs = 200L
      c2.register(Resource("T.b", "table", "parquet", "/tmp/b"))
      // the healthy writer behalf-published the stalled pair and merged
      // on top of it: BOTH commits are live, nothing bricked or lost
      assert(new Catalog(spark, dir).resources.keySet === Set("T.a", "T.b"))
    } finally Catalog.unregisterClaimBackend("file")
  }

  test("ConditionalPutClaim admits exactly one winner under the same race") {
    // settle (600ms) > race window (150ms) + write time: every
    // contender's settle re-check happens after the last in-flight
    // PUT has landed, so exactly the writer whose content survived
    // wins — and the claim file names that writer
    val (wins, content) = race(new ConditionalPutClaim(settleMs = 600L),
      n = 4, windowMs = 150L)
    assert(wins.count(identity) === 1,
      s"expected exactly one winner, got $wins")
    assert(content === s"writer${wins.indexOf(true)}",
      s"claim content '$content' does not name the winner (wins=$wins)")
  }

  test("catalog refuses the scheme undeclared, supports it declared conditional-put") {
    initMockFs(windowMs = 20L)
    val dir = mockDir("cat_obj")
    // undeclared: the named refusal
    val err = intercept[UnsupportedOperationException] {
      new Catalog(spark, dir).register(
        Resource("O.first", "table", "parquet", "/tmp/x"))
    }
    assert(err.getMessage.contains("conditionalPutSchemes"))
    // declared: full register/read works through the object store
    spark.conf.set("spark.graft.catalog.conditionalPutSchemes", "mockobj")
    spark.conf.set("spark.graft.catalog.conditionalPutSettleMs", "100")
    try {
      val c = new Catalog(spark, dir)
      c.register(Resource("O.first", "table", "parquet", "/tmp/x"))
      c.register(Resource("O.second", "table", "parquet", "/tmp/y"))
      assert(new Catalog(spark, dir).resources.keySet === Set("O.first", "O.second"))
    } finally {
      spark.conf.unset("spark.graft.catalog.conditionalPutSchemes")
      spark.conf.unset("spark.graft.catalog.conditionalPutSettleMs")
    }
  }

  test("commit storm through ConditionalPutClaim: 8 writers + injected stalls, no lost version, no orphan (r18)") {
    // VERDICT r17 #6: drive the behalf-publish/stalled-winner path
    // under the conditional-put backend at storm concurrency. 8
    // writers commit 3 resources each through the HEAD-then-PUT mock
    // (real 30 ms race window on every claim create); two writers
    // STALL 800 ms between claim and marker on their first commit —
    // past the 300 ms behalf deadline — so waiting losers must
    // behalf-publish the stalled winners' markers (the :361 path) and
    // the stalled winners must absorb their pre-created markers.
    // Afterwards: every acknowledged commit is readable (no lost
    // version) and no staged version dir survives unreferenced (no
    // orphan) once a zero-grace GC pass runs.
    initMockFs(windowMs = 30L)
    val dir = mockDir("cat_storm")
    spark.conf.set("spark.graft.catalog.conditionalPutSchemes", "mockobj")
    spark.conf.set("spark.graft.catalog.conditionalPutSettleMs", "80")
    try {
      new Catalog(spark, dir).register(
        Resource("W.seed", "table", "parquet", "/tmp/seed"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          try {
            val c = new Catalog(spark, dir)
            c.publishBehalfAfterMs = 300L
            if (t < 2) {
              // stall between claim and marker ONCE: the injected
              // window (800 > 300 behalf + 2x80 settle floor) is paid
              // by construction — the sleep sits in the hook on the
              // exact commit path (COVERAGE.md testing note)
              val stalled = new java.util.concurrent.atomic.AtomicBoolean(false)
              c.onClaimed = _ =>
                if (stalled.compareAndSet(false, true)) Thread.sleep(800L)
            }
            (0 until 3).foreach { i =>
              c.register(Resource(s"W.t$t.r$i", "table", "parquet", s"/tmp/$t/$i"))
            }
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"storm writer failed: ${errs.peek()}")
      val want = Set("W.seed") ++
        (for (t <- 0 until 8; i <- 0 until 3) yield s"W.t$t.r$i") + "W.final"
      // quiescent close: zero-grace GC sweeps anything unreferenced
      val closer = new Catalog(spark, dir)
      closer.versionGraceMs = 0L
      closer.register(Resource("W.final", "table", "parquet", "/tmp/final"))
      assert(new Catalog(spark, dir).resources.keySet === want,
        "lost acknowledged commits under the storm")
      val fs = new Path(dir).getFileSystem(hadoopConf)
      val markerIds = Option(fs.globStatus(new Path(s"$dir/resources.ptr.*")))
        .getOrElse(Array.empty).map(_.getPath.getName.split('.').last).toSet
      val vdirIds = Option(fs.globStatus(new Path(s"$dir/resources.v*")))
        .getOrElse(Array.empty)
        .map(_.getPath.getName.stripPrefix("resources.v")).toSet
      assert(markerIds.nonEmpty, "no live marker after the storm")
      assert(vdirIds === markerIds,
        s"staged versions out of step with markers: dirs $vdirIds vs markers $markerIds")
    } finally {
      spark.conf.unset("spark.graft.catalog.conditionalPutSchemes")
      spark.conf.unset("spark.graft.catalog.conditionalPutSettleMs")
    }
  }

  test("cross-JVM wild race through the object store: no lost update, converged warehouse") {
    // the CatalogCrossJvmSpec pattern on the mockobj scheme: a second
    // JVM runs the unmodified register path (CatalogWriterMain) with
    // the conditional-put declaration carried via system properties,
    // while the local writer commits a burst — every acknowledged
    // entry must survive and the warehouse must converge to one live
    // marker. The race window is real (60ms on every claim create).
    initMockFs(windowMs = 60L)
    val dir = mockDir("cat_obj_jvm")
    spark.conf.set("spark.graft.catalog.conditionalPutSchemes", "mockobj")
    spark.conf.set("spark.graft.catalog.conditionalPutSettleMs", "150")
    try {
      val a = new Catalog(spark, dir)
      a.register(Resource("V.seed", "table", "parquet", "/tmp/seed"))
      val javaBin = java.nio.file.Paths
        .get(System.getProperty("java.home"), "bin", "java").toString
      val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala
        .filter(x => x.startsWith("--add-opens") || x.startsWith("--add-exports") ||
          x.startsWith("--enable-native-access") || x.startsWith("-D"))
      val log = Files.createTempFile("catalog_obj_wild", ".log").toFile
      val p = new ProcessBuilder(
        (Seq(javaBin) ++ inherited ++ Seq("-Xmx2g",
          "-Dspark.hadoop.fs.mockobj.impl=" + classOf[MockObjectStoreFileSystem].getName,
          "-Dspark.hadoop.fs.mockobj.race.window.ms=60",
          "-Dspark.graft.catalog.conditionalPutSchemes=mockobj",
          "-Dspark.graft.catalog.conditionalPutSettleMs=150",
          "-cp", System.getProperty("java.class.path"),
          "graft.catalog.CatalogWriterMain", dir, "V.from_b")).asJava)
        .redirectErrorStream(true).redirectOutput(log).start()
      var committed = Set.empty[String]
      var i = 0
      while (i < 4) {
        val name = s"V.a$i"
        new Catalog(spark, dir).register(Resource(name, "table", "parquet", s"/tmp/a$i"))
        committed += name
        i += 1
        if (p.isAlive) Thread.sleep(250) else i = 4
      }
      val exit = p.waitFor()
      assert(exit === 0, s"foreign writer JVM failed (exit $exit):\n" +
        new String(Files.readAllBytes(log.toPath), "UTF-8").takeRight(4000))
      val fin = new Catalog(spark, dir).resources.keySet
      val expected = committed + "V.seed" + "V.from_b"
      assert(fin === expected,
        s"lost entries: ${expected -- fin}; unexpected: ${fin -- expected}")
      val fs = new Path(dir).getFileSystem(hadoopConf)
      val ms = fs.globStatus(new Path(s"$dir/resources.ptr.*"))
      assert(ms != null && ms.length === 1,
        s"expected one live marker, got ${Option(ms).map(_.length)}")
    } finally {
      spark.conf.unset("spark.graft.catalog.conditionalPutSchemes")
      spark.conf.unset("spark.graft.catalog.conditionalPutSettleMs")
    }
  }
}
