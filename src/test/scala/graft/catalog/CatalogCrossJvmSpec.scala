package graft.catalog

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** The cross-process catalog races with a REAL process boundary
  * (VERDICT r13 #6): the foreign writer is a second JVM running the
  * unmodified `Catalog.register` path (`CatalogWriterMain`) — no
  * injected hooks on it; only the LOCAL writer's seams pause it
  * inside the window under test. These are the same two schedules the
  * in-JVM seam tests pin, now with genuine process isolation (separate
  * heaps, separate per-JVM locks, real FS visibility).
  */
class CatalogCrossJvmSpec extends SparkSuite {

  /** Run CatalogWriterMain in a second JVM, blocking until it exits.
    * The child inherits this (forked test) JVM's own module flags —
    * the --add-opens set Spark needs on JDK 17 — and the test
    * classpath; heap is capped small (the child only writes a
    * one-row catalog table). */
  private def foreignRegister(dir: String, name: String): Unit = {
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("--enable-native-access") || a.startsWith("-D"))
    val cmd = Seq(javaBin) ++ inherited ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.catalog.CatalogWriterMain", dir, name)
    val log = Files.createTempFile("catalog_foreign", ".log").toFile
    val p = new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true)
      .redirectOutput(log)
      .start()
    val exit = p.waitFor()
    assert(exit === 0, s"foreign writer JVM failed (exit $exit):\n" +
      new String(Files.readAllBytes(log.toPath), "UTF-8").takeRight(4000))
  }

  private def keys(dir: String): Set[String] =
    new Catalog(spark, dir).resources.keySet

  test("second JVM commits the same generation inside the stage window") {
    // the claim-contention schedule with a real process boundary: A
    // computed its generation and staged, the foreign JVM then runs a
    // COMPLETE register (it claims that same generation and wins — A
    // has not claimed yet); A's claim must fail, A re-merges through
    // the foreign table, nothing is lost on either side
    val dir = Files.createTempDirectory("catalog_jvm_stage").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("J.seed", "table", "parquet", "/tmp/seed"))
    var fired = false
    a.onStaged = _ => if (!fired) {
      fired = true
      foreignRegister(dir, "J.from_b")
    }
    a.register(Resource("J.from_a", "table", "parquet", "/tmp/a"))
    a.onStaged = _ => ()
    assert(fired, "the race window hook never fired")
    assert(keys(dir) === Set("J.seed", "J.from_a", "J.from_b"),
      "a second JVM's commit inside the stage window must survive")
  }

  test("wild race: a second JVM and the local writer commit concurrently, no seams") {
    // no pause, no pinned window — the two writers interleave however
    // the scheduler lands them (the local writer registers several
    // entries while the foreign JVM does its one); whatever the
    // schedule, every acknowledged entry must be in the final table
    // and the warehouse must converge to one marker + one claim
    val dir = Files.createTempDirectory("catalog_jvm_wild").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("W.seed", "table", "parquet", "/tmp/seed"))
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(x => x.startsWith("--add-opens") || x.startsWith("--add-exports") ||
        x.startsWith("--enable-native-access") || x.startsWith("-D"))
    val log = Files.createTempFile("catalog_wild", ".log").toFile
    val p = new ProcessBuilder(
      (Seq(javaBin) ++ inherited ++ Seq("-Xmx2g",
        "-cp", System.getProperty("java.class.path"),
        "graft.catalog.CatalogWriterMain", dir, "W.from_b")).asJava)
      .redirectErrorStream(true).redirectOutput(log).start()
    // local writer commits a FIXED burst while the child starts up and
    // registers — enough traffic that the child's read-merge-commit
    // almost certainly overlaps local commits, but bounded, so the
    // child's retry budget (backoff + 8 attempts) always outlasts the
    // contention instead of starving against an unbounded hammer
    var committed = Set.empty[String]
    var i = 0
    while (i < 8) {
      val name = s"W.a$i"
      new Catalog(spark, dir).register(Resource(name, "table", "parquet", s"/tmp/a$i"))
      committed += name
      i += 1
      if (p.isAlive) Thread.sleep(250) else i = 8
    }
    val exit = p.waitFor()
    assert(exit === 0, s"foreign writer JVM failed (exit $exit):\n" +
      new String(Files.readAllBytes(log.toPath), "UTF-8").takeRight(4000))
    val fin = keys(dir)
    val expected = committed + "W.seed" + "W.from_b"
    assert(fin === expected,
      s"lost entries: ${expected -- fin}; unexpected: ${fin -- expected}")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ms = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.ptr.*"))
    assert(ms != null && ms.length === 1,
      s"expected one live marker, got ${Option(ms).map(_.length)}")
  }

  test("second JVM commits a newer generation mid-commit (between marker and GC)") {
    // the mid-commit-newer-generation schedule: A's marker exists, so
    // the foreign JVM lists it, merges through it, and commits the
    // NEXT generation — its GC retires A's marker and claim while A is
    // still running; A must stay acknowledged (the foreign base
    // contains A's entry) and A's own GC must not touch the newer
    // generation
    val dir = Files.createTempDirectory("catalog_jvm_gc").toString
    val a = new Catalog(spark, dir)
    a.register(Resource("K.seed", "table", "parquet", "/tmp/seed"))
    var fired = false
    a.onMarkerCreated = _ => if (!fired) {
      fired = true
      foreignRegister(dir, "K.from_b")
    }
    a.register(Resource("K.from_a", "table", "parquet", "/tmp/a"))
    a.onMarkerCreated = _ => ()
    assert(fired, "the race window hook never fired")
    assert(keys(dir) === Set("K.seed", "K.from_a", "K.from_b"),
      "the newer generation from the second JVM must survive the local GC")
    // converged warehouse: exactly one live marker pointing at an
    // existing version, exactly one claim
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ms = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.ptr.*"))
    assert(ms != null && ms.length === 1,
      s"expected one live marker, got ${Option(ms).map(_.length)}")
    val vid = ms.head.getPath.getName.split('.').last
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/resources.v$vid")),
      "the live marker must point at an existing version directory")
    val cs = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/resources.gen.*"))
    assert(cs != null && cs.length === 1,
      s"expected one live claim, got ${Option(cs).map(_.length)}")
  }
}
