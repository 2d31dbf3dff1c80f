package graft.tools

import java.util.concurrent.atomic.AtomicLongArray

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query engine + host metrics for `graft.Bench` — the
  * instrumentation that makes a bench number ADJUDICABLE. The r7 round
  * ended with two mutually-exclusive totals for identical code (369.9 s
  * driver-run vs 136.6 s clean-run) and no recorded evidence to decide
  * whether the engine regressed or the host was contended. These
  * counters answer that in one glance per query:
  *
  *  - task metrics (from a `SparkListener`): executor run/CPU/GC time,
  *    shuffle read+write bytes, memory+disk spill — engine-side facts;
  *  - host samples (from /proc): 1-min loadavg, io-wait fraction over
  *    the query's interval, MemAvailable — environment-side facts.
  *
  * A query whose CPU time matches history but whose wall time tripled
  * alongside io-wait/loadavg spikes is a contended host; a query whose
  * GC or spill bytes grew is an engine problem. Counters are process-
  * global (one bench query runs at a time; the listener bus is drained
  * before every snapshot via `GraftSparkHooks`).
  */
class TaskMetricsListener extends SparkListener {
  // 0 runMs, 1 cpuNs, 2 gcMs, 3 shufReadB, 4 shufWriteB,
  // 5 memSpillB, 6 diskSpillB, 7 resultSerMs, 8 tasks
  private val c = new AtomicLongArray(9)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      c.addAndGet(0, m.executorRunTime)
      c.addAndGet(1, m.executorCpuTime)
      c.addAndGet(2, m.jvmGCTime)
      c.addAndGet(3, m.shuffleReadMetrics.totalBytesRead)
      c.addAndGet(4, m.shuffleWriteMetrics.bytesWritten)
      c.addAndGet(5, m.memoryBytesSpilled)
      c.addAndGet(6, m.diskBytesSpilled)
      c.addAndGet(7, m.resultSerializationTime)
      c.addAndGet(8, 1L)
    }
  }

  /** Read-and-zero: returns the since-last-snapshot sums, keyed for
    * direct JSON emission. Call only after draining the listener bus.
    */
  def snapshotAndReset(): Seq[(String, Long)] = {
    val names = Seq("task_run_ms", "task_cpu_ms", "gc_ms", "shuf_read_b",
      "shuf_write_b", "spill_mem_b", "spill_disk_b", "result_ser_ms", "tasks")
    names.zipWithIndex.map { case (n, i) =>
      val v = c.getAndSet(i, 0L)
      n -> (if (n == "task_cpu_ms") v / 1000000L else v)
    }
  }
}

/** /proc readers + a direct disk-throughput probe. All best-effort:
  * any read failure yields -1 rather than aborting the bench.
  */
object HostStats {
  private def readFile(p: String): Option[String] =
    try Some(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8"))
    catch { case _: Throwable => None }

  /** 1-minute load average. */
  def load1(): Double =
    readFile("/proc/loadavg").flatMap(_.split("\\s+").headOption)
      .flatMap(_.toDoubleOption).getOrElse(-1.0)

  /** MemAvailable in MiB. */
  def memAvailMb(): Long =
    readFile("/proc/meminfo").flatMap(_.linesIterator
        .find(_.startsWith("MemAvailable")))
      .flatMap(_.split("\\s+").lift(1)).flatMap(_.toLongOption)
      .map(_ / 1024L).getOrElse(-1L)

  /** (iowait jiffies, total jiffies) from the aggregate cpu line —
    * sample before/after an interval and diff to get the io-wait
    * fraction OF THAT INTERVAL.
    */
  def cpuJiffies(): (Long, Long) =
    readFile("/proc/stat").flatMap(_.linesIterator.find(_.startsWith("cpu ")))
      .map { line =>
        val f = line.split("\\s+").drop(1).flatMap(_.toLongOption)
        (f.lift(4).getOrElse(0L), f.sum)
      }.getOrElse((0L, 0L))

  /** Sequential write throughput (MB/s) at `dir`: 64 MiB in 4 MiB
    * chunks, fsync'd, deleted. Direct evidence for/against the
    * "contended disk" hypothesis — spill, shuffle files, and streaming
    * state commits all pay this rate.
    */
  def writeMbs(dir: String, totalMb: Int = 64): Double = {
    val f = java.nio.file.Paths.get(dir,
      s".graft_iobench_${java.util.UUID.randomUUID}")
    try {
      val buf = java.nio.ByteBuffer.allocate(4 * 1024 * 1024)
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val t0 = System.nanoTime()
      try {
        var written = 0
        while (written < totalMb) {
          buf.clear(); ch.write(buf); written += 4
        }
        ch.force(true)
      } finally ch.close()
      val s = (System.nanoTime() - t0) / 1e9
      if (s > 0) totalMb / s else -1.0
    } catch { case _: Throwable => -1.0 }
    finally { try java.nio.file.Files.deleteIfExists(f) catch { case _: Throwable => () } }
  }
}
