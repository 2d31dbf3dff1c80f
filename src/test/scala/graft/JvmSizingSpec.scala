package graft

import scala.jdk.CollectionConverters._

import java.lang.management.ManagementFactory

import org.scalatest.funsuite.AnyFunSuite

/** Guards the forked-JVM sizing contract from DRIFT_r18 §8: a session
  * that plans the whole query suite compiles ~65k nmethods, and the
  * JDK-17 default 240 MB ReservedCodeCacheSize saturates its
  * non-profiled segment mid-suite — compilation stays "enabled" while
  * the flusher evicts hot loops, so one query per run collapses
  * 10-37× to the interpreter and the suite pays ~2× task CPU, with no
  * warning logged anywhere. build.sbt therefore forks every run/test
  * JVM with -XX:ReservedCodeCacheSize=512m; this spec asserts the
  * flag actually REACHED this JVM (asserting on the live memory
  * pools, not the build.sbt text, so a broken env-plumbing path fails
  * too). If it ever fails, restore the flag before trusting any bench
  * numbers taken since it disappeared.
  */
class JvmSizingSpec extends AnyFunSuite {

  test("code cache is sized beyond the JDK default (DRIFT_r18 §8)") {
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
    assert(pools.nonEmpty,
      "expected a segmented code cache (CodeHeap pools) on JDK 17+")
    val totalMaxMb = pools.map(_.getUsage.getMax).sum / (1024L * 1024L)
    // 512m reserved resolves to ~524 MB across the three segments;
    // the JDK default resolves to ~245 MB. Threshold sits between.
    assert(totalMaxMb >= 500L,
      s"code cache max is only ${totalMaxMb} MB — build.sbt's " +
        "-XX:ReservedCodeCacheSize=512m is not reaching forked JVMs; " +
        "suite-context bench CPU is untrustworthy until restored " +
        "(silent flush-churn, DRIFT_r18 §8)")
  }
}
