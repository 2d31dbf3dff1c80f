package graft.catalog

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A filesystem that behaves like a BARE OBJECT STORE for the claim
  * protocol's purposes: `create(overwrite = false)` is HEAD-then-PUT —
  * an existence check, a deliberately wide race window
  * (`fs.mockobj.race.window.ms`, default 100), then an OVERWRITING
  * put. Two concurrent creators both pass the HEAD and the last
  * writer's content wins, exactly the lost-update the catalog's
  * refusal envelope names (`Catalog.requireAtomicClaims`) and the
  * race `ConditionalPutClaim`'s verify schedule must close.
  * Everything else delegates to the local filesystem.
  *
  * Registered per test via
  * `fs.mockobj.impl = graft.catalog.MockObjectStoreFileSystem`;
  * paths look like `mockobj:/tmp/...`.
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "mockobj"

  override def getUri: URI = URI.create("mockobj:///")

  private def raceWindowMs: Long =
    Option(getConf).map(_.getLong("fs.mockobj.race.window.ms", 100L)).getOrElse(100L)

  /** HEAD + window; throws iff the HEAD saw the object. Returns so
    * the caller can issue the unconditional (overwrite) PUT. */
  private def headThenWindow(f: Path): Unit = {
    val existed = exists(f) // HEAD
    // deterministic rendezvous (test-set, same-JVM only): when a
    // barrier is armed, every racer completes its HEAD before any
    // PUT lands — the double-win demonstration no longer depends on
    // the scheduler keeping both threads inside the sleep window
    // (ADVICE r16: a loaded CI box delaying one thread past the
    // window made the second writer legitimately fail)
    val b = MockObjectStoreFileSystem.headBarrier
    if (b != null) {
      try b.await(10, java.util.concurrent.TimeUnit.SECONDS)
      catch { case _: Exception => () } // late/broken: fall through to timing
    }
    Thread.sleep(raceWindowMs) // check-to-write skew
    if (existed)
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
  }

  // BOTH public create overloads emulate: `fs.create(p, false)` — the
  // overload every ClaimBackend actually calls — resolves to
  // RawLocalFileSystem's SIX-arg override, which short-circuits into a
  // private create and never reaches the permission variant (found in
  // r17 by timing the claim path against a 1.5 s window: 4 ms). The
  // r16 spec overrode only the permission variant, so its races ran on
  // the local FS's natural µs-scale exists-check window, not the
  // configured one.
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      headThenWindow(f)
      // PUT: unconditional — last writer wins, like a bare object store
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else {
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      headThenWindow(f)
      super.create(f, permission, true, bufferSize, replication, blockSize, progress)
    } else {
      super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
    }
  }
}

object MockObjectStoreFileSystem {
  /** Armed by a test to synchronize the racers' HEADs (null = off). */
  @volatile var headBarrier: java.util.concurrent.CyclicBarrier = null
}
