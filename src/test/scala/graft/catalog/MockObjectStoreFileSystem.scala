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

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      val existed = exists(f) // HEAD
      Thread.sleep(raceWindowMs) // check-to-write skew
      if (existed)
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      // PUT: unconditional — last writer wins, like a bare object store
      super.create(f, permission, true, bufferSize, replication, blockSize, progress)
    } else {
      super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
    }
  }
}
