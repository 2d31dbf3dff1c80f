package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named resource: hierarchical dotted name → physical table.
  * The Spark re-expression of worldbase resources (pygr
  * `metabase.py:576-1153`): no pickles — a resource is a format +
  * path + kind, and cross-references are explicit relation entries
  * instead of persistent-ID pickle hooks (`metabase.py:181-220`).
  * `format="ref"` IS the persistent-ID analog: `path` names another
  * registered resource and resolution follows the chain (the
  * reference unpickles nested resource references the same way).
  */
case class Resource(name: String, kind: String, format: String, path: String)

/** A schema relation binding two resources (pygr's worldbase schema,
  * `metabase.py:1502-1617`): `kind` ∈ one-to-one / one-to-many /
  * many-to-many; resolves to a join spec. Many-to-many relations
  * carry an EDGE resource (`ManyToManyRelation`'s edge database,
  * `metabase.py:1577-1617`): `edge` names the resource whose
  * (`edgeSrcCol`, `edgeDstCol`) rows connect src to dst, and any
  * extra columns on it are the edge data.
  */
case class Relation(name: String, src: String, srcCol: String,
                    dst: String, dstCol: String, kind: String,
                    edge: String = "", edgeSrcCol: String = "",
                    edgeDstCol: String = "")

/** Metadata catalog persisted as PARQUET TABLES under a warehouse
  * directory (the shelve/MySQL shared-zone metabase analog,
  * `metabase.py:899-947`): `dir` may be any Hadoop filesystem path —
  * `hdfs://…`, `s3a://…`, a mounted warehouse — so the catalog
  * survives driver loss and every session of the cluster resolves the
  * same names. Metadata is tiny (one row per resource/relation); the
  * DATA stays wherever the resource paths point.
  *
  * Durability is a GENERATION-MARKER POINTER protocol (the worldbase
  * `commit()` model, `metabase.py:1040-1075`, without its in-place
  * overwrite): each committed table is an immutable version directory
  * `<table>.v<id>`, and an empty marker file `<table>.ptr.<gen>.<id>`
  * IS the pointer — the filename carries the generation number and
  * the version id, so a marker is meaningful the instant it exists
  * (no partial-content reads, no rename-with-overwrite primitive
  * needed on any filesystem). Readers list the markers and follow the
  * maximum (gen, id); writers stage the new version directory FIRST,
  * then create the next-generation marker, then garbage-collect
  * superseded markers and their version directories. The live table
  * is therefore never absent mid-write: until the new marker exists
  * the old one still points at an intact version, and a superseded
  * version is deleted only after its marker. A writer that crashes
  * mid-commit leaves at worst an unreferenced version directory —
  * invisible to readers, never a lost catalog.
  *
  * Concurrency: each write RE-READS the live table and merges it with
  * the instance's pending entry before committing, so two writers
  * registering DIFFERENT names both survive (entry-level
  * last-writer-wins, the shared-zone metabase behavior of
  * `metabase.py:899-947`). Same-process writers are fully serialized
  * by a per-table lock. Cross-process writers race for an ATOMIC
  * GENERATION CLAIM: before creating its marker, a writer must
  * create `<table>.gen.<gen>` put-if-absent (a hard link on local
  * filesystems — content-atomic; `create(overwrite = false)` on HDFS,
  * where the namenode makes it atomic), and the generation it claims
  * is its MERGE BASE's successor — the claim is a compare-and-swap,
  * so a commit landing anywhere between a writer's read and its
  * commit makes the claim fail (or trips the recycled-claim guard)
  * and the writer re-merges. Exactly one writer per generation can
  * succeed, two markers for one generation cannot exist, and a
  * commit, once acknowledged, is in every later writer's base. Two
  * regressions pin the holes this closed (each lost an ACKNOWLEDGED
  * foreign commit): the pre-claim marker tie-break when a foreign
  * commit completed inside the local staging window (CatalogSpec
  * "stage window"), and the decoupled-generation commit that claimed
  * the foreign successor with a pre-foreign base ("stale base"). The claim's content is
  * the version id: a writer that dies between claim and marker is
  * published on its behalf by the next writer (the staged version is
  * complete before the claim by construction); a claim that stays
  * CONTENT-LESS past a timeout (impossible on link-atomic
  * filesystems) is an unacknowledged corpse and is deleted. GC
  * touches only generations STRICTLY OLDER than the writer's own, and
  * a writer whose claim was swept by a newer generation's GC is
  * acknowledged iff that newer marker exists (its base then contains
  * this commit, because a gen g+1 claimant has, by construction,
  * listed the unique gen-g marker). The envelope is ENFORCED, not just
  * documented: filesystems with neither atomic link nor atomic
  * create-no-overwrite (bare object stores without conditional puts)
  * would fall back to last-writer-wins on the claim itself, so a write
  * through a scheme outside the proven set (file/hdfs/viewfs) fails
  * fast with a named error — unless the scheme has a claim backend.
  * The claim primitive is pluggable per scheme ([[ClaimBackend]]):
  * object stores with CONDITIONAL PUTS (S3 `If-None-Match`, GCS
  * `if-generation-match`, Azure etags) are supported by declaring
  * `spark.graft.catalog.conditionalPutSchemes=<scheme>` — the claim
  * then runs create-no-overwrite + read-back verify + settle re-check
  * ([[ConditionalPutClaim]], envelope in its doc) — or by registering
  * a store-native backend via `Catalog.registerClaimBackend`. The
  * blanket `spark.graft.catalog.acceptNonAtomicClaims=true` bypass
  * remains for stores the user vouches for. Reads are cached per Catalog
  * instance and refreshed by writes; construct a fresh Catalog (or
  * call `refresh()`) to observe another writer's updates. All
  * writers of one warehouse must speak this protocol version (a
  * pre-claim binary racing a claim-aware one reintroduces the tie).
  *
  * Pre-pointer warehouses (a plain `<table>` directory, possibly with
  * the old protocol's crash debris `<table>.bak`) are read as
  * generation 0 and migrated to the marker layout by the next write.
  */
object Catalog {
  /** One lock per table path: same-process writers serialize the whole
    * read-merge-commit sequence here (else two merges from the same
    * base lose an entry — the classic lost update). The key is the
    * NORMALIZED path: two instances built with `wh` vs `wh/` must
    * share a lock. Cross-process concurrency is handled by the
    * generation protocol (see class doc). */
  private val swapLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[catalog] def lockFor(path: String): Object =
    swapLocks.computeIfAbsent(new Path(path).toUri.toString, _ => new Object)

  /** Schemes whose put-if-absent primitive is PROVEN atomic for the
    * generation claim: local filesystems use link(2) (content-atomic),
    * HDFS-family `create(overwrite=false)` is namenode-atomic. Every
    * other scheme must opt in (see the class-doc envelope). */
  private[catalog] val AtomicClaimSchemes = Set("file", "hdfs", "viewfs")

  /** Per-scheme claim backends beyond the built-ins (VERDICT r15 #2):
    * registering a [[ClaimBackend]] for a scheme turns the
    * non-atomic-claim refusal into support — the registrant asserts
    * the backend's put-if-absent really is exclusive on that store
    * (see the `ClaimBackend` contract). Conf alternative for the
    * common conditional-put case:
    * `spark.graft.catalog.conditionalPutSchemes=s3a,gs` claims those
    * schemes with [[ConditionalPutClaim]] (create-no-overwrite +
    * read-back verify + settle re-check;
    * `spark.graft.catalog.conditionalPutSettleMs` tunes the settle,
    * default 250). Registration is process-wide: every writer JVM of
    * a shared warehouse must register the same backend (or carry the
    * same conf), exactly as all writers must speak the same protocol
    * version. A registered backend whose claim content is not
    * DEFINITIVE the moment putIfAbsent returns (anything with a
    * post-create verify horizon, like ConditionalPutClaim's settle)
    * must be paired with raising `publishBehalfAfterMs` past that
    * horizon — the behalf-publish path reads the claim content and
    * must never act on a value a contender could still overwrite
    * (conf-declared conditional-put schemes get this floor
    * automatically in `awaitClaimWinner`). */
  private val claimBackends =
    new java.util.concurrent.ConcurrentHashMap[String, ClaimBackend]()
  def registerClaimBackend(scheme: String, backend: ClaimBackend): Unit =
    claimBackends.put(scheme, backend)
  def unregisterClaimBackend(scheme: String): Unit =
    claimBackends.remove(scheme)
  private[catalog] def registeredClaimBackend(scheme: String): Option[ClaimBackend] =
    Option(claimBackends.get(scheme))
}

class Catalog(spark: SparkSession, dir: String) {
  private val resPath = s"$dir/resources"
  private val relPath = s"$dir/relations"

  @volatile private var resCache: Map[String, Resource] = _
  @volatile private var relCache: Map[String, Relation] = _
  // generation each cache snapshot was read from (0 = empty/legacy):
  // the commit claims ITS successor, coupling base to generation
  @volatile private var resBaseGen: Long = 0L
  @volatile private var relBaseGen: Long = 0L

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A parsed `<table>.ptr.<gen>.<id>` marker filename. Ordering is
    * (generation, id): generations advance per commit; the id breaks
    * a same-generation cross-process tie deterministically. */
  private[catalog] case class Marker(gen: Long, id: String)
  private implicit val markerOrd: Ordering[Marker] =
    Ordering.by(m => (m.gen, m.id))

  private def versionDir(path: String, id: String) = s"$path.v$id"

  private def markersOf(path: String): Seq[Marker] = {
    val p = new Path(path)
    val sts =
      try fsFor(p).globStatus(new Path(path + ".ptr.*"))
      catch { case _: java.io.FileNotFoundException => null }
    if (sts == null) Seq.empty
    else sts.toSeq.flatMap { st =>
      val rest = st.getPath.getName.stripPrefix(p.getName + ".ptr.")
      val dot = rest.indexOf('.')
      if (dot <= 0) None
      else scala.util.Try(Marker(rest.take(dot).toLong, rest.drop(dot + 1)))
        .toOption
    }
  }

  /** Read the live version of a catalog table through `read`, or None
    * when the table has never been written. Retries when a concurrent
    * writer garbage-collects the version we resolved between the
    * marker listing and the parquet read — the re-list finds the
    * writer's newer marker, so readers NEVER observe a missing table
    * and never sleep waiting for one (a crashed writer leaves the old
    * marker + version intact; only a COMMITTED new version retires
    * them). Falls back to the pre-pointer layout — the plain table
    * dir, healing the old protocol's crashed-swap state (live dir
    * missing, `.bak` present) by restoring the backup. */
  private def readLive[A](path: String)(read: String => A): (Long, Option[A]) = {
    var last: Exception = null
    for (attempt <- 1 to 6) {
      markersOf(path).sorted.lastOption match {
        case Some(m) =>
          try return (m.gen, Some(read(versionDir(path, m.id))))
          catch { case e: Exception => last = e } // GC race: re-list, retry
        case None =>
          val p = new Path(path)
          val fs = fsFor(p)
          if (fs.exists(p)) return (0L, Some(read(path)))
          val bak = new Path(path + ".bak")
          if (!fs.exists(bak)) return (0L, None)
          if (!fs.rename(bak, p) && !fs.exists(p))
            throw new java.io.IOException(
              s"catalog recovery: could not restore $bak to $p")
          return (0L, Some(read(path)))
      }
    }
    throw new java.io.IOException(
      s"catalog read($path): live version swapped out 6 times", last)
  }

  /** Commit `df` as generation `baseGen + 1` of `path` — the
    * generation is COUPLED to the base the caller merged from, so a
    * foreign commit landing between the caller's read and this commit
    * makes the claim fail (the foreign writer claimed that generation
    * first, or the recycled-claim guard sees its marker) and the
    * caller re-merges: the classic compare-and-swap, with the claim
    * file as the CAS. On success, garbage-collect superseded markers
    * and claims immediately (new readers re-route) but superseded
    * VERSION directories only past a grace age — a reader that
    * already resolved an old marker finishes its scan on the intact
    * immutable directory instead of retrying through the flip (under
    * rapid-fire commits the retry loop could starve; versions are
    * KB-scale, so the lingering copies are free). Metadata is one
    * coalesced file, not a shuffle.
    * @return true when this writer's table is live or provably carried
    *         by a newer generation; false = lost the race, retry the
    *         merge+commit. */
  private def swapWrite(df: DataFrame, path: String, baseGen: Long): Boolean =
    Catalog.lockFor(path).synchronized { swapWriteLocked(df, path, baseGen) }

  /** Grace age for superseded version directories (see swapWrite).
    * Tunable for tests; production default 10 min. */
  private[catalog] var versionGraceMs: Long = 600000L

  /** Test seams: fired inside `swapWriteLocked` so a spec can play a
    * CROSS-PROCESS writer (raw FS ops or a second JVM, bypassing the
    * per-JVM lock) in the race windows the protocol must survive —
    * after staging but before the claim (a foreign commit completing
    * entirely in that window), between claim and marker, and between
    * marker creation and GC (a newer generation landing mid-commit).
    * No-ops in production. */
  private[catalog] var onStaged: Marker => Unit = _ => ()
  private[catalog] var onClaimed: Marker => Unit = _ => ()
  private[catalog] var onMarkerCreated: Marker => Unit = _ => ()
  /** Fired in register/addRelation AFTER the live table was read and
    * merged but BEFORE the commit — the stale-base window: a foreign
    * commit landing here must force this writer to re-merge, or its
    * table (merged from the pre-foreign base) silently drops the
    * foreign entry. */
  private[catalog] var onBeforeCommit: () => Unit = () => ()

  /** Tunable waits for the claim-failure path (tests shrink them).
    * Production: lose-and-wait spans the winner's claim→marker window
    * (milliseconds when alive), so the defaults are generous. */
  private[catalog] var awaitPtrMs: Long = 10000L
  private[catalog] var publishBehalfAfterMs: Long = 1000L

  private def claimPath(path: String, gen: Long) = new Path(s"$path.gen.$gen")

  /** Atomic put-if-absent of the generation claim, content = version
    * id, delegated to the scheme's [[ClaimBackend]]: hard-link on
    * local filesystems (content-atomic), `create(overwrite = false)`
    * on HDFS-family (namenode-atomic), [[ConditionalPutClaim]] on
    * schemes the user declared conditional-put-capable, and any
    * backend registered via `Catalog.registerClaimBackend`. Returns
    * false when the generation is already claimed. */
  private def claimGeneration(path: String, gen: Long, id: String): Boolean = {
    val fs = fsFor(new Path(path))
    val p = fs.makeQualified(claimPath(path, gen))
    claimBackendFor(Option(p.toUri.getScheme).getOrElse("file"))
      .putIfAbsent(fs, p, id.getBytes("UTF-8"))
  }

  private def conditionalPutSchemes: Set[String] =
    spark.conf.get("spark.graft.catalog.conditionalPutSchemes", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

  private def claimBackendFor(scheme: String): ClaimBackend =
    Catalog.registeredClaimBackend(scheme).getOrElse {
      if (scheme == "file") HardLinkClaim
      else if (conditionalPutSchemes.contains(scheme))
        new ConditionalPutClaim(
          spark.conf.get("spark.graft.catalog.conditionalPutSettleMs", "250").toLong)
      else AtomicCreateClaim
    }

  /** The claim's content (winner's version id), None when the claim
    * file is absent or not yet readable. */
  private def readClaim(path: String, gen: Long): Option[String] = {
    val fs = fsFor(new Path(path))
    try {
      val in = fs.open(claimPath(path, gen))
      try {
        // read to EOF, not one read(): a short read is legal per the
        // InputStream contract (and real on HDFS/remote FS) — a
        // truncated id here would make the behalf-publish path create
        // a max-generation marker pointing at a nonexistent version
        val buf = new Array[Byte](64)
        var off = 0
        var n = in.read(buf, off, buf.length - off)
        while (n > 0 && off + n < buf.length) { off += n; n = in.read(buf, off, buf.length - off) }
        if (n > 0) off += n
        Some(new String(buf, 0, off, "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }
  }

  /** Horizon after which a claim's CONTENT is definitive for `path`'s
    * scheme: 2x the declared settle window on a conditional-put
    * scheme (the [[ConditionalPutClaim]] envelope — every competing
    * PUT on a lying HEAD-then-PUT store lands within the first PUT's
    * window), 0 for hard-link/HDFS-family claims, whose content is
    * definitive at creation. */
  private def claimSettleFloorMs(path: String): Long = {
    val scheme = Option(fsFor(new Path(path)).makeQualified(new Path(path))
      .toUri.getScheme).getOrElse("file")
    if (conditionalPutSchemes.contains(scheme))
      2 * spark.conf.get("spark.graft.catalog.conditionalPutSettleMs", "250").toLong
    else 0L
  }

  /** After losing the claim on `gen`: wait until the winner's commit
    * is READABLE (a marker with generation >= gen), so the caller's
    * re-merge sees the new base instead of burning its retries on the
    * same generation. If the winner stalls between claim and marker,
    * publish the marker ON ITS BEHALF from the claim content (its
    * version directory is complete before the claim by construction).
    * A claim that stays content-less past the deadline cannot be an
    * acknowledged commit (content is written before any success
    * return) — delete the corpse so the retry can re-claim. */
  private def awaitClaimWinner(path: String, gen: Long): Unit = {
    val fs = fsFor(new Path(path))
    // on a conditional-put scheme the claim CONTENT is definitive only
    // after the settle horizon (a contender that passed its first
    // read-back can still lose its settle re-check and back out,
    // deleting its version): behalf-publishing from content read
    // before that horizon could mint a max-generation marker pointing
    // at a version its owner is about to delete — a bricked table. So
    // the behalf wait is floored at 2x the declared settle (>= window
    // + margin by the ConditionalPutClaim envelope); link/HDFS claims
    // are definitive at creation and keep the fast path.
    val behalfFloorMs = claimSettleFloorMs(path)
    val deadline = System.nanoTime() + awaitPtrMs * 1000000L
    val behalfAt = System.nanoTime() +
      math.max(publishBehalfAfterMs, behalfFloorMs) * 1000000L
    while (System.nanoTime() < deadline) {
      if (markersOf(path).exists(_.gen >= gen)) return
      readClaim(path, gen) match {
        case None => return // claim vanished: winner committed and was GC'd, or corpse swept
        case Some(id) if id.nonEmpty && System.nanoTime() >= behalfAt
            && fs.exists(new Path(versionDir(path, id))) =>
          // stalled winner: its staged version is complete — publish
          // it. The exists() guard keeps a truncated/garbled claim id
          // (possible mid-write on filesystems where content visibility
          // lags the create) from minting a max-generation marker that
          // points at nothing and bricks every read; a garbled id keeps
          // polling and resolves via the winner's own marker or the
          // corpse deadline.
          try fs.create(new Path(s"$path.ptr.$gen.$id"), false).close()
          catch { case _: java.io.IOException => () } // it woke up first: fine
          return
        case _ => Thread.sleep(20)
      }
    }
    // content-less past the deadline: unacknowledged corpse
    fs.delete(claimPath(path, gen), false)
  }

  /** Refuse to write through a filesystem whose claim primitive is not
    * proven atomic (class-doc envelope): on a bare object store,
    * `create(overwrite=false)` is HEAD-then-PUT — last-writer-wins on
    * the claim itself, silently reintroducing the lost-update races the
    * protocol exists to close. Fail fast with a named error instead of
    * degrading; `spark.graft.catalog.acceptNonAtomicClaims=true` opts
    * in for stores known to provide conditional puts. */
  private def requireAtomicClaims(path: String): Unit = {
    val qualified = fsFor(new Path(path)).makeQualified(new Path(path))
    val scheme = Option(qualified.toUri.getScheme).getOrElse("file")
    if (!Catalog.AtomicClaimSchemes.contains(scheme) &&
        Catalog.registeredClaimBackend(scheme).isEmpty &&
        !conditionalPutSchemes.contains(scheme) &&
        spark.conf.get("spark.graft.catalog.acceptNonAtomicClaims", "false") != "true")
      throw new UnsupportedOperationException(
        s"catalog warehouse scheme '$scheme://' ($qualified) has no proven " +
        "atomic put-if-absent for the generation claim: concurrent writers " +
        "would race last-writer-wins and could silently drop acknowledged " +
        "commits. Use a local/HDFS warehouse, front the catalog with a " +
        "transactional table format, declare the store conditional-put-" +
        "capable (spark.graft.catalog.conditionalPutSchemes=" + scheme +
        " — S3 If-None-Match / GCS if-generation-match class stores), " +
        "register a ClaimBackend for the scheme, or set " +
        "spark.graft.catalog.acceptNonAtomicClaims=true to bypass the check.")
  }

  /** True iff the claim on `gen` is POSITIVELY not ours: readable
    * with a foreign id, or absent. An unreadable-but-present claim
    * returns false — it might carry our id, and the callers use this
    * to decide whether deleting our staged version dir is safe
    * (deleting a dir a behalf-publisher is about to reference bricks
    * the generation; keeping an unreferenced orphan merely waits for
    * the aged sweep). */
  private def claimPositivelyForeign(path: String, gen: Long, id: String): Boolean =
    try {
      val c = readClaim(path, gen)
      c.exists(_ != id) ||
        (c.isEmpty && !fsFor(new Path(path)).exists(claimPath(path, gen)))
    } catch { case _: Exception => false }

  private def swapWriteLocked(df: DataFrame, path: String, baseGen: Long): Boolean = {
    requireAtomicClaims(path)
    val fs = fsFor(new Path(path))
    // gen is the BASE's successor, not "current max + 1": if anything
    // committed since the caller read its base, this claim must fail
    // so the caller re-merges (CAS semantics — the stale-base window
    // between read-merge and commit is closed here, not by luck)
    val gen = baseGen + 1
    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    df.coalesce(1).write.mode("overwrite").parquet(versionDir(path, id))
    val mine = Marker(gen, id)
    onStaged(mine)
    // the atomic claim decides generation ownership BEFORE any marker
    // exists: two markers for one generation can never be created, so
    // no tie-break ever discards an acknowledged commit.
    // TRANSIENT store faults surface as thrown IOExceptions from the
    // backend (r17 — a fault is NOT a lost race): retry the claim in
    // place a bounded number of times (nothing of ours landed, so the
    // retry races the SAME claim with the same id), and on final
    // failure clean up the staged version before rethrowing — a throw
    // must not leak the orphaned parquet dir the false-branch cleanup
    // handles, UNLESS the claim actually landed with our content: a
    // persisting own-content claim must never outlive its version dir
    // (a peer would behalf-publish a marker at the deleted version —
    // a bricked generation, ADVICE r17), so the cleanup first checks
    // whose claim is there and leaves the dir alone when it is (or
    // might be) ours — an unreferenced orphan ages out through
    // sweepAgedVersions, while a behalf-published marker keeps it
    // referenced and the commit becomes live behind the throw.
    val claimed =
      try {
        var attempt = 0
        var won = false
        var done = false
        while (!done) {
          try { won = claimGeneration(path, gen, id); done = true }
          catch {
            case e: java.io.IOException =>
              attempt += 1
              if (attempt >= 3) throw e
              Thread.sleep(100L * attempt)
          }
        }
        won
      } catch {
        case e: Throwable =>
          if (claimPositivelyForeign(path, gen, id))
            fs.delete(new Path(versionDir(path, id)), true)
          throw e
      }
    if (!claimed) {
      // a false from the retried claim can still be OUR OWN PUT having
      // landed (the close faulted, the read-backs faulted, and the
      // retry then saw AlreadyExists — ADVICE r17's self-corpse). Read
      // the claim: our own id there, stable across the settle horizon
      // (after which content is definitive — claimSettleFloorMs), means
      // we WON the generation; continue through the normal win path so
      // the version dir stays alive for the marker. The r17 code
      // deleted the dir here while the own-content claim persisted,
      // letting a waiting loser behalf-publish a marker at a deleted
      // version — the behalf-publish TOCTOU this branch now closes.
      val ownLanded = readClaim(path, gen).contains(id) && {
        val h = claimSettleFloorMs(path)
        if (h > 0) Thread.sleep(h)
        readClaim(path, gen).contains(id)
      }
      if (!ownLanded) {
        if (markersOf(path).exists(m => m.gen == gen && m.id == id)) {
          // a peer already behalf-published OUR commit: it is live and
          // readable — deleting the version dir now would brick its
          // marker. The commit is acknowledged; GC runs on the next
          // writer.
          onClaimed(mine)
          onMarkerCreated(mine)
          return true
        }
        // discard the stage only when the claim is POSITIVELY not ours
        // (a foreign id, or no claim at all): an unreadable claim might
        // still carry our id, and a soon-referenced dir deleted here is
        // a brick while an unreferenced orphan merely ages out through
        // sweepAgedVersions.
        if (claimPositivelyForeign(path, gen, id))
          fs.delete(new Path(versionDir(path, id)), true)
        awaitClaimWinner(path, gen)
        return false
      }
    }
    onClaimed(mine)
    // recycled-claim guard: the claim file of a LONG-superseded
    // generation is deleted by GC, so a writer whose base is several
    // generations stale can re-create it and "win" a generation that
    // already has (or had) a marker — any FOREIGN marker at or past our
    // gen means exactly that: release the claim and re-merge. A marker
    // with our own (gen, id) is NOT foreign — it is this very commit,
    // behalf-published by a claim-losing peer while we stalled — so it
    // must not trigger the backout (which would delete our own live
    // version out from under the marker).
    if (markersOf(path).exists(m => m.gen >= gen && m.id != id)) {
      fs.delete(claimPath(path, gen), false)
      // disclaim COMPLETELY (r18): a peer may have behalf-published our
      // (gen, id) marker while we stalled — deleting the version but
      // leaving that marker would dangle it at nothing. The commit was
      // never acknowledged to our caller (we return false and re-merge),
      // so marker, version, and claim all go; a reader mid-resolve on
      // the doomed marker retries through readLive's poll.
      fs.delete(new Path(s"$path.ptr.$gen.$id"), false)
      fs.delete(new Path(versionDir(path, id)), true)
      return false
    }
    // the marker may ALREADY exist: a claim-losing peer behalf-publishes
    // after publishBehalfAfterMs, so a winner that stalls >1 s between
    // claim and marker (GC pause, slow globStatus) finds its own
    // (gen, id) marker pre-created — that IS this commit, acknowledged;
    // treat it as success rather than throwing out of register/
    // addRelation and skipping GC/cache update
    try fs.create(new Path(s"$path.ptr.$gen.$id"), false).close()
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
      case _: java.nio.file.FileAlreadyExistsException => ()
      case _: java.io.IOException
        if fs.exists(new Path(s"$path.ptr.$gen.$id")) => ()
    }
    onMarkerCreated(mine)
    // acknowledgement check: our claim may have been swept while we
    // ran — by a NEWER generation's GC (then that writer resolved its
    // base through our unique gen marker — base coupling — so our
    // commit is in its base: acknowledged), or by the corpse recovery
    // of a writer that timed us out (then nothing carries our data:
    // back out and retry)
    if (!readClaim(path, gen).contains(id) &&
        !markersOf(path).exists(_.gen > gen)) {
      fs.delete(new Path(s"$path.ptr.$gen.$id"), false)
      fs.delete(new Path(versionDir(path, id)), true)
      return false
    }
    // GC strictly OLDER generations only — never one at or above ours:
    // a writer that claimed a later generation while we ran owns the
    // live table now, and ITS GC retires us. Markers and claims go
    // immediately (new readers re-route through ours); superseded
    // VERSION directories are swept only past the grace age, so a
    // reader mid-scan on a just-retired version finishes on the
    // intact immutable directory instead of retrying through every
    // flip (starvation under rapid-fire commits).
    markersOf(path).filter(m => markerOrd.lt(m, mine)).foreach { m =>
      fs.delete(new Path(s"$path.ptr.${m.gen}.${m.id}"), false)
      fs.delete(claimPath(path, m.gen), false)
    }
    sweepAgedVersions(path, fs, keepId = id)
    // pre-pointer layout (plain dir + old-protocol debris), now migrated
    Seq(path, path + ".bak", path + ".tmp")
      .foreach(s => fs.delete(new Path(s), true))
    true
  }

  /** Delete version directories that are (a) referenced by no marker —
    * superseded, or a crashed writer's orphan stage — and (b) older
    * than the grace age. Age protects both a mid-scan reader of a
    * just-superseded version and a LIVE writer's staged-but-unclaimed
    * directory (seconds old, far under any sane grace). */
  private def sweepAgedVersions(path: String,
      fs: org.apache.hadoop.fs.FileSystem, keepId: String): Unit = {
    val referenced = markersOf(path).map(_.id).toSet + keepId
    val sts =
      try fs.globStatus(new Path(path + ".v*"))
      catch { case _: java.io.FileNotFoundException => null }
    if (sts == null) return
    val cutoff = System.currentTimeMillis() - versionGraceMs
    val prefix = new Path(path).getName + ".v"
    sts.foreach { st =>
      val vid = st.getPath.getName.stripPrefix(prefix)
      if (!referenced.contains(vid) && st.getModificationTime < cutoff)
        fs.delete(st.getPath, true)
    }
  }

  /** Drop the instance cache: next read reloads from the warehouse. */
  def refresh(): Unit = { resCache = null; relCache = null }

  def resources: Map[String, Resource] = {
    if (resCache == null) {
      import spark.implicits._
      val (g, m) = readLive(resPath) { p =>
        spark.read.parquet(p).as[Resource].collect().map(r => r.name -> r).toMap
      }
      resBaseGen = g
      resCache = m.getOrElse(Map.empty)
    }
    resCache
  }

  def relations: Map[String, Relation] = {
    if (relCache == null) {
      import spark.implicits._
      val (g, m) = readLive(relPath) { p =>
        spark.read.parquet(p).as[Relation].collect().map(r => r.name -> r).toMap
      }
      relBaseGen = g
      relCache = m.getOrElse(Map.empty)
    }
    relCache
  }

  /** Register (or replace) a resource; names are hierarchical dotted
    * paths like `Bio.Seq.Genome.HUMAN.hg18` (`metabase.py:1395+`).
    */
  // the read-merge-commit sequence must be atomic against same-process
  // writers; synchronized is reentrant with swapWrite's lock
  // lost races back off with jitter before re-merging: under a
  // rapid-fire foreign writer, immediate retries re-stage into the
  // same collision window and can starve out all attempts
  private def raceBackoff(attempt: Int): Unit =
    if (attempt > 1)
      Thread.sleep(50L * attempt +
        java.util.concurrent.ThreadLocalRandom.current().nextLong(150L))

  def register(r: Resource): Unit = Catalog.lockFor(resPath).synchronized {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (attempts > 8) throw new java.io.IOException(
        s"catalog register($resPath): lost the commit race 8 times; giving up")
      raceBackoff(attempts)
      resCache = null // merge against the LIVE table, not a stale cache
      val rows = resources + (r.name -> r)
      if (rows == resCache) { done = true } // already live verbatim: nothing to commit
      else {
        onBeforeCommit()
        done = swapWrite(
          spark.createDataFrame(rows.values.toSeq.sortBy(_.name)), resPath,
          resBaseGen)
        if (done) { resCache = rows; resBaseGen += 1 }
      }
    }
  }

  def addRelation(rel: Relation): Unit = Catalog.lockFor(relPath).synchronized {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (attempts > 8) throw new java.io.IOException(
        s"catalog addRelation($relPath): lost the commit race 8 times; giving up")
      raceBackoff(attempts)
      relCache = null
      val rows = relations + (rel.name -> rel)
      if (rows == relCache) { done = true }
      else {
        onBeforeCommit()
        done = swapWrite(
          spark.createDataFrame(rows.values.toSeq.sortBy(_.name)), relPath,
          relBaseGen)
        if (done) { relCache = rows; relBaseGen += 1 }
      }
    }
  }

  /** worldbase.Bio.X.Y → DataFrame. `ref` resources resolve
    * recursively through the chain of names (persistent-ID
    * resolution, `metabase.py:181-220`), cycle-checked.
    */
  def resolve(spark: SparkSession, name: String): DataFrame = {
    def go(n: String, seen: Set[String]): DataFrame = {
      require(!seen.contains(n),
        s"resource reference cycle: ${(seen.toSeq :+ n).mkString(" -> ")}")
      val r = resources.getOrElse(n,
        throw new NoSuchElementException(s"no resource '$n' in catalog $dir"))
      r.format match {
        case "parquet" => spark.read.parquet(r.path)
        case "csv" => spark.read.option("header", "true").csv(r.path)
        case "ref" => go(r.path, seen + n)
        case other => throw new IllegalArgumentException(s"unknown format $other")
      }
    }
    go(name, Set.empty)
  }

  /** Resolve a relation to the joined DataFrame (the descriptor-
    * binding analog of `metabase.py:791-824`, as an explicit join).
    * Many-to-many relations route through their edge resource:
    * src ⋈ edge ⋈ dst, edge data columns carried along — Catalyst
    * broadcasts the dimension sides on its own when they are small.
    */
  def bind(spark: SparkSession, relName: String): DataFrame =
    bindRel(spark, relations.getOrElse(relName,
      throw new NoSuchElementException(s"no relation '$relName' in catalog $dir")))

  /** The auto-generated INVERSE view of a relation — the reference
    * binds `invAttr` on the target automatically for one/many-to-many
    * schema bindings (`metabase.py:1502-1617`); here the inverse is a
    * relation with src/dst (and edge endpoint columns) swapped.
    */
  def bindInverse(spark: SparkSession, relName: String): DataFrame = {
    val rel = relations.getOrElse(relName,
      throw new NoSuchElementException(s"no relation '$relName' in catalog $dir"))
    bindRel(spark, rel.copy(
      src = rel.dst, srcCol = rel.dstCol, dst = rel.src, dstCol = rel.srcCol,
      edgeSrcCol = rel.edgeDstCol, edgeDstCol = rel.edgeSrcCol,
      kind = rel.kind match {
        case "one-to-many" => "many-to-one"
        case "many-to-one" => "one-to-many"
        case k => k
      }))
  }

  private def bindRel(spark: SparkSession, rel: Relation): DataFrame = {
    val s = resolve(spark, rel.src)
    val d = resolve(spark, rel.dst)
    if (rel.kind == "many-to-many") {
      require(rel.edge.nonEmpty,
        s"many-to-many relation '${rel.name}' needs an edge resource")
      val e = resolve(spark, rel.edge)
      s.join(e, s(rel.srcCol) === e(rel.edgeSrcCol))
        .join(d, e(rel.edgeDstCol) === d(rel.dstCol))
    } else {
      s.join(d, s(rel.srcCol) === d(rel.dstCol),
        if (rel.kind == "one-to-one") "inner" else "left")
    }
  }

  /** Subtree listing, like iterating a worldbase namespace level. */
  def ls(prefix: String): Seq[String] =
    resources.keys.filter(n => n == prefix || n.startsWith(prefix + ".")).toSeq.sorted
}
