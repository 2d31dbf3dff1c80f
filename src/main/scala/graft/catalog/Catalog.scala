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
  * Writes are read-modify-swap: the new table lands in a temp dir,
  * the live table is moved aside to `.bak`, the temp is renamed in,
  * and the backup is dropped — every rename result is checked, so a
  * failure at any step leaves either the previous catalog live or a
  * `.bak` that reads recover from automatically; there is no window
  * where the catalog is silently gone (the worldbase `commit()`
  * model, `metabase.py:1040-1075`).
  *
  * Concurrency: each write RE-READS the on-disk table and merges it
  * with the instance's pending entry before swapping, so two writers
  * registering DIFFERENT names both survive (entry-level
  * last-writer-wins, the shared-zone metabase behavior of
  * `metabase.py:899-947`). Two drivers racing the swap of the SAME
  * table within the same instant resolve to whichever rename lands
  * last — whole-table last-writer-wins, at worst losing the slower
  * writer's single entry, never corrupting the table (HDFS/posix
  * rename is atomic). A deployment needing stricter guarantees should
  * front the catalog with a transactional table format. Reads are
  * cached per Catalog instance and refreshed by writes; construct a
  * fresh Catalog (or call `refresh()`) to observe another writer's
  * updates.
  */
object Catalog {
  /** One lock per table path: swaps STAGE through a shared `.tmp`, so two
    * same-process writers must not interleave the write+rename sequence
    * (they would clobber each other's staging dir mid-write). In-process
    * writers are fully serialized here; cross-process concurrency remains
    * best-effort via the rename protocol (see class doc). */
  private val swapLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[catalog] def lockFor(path: String): Object =
    swapLocks.computeIfAbsent(path, _ => new Object)
}

class Catalog(spark: SparkSession, dir: String) {
  private val resPath = s"$dir/resources"
  private val relPath = s"$dir/relations"

  @volatile private var resCache: Map[String, Resource] = _
  @volatile private var relCache: Map[String, Relation] = _

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True when the table is readable, first healing a crashed swap:
    * a missing live dir with a `.bak` present means a writer died
    * between the two renames — restore the backup. But that same
    * on-disk state is also what a LIVE writer looks like between its
    * rename(dst→bak) and rename(tmp→dst); healing then would
    * re-install the old table under the writer's feet. A live writer
    * has its `.tmp` present for that whole window, so heal only when
    * no `.tmp` exists; with a `.tmp`, wait a beat for the in-flight
    * swap to land and report the then-current state (cross-process
    * concurrency is best-effort — see the class doc). */
  private def exists(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsFor(p)
    if (!fs.exists(p)) {
      val bak = new Path(path + ".bak")
      val tmp = new Path(path + ".tmp")
      if (fs.exists(bak)) {
        if (fs.exists(tmp)) { Thread.sleep(100); return fs.exists(p) }
        if (!fs.rename(bak, p) && !fs.exists(p))
          throw new java.io.IOException(
            s"catalog recovery: could not restore $bak to $p")
      }
    }
    fs.exists(p)
  }

  /** Temp → aside → swap, every rename checked: write the new table
    * to `.tmp`, move the live table to `.bak`, rename `.tmp` in, drop
    * `.bak`. A false rename either throws (restoring the backup when
    * the forward swap genuinely failed) or returns false when the
    * failure is explained by a CONCURRENT writer's swap landing in
    * our window — the caller re-reads, re-merges, and retries, so no
    * failure mode leaves the catalog absent while the caller sees
    * success. A `.bak` found with the live table MISSING is a crashed
    * swap's only copy: restored, never deleted. Metadata is one
    * coalesced file, not a shuffle.
    * @return true when this writer's table is live; false = lost a
    *         race, retry the merge+swap. */
  private def swapWrite(df: DataFrame, path: String): Boolean =
    Catalog.lockFor(path).synchronized { swapWriteLocked(df, path) }

  private def swapWriteLocked(df: DataFrame, path: String): Boolean = {
    val tmp = new Path(path + ".tmp")
    val dst = new Path(path)
    val bak = new Path(path + ".bak")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val fs = fsFor(dst)
    if (fs.exists(bak)) {
      if (fs.exists(dst)) fs.delete(bak, true) // leftover post-swap debris
      else if (!fs.rename(bak, dst) && !fs.exists(dst))
        throw new java.io.IOException(
          s"catalog recovery: could not restore $bak to $dst")
    }
    val hadOld = fs.exists(dst)
    if (hadOld && !fs.rename(dst, bak)) {
      // a concurrent writer moved the live table aside in our window
      fs.delete(tmp, true)
      return false
    }
    if (!fs.rename(tmp, dst)) {
      if (fs.exists(dst)) {
        // a concurrent writer's forward rename landed first: its table
        // (merged from the same on-disk state) is live — no recovery
        // needed; drop our tmp/bak and let the caller re-merge + retry.
        fs.delete(tmp, true)
        if (hadOld) fs.delete(bak, true)
        return false
      }
      if (hadOld && !fs.rename(bak, dst) && !fs.exists(dst))
        throw new java.io.IOException(
          s"catalog swap: rename $tmp -> $dst failed AND backup restore failed; " +
            s"recover manually from $bak")
      throw new java.io.IOException(
        s"catalog swap: rename $tmp -> $dst failed; previous catalog restored")
    }
    if (hadOld) fs.delete(bak, true)
    true
  }

  /** Drop the instance cache: next read reloads from the warehouse. */
  def refresh(): Unit = { resCache = null; relCache = null }

  def resources: Map[String, Resource] = {
    if (resCache == null)
      resCache =
        if (!exists(resPath)) Map.empty
        else {
          import spark.implicits._
          spark.read.parquet(resPath).as[Resource].collect()
            .map(r => r.name -> r).toMap
        }
    resCache
  }

  def relations: Map[String, Relation] = {
    if (relCache == null)
      relCache =
        if (!exists(relPath)) Map.empty
        else {
          import spark.implicits._
          spark.read.parquet(relPath).as[Relation].collect()
            .map(r => r.name -> r).toMap
        }
    relCache
  }

  /** Register (or replace) a resource; names are hierarchical dotted
    * paths like `Bio.Seq.Genome.HUMAN.hg18` (`metabase.py:1395+`).
    */
  // the read-merge-swap sequence must be atomic against same-process
  // writers (else two merges from the same base lose one entry — the
  // classic lost update); synchronized is reentrant with swapWrite's lock
  def register(r: Resource): Unit = Catalog.lockFor(resPath).synchronized {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (attempts > 5) throw new java.io.IOException(
        s"catalog register($resPath): lost the swap race 5 times; giving up")
      resCache = null // merge against the LIVE table, not a stale cache
      val rows = resources + (r.name -> r)
      done = swapWrite(
        spark.createDataFrame(rows.values.toSeq.sortBy(_.name)), resPath)
      if (done) resCache = rows
    }
  }

  def addRelation(rel: Relation): Unit = Catalog.lockFor(relPath).synchronized {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (attempts > 5) throw new java.io.IOException(
        s"catalog addRelation($relPath): lost the swap race 5 times; giving up")
      relCache = null
      val rows = relations + (rel.name -> rel)
      done = swapWrite(
        spark.createDataFrame(rows.values.toSeq.sortBy(_.name)), relPath)
      if (done) relCache = rows
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
