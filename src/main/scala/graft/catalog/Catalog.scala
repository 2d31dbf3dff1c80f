package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

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

/** Metadata catalog persisted as line-oriented records under a
  * directory (the shelve/MySQL metabase analog — metadata is tiny and
  * driver-side; the DATA stays in distributed storage).
  */
class Catalog(dir: String) {
  private val resFile = Paths.get(dir, "resources.tsv")
  private val relFile = Paths.get(dir, "relations.tsv")
  Files.createDirectories(Paths.get(dir))

  private def readLines(p: java.nio.file.Path): Seq[String] =
    if (Files.exists(p)) Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
    else Seq.empty

  def resources: Map[String, Resource] =
    readLines(resFile).map(_.split("\t", -1)).collect {
      case Array(n, k, f, p) => n -> Resource(n, k, f, p)
    }.toMap

  def relations: Map[String, Relation] =
    readLines(relFile).map(_.split("\t", -1)).collect {
      case Array(n, s, sc, d, dc, k) => n -> Relation(n, s, sc, d, dc, k)
      case Array(n, s, sc, d, dc, k, e, esc, edc) =>
        n -> Relation(n, s, sc, d, dc, k, e, esc, edc)
    }.toMap

  /** Register (or replace) a resource; names are hierarchical dotted
    * paths like `Bio.Seq.Genome.HUMAN.hg18` (`metabase.py:1395+`).
    */
  def register(r: Resource): Unit = {
    val rows = resources + (r.name -> r)
    Files.write(resFile, rows.values.toSeq.sortBy(_.name)
      .map(x => s"${x.name}\t${x.kind}\t${x.format}\t${x.path}")
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  def addRelation(rel: Relation): Unit = {
    val rows = relations + (rel.name -> rel)
    Files.write(relFile, rows.values.toSeq.sortBy(_.name)
      .map(x => s"${x.name}\t${x.src}\t${x.srcCol}\t${x.dst}\t${x.dstCol}\t${x.kind}" +
        (if (x.edge.nonEmpty) s"\t${x.edge}\t${x.edgeSrcCol}\t${x.edgeDstCol}" else ""))
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
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
