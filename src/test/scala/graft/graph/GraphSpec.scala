package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Motif semantics mirror pygr `tests/graph_test.py:88-160`: basic
  * path queries, cyclic query graphs (closure edges as filters),
  * per-step filters, and injective matching.
  */
class GraphSpec extends SparkSuite {

  private def edgesDF(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  //   1 -> 2 -> 3 -> 1  (triangle)  and  2 -> 4
  private lazy val g = edgesDF((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L))

  private def rows(df: org.apache.spark.sql.DataFrame, cols: String*) =
    df.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(r.getLong).toList).toSet

  test("path motif a->b->c enumerates all injective chains") {
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("a", "b", g), MotifEdge("b", "c", g))), "a", "b", "c")
    assert(got === Set(
      List(1L, 2L, 3L), List(1L, 2L, 4L), List(2L, 3L, 1L), List(3L, 1L, 2L)))
  }

  test("cyclic motif: closure edge filters to the triangle") {
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("a", "b", g), MotifEdge("b", "c", g),
      MotifEdge("c", "a", g))), "a", "b", "c") // c->a closes the cycle
    assert(got === Set(List(1L, 2L, 3L), List(2L, 3L, 1L), List(3L, 1L, 2L)))
  }

  test("non-injective matching allows repeated data nodes") {
    val gg = edgesDF((1L, 2L), (2L, 1L))
    val inj = rows(MotifQuery.find(Seq(
      MotifEdge("a", "b", gg), MotifEdge("b", "c", gg))), "a", "b", "c")
    assert(inj === Set.empty) // a==c forced, injective forbids
    val rel = rows(MotifQuery.find(Seq(
      MotifEdge("a", "b", gg), MotifEdge("b", "c", gg)), injective = false),
      "a", "b", "c")
    assert(rel === Set(List(1L, 2L, 1L), List(2L, 1L, 2L)))
  }

  test("per-step filter prunes bindings (graphquery.py:500-503)") {
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("a", "b", g, filter = Some(col("b") =!= 2L)),
      MotifEdge("b", "c", g))), "a", "b", "c")
    assert(got === Set(List(2L, 3L, 1L), List(3L, 1L, 2L)))
  }

  test("maxHits caps motif solutions (maxhit semantics)") {
    val capped = MotifQuery.find(Seq(
      MotifEdge("a", "b", g), MotifEdge("b", "c", g)), maxHits = Some(2))
    assert(capped.count() === 2)
  }

  test("heterogeneous edge sources per motif edge") {
    val e1 = edgesDF((10L, 20L))
    val e2 = edgesDF((20L, 30L))
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("x", "y", e1), MotifEdge("y", "z", e2))), "x", "y", "z")
    assert(got === Set(List(10L, 20L, 30L)))
  }

  test("EdgeGraph: adjacency, inverse, degrees, connected components") {
    val e = edgesDF((1L, 2L), (2L, 3L), (10L, 11L))
    val eg = new EdgeGraph(e)
    assert(eg.adjacency(2L).collect().map(_.getLong(1)).toSet === Set(3L))
    assert(eg.inverse.adjacency(2L).collect().map(_.getLong(1)).toSet === Set(1L))
    assert(eg.outDegrees.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 1L), (2L, 1L), (10L, 1L)))
    val cc = eg.connectedComponents(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("EdgeGraph.shortestPaths: hop distances from landmarks, capped") {
    // path 1-2-3-4-5, separate component 10-11
    val e = edgesDF((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val und = new EdgeGraph(new EdgeGraph(e).undirected)
    val got = und.shortestPaths(spark, Seq(1L, 10L)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got((1L, 1L)) === 0L)
    assert(got((3L, 1L)) === 2L)
    assert(got((5L, 1L)) === 4L)
    assert(got((11L, 10L)) === 1L)
    assert(!got.contains((5L, 10L)), "cross-component pair must be absent")
    // the cap drops far pairs but keeps near ones
    val capped = und.shortestPaths(spark, Seq(1L), maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(capped === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("graph_test.py:88-100 basic query golden (verbatim)") {
    val g = edgesDF((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 6L), (5L, 6L))
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("q0", "q1", g), MotifEdge("q0", "q2", g),
      MotifEdge("q0", "q3", g), MotifEdge("q3", "q4", g))),
      "q0", "q1", "q2", "q3", "q4")
    assert(got === Set(
      List(0L, 1L, 2L, 3L, 4L), List(0L, 1L, 2L, 3L, 5L),
      List(0L, 2L, 1L, 3L, 4L), List(0L, 2L, 1L, 3L, 5L)))
  }

  test("graph_test.py:114-121 cyclic query vs cyclic data golden") {
    val g = edgesDF((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 2L))
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("q0", "q1", g), MotifEdge("q1", "q2", g),
      MotifEdge("q2", "q4", g), MotifEdge("q4", "q3", g),
      MotifEdge("q3", "q1", g))),
      "q0", "q1", "q2", "q3", "q4")
    assert(got === Set(List(1L, 2L, 3L, 5L, 4L)))
  }

  test("graph_test.py:123-130 cyclic query vs acyclic data is empty") {
    val g = edgesDF((0L, 1L), (1L, 3L), (5L, 3L), (4L, 5L), (2L, 4L), (2L, 1L))
    val got = MotifQuery.find(Seq(
      MotifEdge("q0", "q1", g), MotifEdge("q1", "q3", g),
      MotifEdge("q3", "q5", g), MotifEdge("q5", "q4", g),
      MotifEdge("q4", "q2", g), MotifEdge("q2", "q1", g)))
    assert(got.count() === 0L)
  }

  test("graph_test.py:132-140 symmetric query golden") {
    val g = edgesDF((1L, 2L), (2L, 3L), (2L, 4L), (5L, 2L))
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("q0", "q1", g), MotifEdge("q1", "q2", g))),
      "q0", "q1", "q2")
    assert(got === Set(
      List(1L, 2L, 3L), List(1L, 2L, 4L), List(5L, 2L, 3L), List(5L, 2L, 4L)))
  }

  test("graph_test.py:151-160 headless (pure cycle) query golden") {
    val g = edgesDF((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = rows(MotifQuery.find(Seq(
      MotifEdge("q0", "q1", g), MotifEdge("q1", "q2", g),
      MotifEdge("q2", "q3", g), MotifEdge("q3", "q0", g))),
      "q0", "q1", "q2", "q3")
    assert(got === Set(
      List(1L, 2L, 3L, 4L), List(2L, 3L, 4L, 1L),
      List(3L, 4L, 1L, 2L), List(4L, 1L, 2L, 3L)))
  }

  test("connected components on a deep chain checkpoints lineage") {
    // a 40-node path has diameter ≈ iteration count — the worst case
    // for Pregel lineage depth; interval=5 (SparkSuite conf) must
    // produce actual checkpoint data and still converge to one comp
    val chain = edgesDF((0L until 39L).map(i => (i, i + 1)): _*)
    val eg = new EdgeGraph(chain)
    val cc = eg.connectedComponents(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc.size === 40)
    assert(cc.values.toSet === Set(0L))
    val ckptDir = spark.sparkContext.getCheckpointDir
    assert(ckptDir.isDefined, "connectedComponents must ensure a checkpoint dir")
    val files = new java.io.File(new java.net.URI(ckptDir.get))
    assert(files.exists && files.listFiles().nonEmpty,
      "deep chain with checkpointInterval=5 should have written checkpoint data")
    // bounded iteration cap still returns a labeling (possibly coarser)
    assert(eg.connectedComponents(spark, maxIterations = 3).count() === 40L)
  }
}
