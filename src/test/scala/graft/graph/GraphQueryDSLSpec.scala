package graft.graph

import graft.SparkSuite

class GraphQueryDSLSpec extends SparkSuite {

  private def g = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L)).toDF("src", "dst")
  }

  private def rows(df: org.apache.spark.sql.DataFrame, cols: String*) =
    df.select(cols.head, cols.tail: _*).collect()
      .map(r => cols.indices.map(r.getLong).toList).toSet

  test("dict-style query graph, BFS-ordered from the root") {
    val got = rows(GraphQueryDSL.find(g,
      Map("a" -> Seq("b"), "b" -> Seq("c"))), "a", "b", "c")
    assert(got === Set(
      List(1L, 2L, 3L), List(1L, 2L, 4L), List(2L, 3L, 1L), List(3L, 1L, 2L)))
  }

  test("headless (cyclic) query graph works — triangle") {
    val got = rows(GraphQueryDSL.find(g,
      Map("a" -> Seq("b"), "b" -> Seq("c"), "c" -> Seq("a"))), "a", "b", "c")
    assert(got === Set(List(1L, 2L, 3L), List(2L, 3L, 1L), List(3L, 1L, 2L)))
  }

  test("fan-out node binds both targets") {
    // query: x -> y, x -> z (y != z): matches x=2 (y,z ∈ {3,4})
    val got = rows(GraphQueryDSL.find(g,
      Map("x" -> Seq("y", "z"))), "x", "y", "z")
    assert(got === Set(List(2L, 3L, 4L), List(2L, 4L, 3L)))
  }
}
