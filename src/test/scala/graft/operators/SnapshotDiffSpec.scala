package graft.operators

import graft.SparkSuite

/** CDC semantics of SnapshotDiff.diff: presence classification,
  * null-safe payload comparison, unchanged-row suppression.
  */
class SnapshotDiffSpec extends SparkSuite {
  import org.apache.spark.sql.Row

  private def snap(rows: (Long, Option[String], Long)*) = {
    import spark.implicits._
    rows.map { case (k, v, n) => (k, v, n) }.toDF("k", "v", "n")
  }

  private def diffMap(a: org.apache.spark.sql.DataFrame,
                      b: org.apache.spark.sql.DataFrame): Map[Long, Row] =
    SnapshotDiff.diff(a, b, Seq("k")).collect()
      .map(r => r.getLong(r.fieldIndex("k")) -> r).toMap

  test("classifies added, removed, changed; drops unchanged") {
    val a = snap((1L, Some("x"), 10L), (2L, Some("y"), 20L), (3L, Some("z"), 30L))
    val b = snap((2L, Some("y"), 20L), (3L, Some("z"), 31L), (4L, Some("w"), 40L))
    val d = diffMap(a, b)
    assert(d.keySet === Set(1L, 3L, 4L))
    assert(d(1L).getAs[String]("status") === "removed")
    assert(d(3L).getAs[String]("status") === "changed")
    assert(d(3L).getAs[Long]("old_n") === 30L)
    assert(d(3L).getAs[Long]("new_n") === 31L)
    assert(d(4L).getAs[String]("status") === "added")
    assert(d(4L).isNullAt(d(4L).fieldIndex("old_n")))
  }

  test("null payloads compare null-safely") {
    val a = snap((1L, None, 1L), (2L, None, 2L))
    val b = snap((1L, None, 1L), (2L, Some("v"), 2L))
    val d = diffMap(a, b)
    // key 1: null == null payload → unchanged → dropped
    assert(d.keySet === Set(2L))
    assert(d(2L).getAs[String]("status") === "changed")
  }

  test("identical snapshots diff to empty") {
    val a = snap((1L, Some("x"), 1L))
    assert(SnapshotDiff.diff(a, a, Seq("k")).count() === 0L)
  }

  test("schema mismatch fails loudly") {
    import spark.implicits._
    val a = snap((1L, Some("x"), 1L))
    val b = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] { SnapshotDiff.diff(a, b, Seq("k")) }
  }

  test("a value column colliding with a generated old_/new_ name fails loudly") {
    import spark.implicits._
    // old_v collides with the prefixed name generated for value col v
    val a = Seq((1L, "x", "y")).toDF("k", "v", "old_v")
    val err = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a, a, Seq("k"))
    }
    assert(err.getMessage.contains("old_v"))
  }
}
