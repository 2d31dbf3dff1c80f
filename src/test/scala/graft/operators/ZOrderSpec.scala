package graft.operators

import graft.SparkSuite

/** Morton interleave correctness (ZOrder.interleave): the codegen
  * expression must match a reference bit-interleave, and the curve
  * must have the locality property the layout relies on (z-prefix
  * cells = aligned quadtree tiles).
  */
class ZOrderSpec extends SparkSuite {

  private def refMorton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("expression matches the reference interleave on a value grid") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y"), 6).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) === refMorton(x, y, 6), s"at ($x,$y)")
  }

  test("z-prefix cells are aligned power-of-two tiles") {
    // dropping 2k low bits of z = dropping k low bits of each
    // coordinate: every cell's bounding box is exactly a 2^k-aligned
    // 2^k × 2^k square — the property that makes min/max pruning
    // fire on either dimension.
    for (x <- 0L until 32L; y <- 0L until 32L) {
      val cell = refMorton(x, y, 6) >> 6 // k = 3 low bits of each dim
      assert(cell === refMorton(x >> 3, y >> 3, 3), s"at ($x,$y)")
    }
  }

  test("interleaveSql emits the same arithmetic (spot check via Spark SQL)") {
    // the oracle-side SQL string is plain shift/mask arithmetic —
    // evaluate it in Spark's SQL parser to pin parity with the column
    // expression.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val sql = ZOrder.interleaveSql("x", "y", 12)
    val rows = Seq((4095L, 0L), (0L, 4095L), (2741L, 1234L), (1L, 2L))
      .toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), 12).as("a"),
        expr(sql).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("layout writes tile-local files that prune on both dimensions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/zorder_layout_${spark.sparkContext.applicationId}"
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    ZOrder.layout(pts.toDF("x", "y"), "x", "y", bits = 6, path = path, partitions = 8)
    val back = spark.read.parquet(path)
    assert(back.count() === 64L * 64L)
    assert(back.columns.toSeq === Seq("x", "y")) // __z dropped
    // the pruning effect itself: a predicate on x alone (x < 8) must
    // leave some files untouched (their footer min_x already excludes
    // it). A y-sorted row-slice layout would put x<8 points in EVERY
    // file; in z order, ranges inside the x>=32 quadrants (half the
    // curve) contain none.
    val boxes = back.withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .collect()
    assert(boxes.length >= 4, s"expected several files, got ${boxes.length}")
    val touched = boxes.count(_.getAs[Long]("min_x") < 8L)
    assert(touched <= boxes.length - 2,
      s"x<8 touches $touched of ${boxes.length} files — no pruning benefit")
  }

  test("bits bounds are enforced") {
    import org.apache.spark.sql.functions.col
    intercept[IllegalArgumentException] { ZOrder.interleave(col("x"), col("y"), 0) }
    intercept[IllegalArgumentException] { ZOrder.interleaveSql("x", "y", 32) }
  }
}
