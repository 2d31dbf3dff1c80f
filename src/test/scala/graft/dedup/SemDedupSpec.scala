package graft.dedup

import graft.{SparkSuite, SparkEntry}
import graft.similarity.{CosineSim, IvfFlat}
import org.apache.spark.sql.functions._

/** d11_semdedup: cluster-blocked semantic dedup. The oracle gate pins
  * the arithmetic; this spec independently re-derives the drop set by
  * brute force (all-pairs cosine + a from-scratch nearest-centroid
  * argmax) and checks the blocked query returns EXACTLY the vectors
  * that have a smaller-id same-cell neighbor at or above threshold —
  * completeness and soundness, not just per-row validity.
  */
class SemDedupSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.3

  test("blocked drop set equals the brute-force within-cell drop set") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // independent assignment: argmax over the query's √n-sized
    // codebook, computed with a collect + scala loop rather than the
    // operator's broadcast-join/max_by plan
    val k = math.max(16L, IvfFlat.autoStride(emb.count())).toInt
    val cb = IvfFlat.codebook(emb, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getDouble(2)))
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val cellOf = vecs.map { case (id, v) =>
      val n = nrm(v)
      // highest cosine, ties to the smallest centroid id — the
      // operator's documented tie-break
      val best = cb.map { case (cid, cv, cn) => (dot(v, cv) / (n * cn), cid) }
        .reduceLeft((x, y) =>
          if (y._1 > x._1 || (y._1 == x._1 && y._2 < x._2)) y else x)
      id -> best._2
    }.toMap
    val expected = (for {
      (i, vi) <- vecs; (j, vj) <- vecs
      if j < i && cellOf(i) == cellOf(j)
      if dot(vi, vj) / (nrm(vi) * nrm(vj)) >= tau
    } yield (i, j)).groupBy(_._1)
      .map { case (i, ps) => i -> ((ps.map(_._2).min, ps.size.toLong)) }

    val got = SparkEntry.queries("d11_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty, "fixture must contain planted near-dups")
    assert(got === expected,
      s"blocked vs brute-force drop sets differ: " +
        s"only-blocked=${got.keySet -- expected.keySet}, " +
        s"only-brute=${expected.keySet -- got.keySet}")
  }

  test("zero-norm vectors and zero-norm centroids: assignWith == assignTo, exclusion parity") {
    // ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO on the join
    // path's cosine for a zero denominator, so zero norms cannot be
    // "ranked" — the pinned contract is EXCLUSION: a zero-norm vector
    // is dropped by BOTH paths, a zero-norm centroid is ignored by
    // BOTH paths, and the surviving assignments agree row-for-row
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0.0d, 0.0d, 0.0d)), // zero vector
      (1L, Array(1.0d, 0.0d, 0.0d)),
      (2L, Array(0.0d, 1.0d, 0.0d)),
      (3L, Array(0.5d, 0.5d, 0.0d))).toDF("vec_id", "embedding")
    val cb = Seq(
      (10L, Array(1.0d, 0.0d, 0.0d)),
      (20L, Array(0.0d, 0.0d, 0.0d)), // zero-norm centroid
      (30L, Array(0.0d, 0.0d, 1.0d)))
      .toDF("__cid", "__cv")
      .withColumn("__cn",
        sqrt(CosineSim.dot(col("__cv").cast("array<double>"),
          col("__cv").cast("array<double>"))))
    def collectCells(df: org.apache.spark.sql.DataFrame): Map[Long, Any] =
      df.select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val withExpr = collectCells(
      IvfFlat.assignWith(vecs, "vec_id", "embedding", cb))
    val withJoin = collectCells(
      IvfFlat.assignTo(vecs, "vec_id", "embedding", cb))
    assert(withExpr === withJoin,
      s"assignWith/assignTo parity broken on zero-norm input: " +
        s"expr=$withExpr join=$withJoin")
    assert(!withExpr.values.exists(_ == null),
      "surviving rows must carry a real cell, never NULL")
    // zero vector 0 excluded; the zero-norm centroid 20 never wins;
    // vec 1 → 10 (cos 1), vecs 2 and 3 → ties/argmax per real cosine
    assert(!withExpr.contains(0L), s"zero-norm vector must be dropped: $withExpr")
    assert(withExpr === Map(1L -> 10L, 2L -> 10L, 3L -> 10L),
      s"zero-norm-exclusion assignment broken: $withExpr")
  }

  test("emitted cell matches the assignment of the dropped vector") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val k = math.max(16L, IvfFlat.autoStride(emb.count())).toInt
    val cb = IvfFlat.codebook(emb, "vec_id", "embedding", k)
    val assigned = IvfFlat.assignTo(emb, "vec_id", "embedding", cb)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    SparkEntry.queries("d11_semdedup")(spark, dir).collect().foreach { r =>
      assert(r.getLong(1) === assigned(r.getLong(0)),
        s"vec ${r.getLong(0)}: emitted cell ${r.getLong(1)} != assigned")
      assert(r.getLong(2) < r.getLong(0), "keeper must be the smaller id")
    }
  }
}
