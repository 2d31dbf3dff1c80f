package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Trained-codebook IVF: fixed-k hash-sampled codebook, Lloyd
  * refinement, and the constant-k search path.
  */
class IvfFlatSpec extends SparkSuite {

  // three well-separated clusters in 8 dims: each vector is its
  // cluster's axis direction plus small deterministic jitter
  private def clustered() = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val id = (c * 20 + i).toLong
      val v = Array.tabulate(8) { d =>
        val base = if (d == c * 2) 10.0f else 0.0f
        base + ((id * 7 + d * 3) % 5) * 0.1f
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codebook is a deterministic fixed-k hash sample") {
    val emb = clustered()
    val cb1 = IvfFlat.codebook(emb, "vec_id", "embedding", k = 5)
      .select("__cid").collect().map(_.getLong(0)).toSeq
    val cb2 = IvfFlat.codebook(emb, "vec_id", "embedding", k = 5)
      .select("__cid").collect().map(_.getLong(0)).toSeq
    assert(cb1 == cb2, "hash sample must be deterministic")
    assert(cb1.size == 5)
    // doubling the corpus must NOT double the codebook (the whole
    // point vs stride sampling)
    val doubled = emb.union(emb.withColumn("vec_id", col("vec_id") + 1000L))
    val cbD = IvfFlat.codebook(doubled, "vec_id", "embedding", k = 5)
    assert(cbD.count() == 5L)
  }

  test("Lloyd refine groups the planted clusters into coherent cells") {
    val emb = clustered()
    val cb0 = IvfFlat.codebook(emb, "vec_id", "embedding", k = 3)
    val cb = IvfFlat.refine(emb, "vec_id", "embedding", cb0, iters = 3)
    assert(cb.count() == 3L, "refine must preserve codebook size")
    val assigned = IvfFlat.assignTo(emb, "vec_id", "embedding", cb)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted cluster must land in exactly one cell
    (0 until 3).foreach { c =>
      val cells = (0 until 20).map(i => assigned((c * 20 + i).toLong)).toSet
      assert(cells.size == 1, s"cluster $c split across cells $cells")
    }
    // and different clusters in different cells
    val reps = (0 until 3).map(c => assigned((c * 20L))).toSet
    assert(reps.size == 3, s"clusters collapsed into cells $reps")
  }

  test("refine keeps centroids for emptied cells") {
    val emb = clustered()
    // k far above the natural cluster count: many cells go empty
    // after one Lloyd round, but the codebook must stay at k
    val cb0 = IvfFlat.codebook(emb, "vec_id", "embedding", k = 10)
    val cb = IvfFlat.refine(emb, "vec_id", "embedding", cb0, iters = 2)
    assert(cb.count() == 10L)
  }

  test("refined constant-k search achieves full recall on separated clusters") {
    val emb = clustered()
    val cb = IvfFlat.refine(emb, "vec_id", "embedding",
      IvfFlat.codebook(emb, "vec_id", "embedding", k = 3), iters = 2)
    val cells = IvfFlat.assignTo(emb, "vec_id", "embedding", cb)
    val qs = emb.filter(col("vec_id") < 10)
    val approx = IvfFlat.searchTopKWith(qs, cells, cb,
        "vec_id", "vec_id", "embedding", k = 3, nprobe = 1)
      .select("q", "neighbor").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = CosineSim.topK(qs, emb, "vec_id", "vec_id", "embedding", k = 3)
      .select("q", "neighbor").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with clusters this separated, nprobe=1 over a trained codebook
    // must recover the exact neighbors
    assert(approx == exact,
      s"missed ${(exact -- approx).size} of ${exact.size} exact neighbors")
  }
}
