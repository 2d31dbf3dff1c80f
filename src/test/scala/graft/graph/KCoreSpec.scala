package graft.graph

import graft.SparkSuite

/** k-core peeling semantics (EdgeGraph.kCore): synchronous-round peel
  * must match the classic definition — the maximal induced subgraph
  * with min degree >= k — including the cases that trip a naive
  * one-round filter (chains that peel progressively) and the empty
  * core.
  */
class KCoreSpec extends SparkSuite {

  private def edgesDF(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  private def core(g: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Long] =
    new EdgeGraph(g).kCore(spark, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a pendant path needs multiple peel rounds") {
    // 1-2-3 triangle, then 3-4-5-6 chain: the chain peels one node per
    // round from the far end (6, then 5, then 4) — a single-round
    // degree filter would wrongly keep 4 and 5.
    val g = edgesDF((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("tree has an empty 2-core") {
    val g = edgesDF((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 6L))
    assert(core(g, 2) === Map.empty)
  }

  test("k=3 keeps only the clique, with in-core degrees") {
    // K4 on {1,2,3,4} plus node 5 attached to 1,2 (degree 2 < 3).
    val k4 = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val g = edgesDF(k4 ++ Seq((5L, 1L), (5L, 2L)): _*)
    assert(core(g, 3) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("whole graph is its own core when min degree >= k") {
    val g = edgesDF((1L, 2L), (2L, 3L), (3L, 1L))
    assert(core(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  /** Reference peel: iterate "drop all nodes with degree < k" on an
    * in-memory adjacency map until stable.
    */
  private def bruteCore(es: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).toSet }
    var changed = true
    while (changed) {
      val dead = adj.collect { case (n, ns) if ns.size < k => n }.toSet
      changed = dead.nonEmpty
      adj = (adj -- dead).map { case (n, ns) => n -> (ns -- dead) }
        .filter(_._2.nonEmpty)
    }
    adj.map { case (n, ns) => n -> ns.size.toLong }
  }

  test("matches a brute-force peel on seeded random graphs") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(60)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
        .filter { case (a, b) => a != b }.distinct
      for (k <- Seq(2, 3))
        assert(core(edgesDF(es: _*), k) === bruteCore(es, k),
          s"seed=$seed k=$k")
    }
  }
}
