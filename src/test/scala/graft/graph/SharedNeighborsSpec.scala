package graft.graph

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The degree-aware shared-neighbor motif plan: result parity with the
  * naive self-join, and the skew-defense plan shape — neighbors are
  * aggregated per hub BEFORE the only join, so a hot hub can never
  * produce d² join rows inside one task (VERDICT r1 "what's wrong" #2).
  */
class SharedNeighborsSpec extends SparkSuite {

  private def skewedEdges = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // hub 0: degree 500 (hot); background hubs 1..80: small degrees
    val hot = (1 to 500).map(i => (i.toLong, 0L))
    val bg = (1 to 2000).map(_ => (rnd.nextInt(300).toLong, 1L + rnd.nextInt(80)))
    (hot ++ bg).toDF("src", "dst")
  }

  test("matches the naive self-join on skewed data, across chunk sizes") {
    import spark.implicits._
    val edges = skewedEdges
    val e = edges.distinct()
    val e2 = e.select(col("src").as("s2"), col("dst"))
    val naive = e.join(e2, "dst").where(col("src") < col("s2"))
      .groupBy(col("src").as("s1"), col("s2"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    // mixed (hot hub chunked, cold joined), all-hot, all-cold
    for ((c, hd) <- Seq((64, 0L), (64, 1L), (500, 1L), (1024, 100000L))) {
      val got = MotifQuery.sharedNeighbors(edges, chunkSize = c, hotDegree = hd)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === naive, s"chunkSize=$c hotDegree=$hd")
    }
    assert(naive.size > 100000) // the hot hub really is quadratic
  }

  test("minShared prune: identical >=k results, strictly fewer pair rows") {
    import spark.implicits._
    val edges = skewedEdges
    for (k <- Seq(2L, 3L, 5L)) {
      val full = MotifQuery.sharedNeighbors(edges)
        .where(col("n_shared") >= k)
        .as[(Long, Long, Long)].collect().toSet
      val pruned = MotifQuery.sharedNeighbors(edges, minShared = k)
        .where(col("n_shared") >= k)
        .as[(Long, Long, Long)].collect().toSet
      assert(pruned === full, s"minShared=$k")
      assert(full.nonEmpty, s"fixture must exercise k=$k")
      // the prune must actually drop work: some source has outdeg < k
      // (pair-row reduction is what the drop buys before the count agg)
      val dropped = MotifQuery.sharedNeighbors(edges, minShared = k).count()
      val all = MotifQuery.sharedNeighbors(edges).count()
      assert(dropped < all, s"minShared=$k pruned nothing")
    }
  }

  test("splice graph: alt5/alt3 pairs and splice edges (splicegraph.py:33-61)") {
    import spark.implicits._
    val exons = Seq(
      (1L, 1L, 10L, 20L), (1L, 2L, 10L, 25L), (1L, 3L, 15L, 25L),
      (2L, 4L, 10L, 20L)) // other cluster: same coords, must not pair
      .toDF("cluster", "eid", "s", "en")
    val alt = SpliceGraph.altPairs(exons, Seq("cluster"), "eid", "s", "en")
      .select("kind", "cluster", "e1", "e2")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(alt === Set(("alt5", 1L, 1L, 2L), ("alt3", 1L, 2L, 3L)))

    val splices = Seq((1L, 100L, 20L, 15L)).toDF("cluster", "sid", "donor", "acceptor")
    val edges = SpliceGraph.spliceEdges(exons, splices, Seq("cluster"),
        "eid", "s", "en", "sid", "donor", "acceptor")
      .select("cluster", "sid", "e1", "e2")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(edges === Set((1L, 100L, 1L, 3L)))
  }

  test("hot-hub pair join runs on chunk lists above the salt-chunk aggregate") {
    // force every hub hot: the pair-generating join must sit above the
    // salt-chunk collect_set aggregates on BOTH sides, so a hot hub
    // contributes (d/C)^2 chunk rows to the pair join instead of d^2
    // pair rows in one task, and no aggregation buffer exceeds
    // ~chunkSize elements. (The r18 edge-set pin truncates lineage at
    // a LogicalRDD, so the old proxy — "every inner join sees the
    // distinct()'s Aggregate below it" — no longer holds; assert the
    // chunk-list join directly instead.)
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet}
    val plan = MotifQuery.sharedNeighbors(skewedEdges, chunkSize = 64, hotDegree = 1L)
      .queryExecution.optimizedPlan
    def hasChunkAgg(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst {
        case a: Aggregate if a.aggregateExpressions.exists(_.exists {
          case ae: AggregateExpression => ae.aggregateFunction.isInstanceOf[CollectSet]
          case _ => false
        }) => a
      }.isDefined
    val chunkJoins = plan.collect {
      case j: Join if j.joinType.sql == "INNER" && j.children.forall(hasChunkAgg) => j
    }
    assert(chunkJoins.nonEmpty,
      s"no inner join over chunk-list aggregates on both sides:\n$plan")
  }
}
