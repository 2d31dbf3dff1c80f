package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.text.TextFunctions

/** Pins the incremental-ingest contract of
  * `MinHashLSH.incrementalCandidatePairs`: probing a base band-bucket
  * index with a delta batch yields EXACTLY the pairs a full recompute
  * over base ∪ delta would yield, restricted to pairs with at least
  * one delta member — including under a `maxBucket` cap where the
  * delta itself pushes a bucket over the limit (the kept-bucket set
  * must be judged on the COMBINED population, or incremental and full
  * answers drift).
  */
class IncrementalNeardupSpec extends SparkSuite {

  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")

  private def toks(df: DataFrame): DataFrame =
    df.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

  private def buckets(docs: DataFrame): DataFrame =
    MinHashLSH.bandBucketsU(
      MinHashLSH.signaturesU(docs, "doc_id", "toks", k = 8, shingleN = 2),
      "doc_id", k = 8, bands = 4)

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fixture(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    def randDoc() = (1 to 30).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until n).map(i => (i.toLong, randDoc()))
    // planted near-dups across the split boundary: ids ending in 7 are
    // the delta, their originals stay in the base
    val dups = Seq(7L, 17L, 27L).filter(_ < n + 100).zipWithIndex.map {
      case (id, i) =>
        val words = base(i)._2.split(" "); words(15) = "CHANGED"
        (1000L + id * 10 + 7, words.mkString(" "))
    }
    base ++ dups
  }

  test("incremental probe == full recompute restricted to delta-touching pairs") {
    import spark.implicits._
    val docs = toks(fixture(5, 40).toDF("doc_id", "text"))
    val isDelta = col("doc_id") % 10 === 7

    val full = pairsOf(MinHashLSH.candidatePairs(buckets(docs), "doc_id"))
    val deltaIds = docs.where(isDelta).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = full.filter(p => deltaIds(p._1) || deltaIds(p._2))

    val inc = pairsOf(MinHashLSH.incrementalCandidatePairs(
      buckets(docs.where(!isDelta)), buckets(docs.where(isDelta)), "doc_id"))

    assert(inc == expected,
      s"incremental=${inc.toSeq.sorted} expected=${expected.toSeq.sorted}")
    assert(expected.nonEmpty, "fixture planted no cross-split pairs")
    // and no base×base pair leaked through the probe
    assert(inc.forall(p => deltaIds(p._1) || deltaIds(p._2)))
  }

  test("delta-delta pairs are emitted once, base-base never") {
    import spark.implicits._
    // two identical delta docs (ids 17, 27 — both % 10 == 7) and two
    // identical base docs (ids 2, 4): the delta twins must pair, the
    // base twins must NOT appear in the incremental output
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = toks(Seq(
      (2L, text), (4L, text), (17L, text), (27L, text),
      (5L, "mu nu xi mu nu xi mu nu xi mu nu xi mu nu xi")
    ).toDF("doc_id", "text"))
    val isDelta = col("doc_id") % 10 === 7

    val inc = pairsOf(MinHashLSH.incrementalCandidatePairs(
      buckets(docs.where(!isDelta)), buckets(docs.where(isDelta)), "doc_id"))

    assert(inc.contains((17L, 27L)), s"delta twins missing from $inc")
    assert(!inc.contains((2L, 4L)), s"base-base pair leaked: $inc")
    // identical docs collide in every band; the distinct must leave
    // exactly one row per unordered pair
    assert(inc.count(p => p == (17L, 27L)) == 1)
  }

  test("maxBucket cap counts base + delta population together") {
    import spark.implicits._
    // 4 identical base docs + 2 identical delta docs, all one bucket
    // family: combined population 6 > cap 5, so the full recompute
    // keeps nothing — the incremental probe must agree, even though
    // the base-only population (4) and delta-only population (2) are
    // both under the cap
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = toks(
      (Seq(1L, 2L, 3L, 4L).map((_, text)) ++ Seq(17L, 27L).map((_, text)))
        .toDF("doc_id", "text"))
    val isDelta = col("doc_id") % 10 === 7
    val base = buckets(docs.where(!isDelta))
    val delta = buckets(docs.where(isDelta))

    val full = pairsOf(MinHashLSH.candidatePairs(
      buckets(docs), "doc_id", maxBucket = 5))
    assert(full.isEmpty, s"cap should drop the degenerate bucket: $full")

    val inc = pairsOf(MinHashLSH.incrementalCandidatePairs(
      base, delta, "doc_id", maxBucket = 5))
    assert(inc.isEmpty,
      s"incremental cap must see the combined population: $inc")

    // with the cap above the combined population, pairs flow again —
    // restricted to delta-touching ones
    val incLoose = pairsOf(MinHashLSH.incrementalCandidatePairs(
      base, delta, "doc_id", maxBucket = 6))
    val fullLoose = pairsOf(MinHashLSH.candidatePairs(
      buckets(docs), "doc_id", maxBucket = 6))
    val deltaIds = Set(17L, 27L)
    assert(incLoose == fullLoose.filter(p => deltaIds(p._1) || deltaIds(p._2)))
    assert(incLoose.nonEmpty)
  }
}
