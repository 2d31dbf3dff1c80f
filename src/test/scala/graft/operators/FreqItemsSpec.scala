package graft.operators

import graft.SparkSuite

/** Misra-Gries frequent items: the summary never loses a true heavy
  * hitter (frequency > n/k), and the two-pass result is exact.
  */
class FreqItemsSpec extends SparkSuite {

  private def itemsDF(items: Seq[String]) = {
    import spark.implicits._
    items.toDF("item")
  }

  // planted zipf-ish stream: "hot" 40%, "warm" 25%, rest singletons
  private val planted: Seq[String] = {
    val hot = Seq.fill(400)("hot"); val warm = Seq.fill(250)("warm")
    val tail = (0 until 350).map(i => s"t$i")
    // deterministic interleave so no partition sees only one item
    (hot ++ warm ++ tail).zipWithIndex.sortBy { case (_, i) => (i * 37) % 1000 }.map(_._1)
  }

  test("summary retains every item with frequency > n/k") {
    val s = FreqItems.summary(itemsDF(planted), "item", k = 10)
    assert(s.size <= 10)
    assert(s.contains("hot") && s.contains("warm")) // 40% and 25% >> 10%
  }

  test("heavyHitters is exact: matches brute-force counts") {
    val k = 10
    val got = FreqItems.heavyHitters(itemsDF(planted), "item", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = planted.size
    val brute = planted.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
    assert(got === brute)
    assert(got === Map("hot" -> 400L, "warm" -> 250L))
  }

  test("no heavy hitters on a uniform stream") {
    val uniform = (0 until 500).map(i => s"u${i % 100}") // each 1% < 1/10
    assert(FreqItems.heavyHitters(itemsDF(uniform), "item", 10).count() === 0L)
  }

  test("k bound is enforced") {
    intercept[IllegalArgumentException] {
      FreqItems.summary(itemsDF(Seq("a")), "item", 0)
    }
  }
}
