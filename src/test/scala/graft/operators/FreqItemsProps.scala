package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The Misra-Gries guarantees, property-checked over random streams
  * AND random partition splits (the distributed merge must preserve
  * the sequential bounds): summary counts never exceed true counts,
  * and every item with true frequency > n/k survives.
  */
object FreqItemsProps extends Properties("graft.freqitems") {

  private val streamGen: Gen[(List[String], Int, Int)] = for {
    n <- Gen.choose(1, 400)
    alpha <- Gen.choose(1, 12) // small alphabet forces collisions
    items <- Gen.listOfN(n, Gen.choose(0, alpha).map(i => s"i$i"))
    k <- Gen.choose(1, 8)
    nParts <- Gen.choose(1, 5)
  } yield (items, k, nParts)

  private def split[A](xs: List[A], parts: Int): List[List[A]] =
    if (parts <= 1) List(xs)
    else xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toList

  property("merged summary counts never exceed true counts") =
    forAll(streamGen) { case (items, k, nParts) =>
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val merged = split(items, nParts)
        .map(p => FreqItems.mgLocal(k, p.iterator))
        .foldLeft(Map.empty[String, Long])(FreqItems.mgMerge(k, _, _))
      merged.forall { case (t, c) => c <= truth.getOrElse(t, 0L) }
    }

  property("every item with frequency > n/k survives the merge") =
    forAll(streamGen) { case (items, k, nParts) =>
      val n = items.size
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val merged = split(items, nParts)
        .map(p => FreqItems.mgLocal(k, p.iterator))
        .foldLeft(Map.empty[String, Long])(FreqItems.mgMerge(k, _, _))
      truth.forall { case (t, c) => c * k <= n || merged.contains(t) }
    }

  property("summary never holds more than k items") =
    forAll(streamGen) { case (items, k, nParts) =>
      split(items, nParts)
        .map(p => FreqItems.mgLocal(k, p.iterator))
        .foldLeft(Map.empty[String, Long])(FreqItems.mgMerge(k, _, _))
        .size <= k
    }
}
