package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.functions.ReverseComplement
import graft.seq.SeqFunctions
import graft.sources.GappedAlign

/** Property tests for the pure (non-Spark) kernels. */
object PureProps extends Properties("graft.pure") {

  private val gappedPair: Gen[(String, String)] = for {
    n <- Gen.choose(0, 120)
    cols <- Gen.listOfN(n, Gen.oneOf(
      ('A', 'A'), ('A', '-'), ('-', 'A'), ('C', 'G'), ('-', '-')))
  } yield (cols.map(_._1).mkString, cols.map(_._2).mkString)

  property("ungappedRuns cover exactly the doubly-ungapped columns") =
    forAll(gappedPair) { case (a, b) =>
      val runs = GappedAlign.ungappedRuns(a, b)
      val expected = a.zip(b).count { case (x, y) => x != '-' && y != '-' }
      runs.map(_._3).sum == expected
    }

  property("ungappedRuns offsets are strictly increasing and consistent") =
    forAll(gappedPair) { case (a, b) =>
      val runs = GappedAlign.ungappedRuns(a, b)
      val okOrder = runs.sliding(2).forall {
        case Seq((a1, b1, l1), (a2, b2, _)) => a2 >= a1 + l1 && b2 >= b1 + l1
        case _ => true
      }
      val inBounds = runs.forall { case (ao, bo, l) =>
        ao + l <= a.count(_ != '-') && bo + l <= b.count(_ != '-') && l > 0
      }
      okOrder && inBounds
    }

  private val dnaGen: Gen[String] =
    Gen.listOf(Gen.oneOf('A', 'C', 'G', 'T', 'a', 'c', 'g', 't')).map(_.mkString)

  property("reverse complement is an involution on DNA") =
    forAll(dnaGen) { s =>
      def rc(x: String) = {
        val bytes = x.getBytes
        bytes.reverse.map(b => ReverseComplement.TABLE(b & 0xff)).map(_.toChar).mkString
      }
      rc(rc(s)) == s
    }

  property("complement table touches only nucleotide codes") = Prop {
    (0 until 256).forall { i =>
      if ("ACGTUacgtu".contains(i.toChar)) ReverseComplement.TABLE(i) != i.toByte
      else ReverseComplement.TABLE(i) == i.toByte
    }
  }

  private val flipCase: Gen[(Long, Long)] = for {
    h <- Gen.choose(0L, (1L << 56) - 1)
    k <- Gen.choose(0, 6)
    bits <- Gen.listOfN(k, Gen.choose(0, 55))
  } yield (h, bits.foldLeft(h)((acc, b) => acc ^ (1L << b)))

  property("7x8-bit block split finds every pair at hamming <= 6") =
    forAll(flipCase) { case (h1, h2) =>
      java.lang.Long.bitCount(h1 ^ h2) <= 6 ==> {
        val b1 = graft.dedup.SimHash.blocksOf(h1, nBlocks = 7, blockBits = 8)
        val b2 = graft.dedup.SimHash.blocksOf(h2, nBlocks = 7, blockBits = 8)
        b1.zip(b2).exists { case (x, y) => x == y }
      }
    }

  property("codon table is total over ACGT triplets") = Prop {
    val bases = Seq("A", "C", "G", "T")
    val all = for (a <- bases; b <- bases; c <- bases) yield a + b + c
    all.forall(c => SeqFunctions.codonTable.get(c).exists(aa =>
      aa.length == 1 && ("ACDEFGHIKLMNPQRSTVWY*".contains(aa))))
  }
}
