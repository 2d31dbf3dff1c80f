package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

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

  property("codon table is total over ACGT triplets") = Prop {
    val bases = Seq("A", "C", "G", "T")
    val all = for (a <- bases; b <- bases; c <- bases) yield a + b + c
    all.forall(c => SeqFunctions.codonTable.get(c).exists(aa =>
      aa.length == 1 && ("ACDEFGHIKLMNPQRSTVWY*".contains(aa))))
  }
}
