package graft.seq

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Intervals

/** Ports the reference's core sequence-algebra goldens
  * (`tests/sequence_test.py:6-92`) to the explicit-orientation
  * coordinate model: slice/reverse-complement commutation, truncation
  * clamping, interval join (`__mul__` intersection), and their
  * reverse-orientation forms. pygr encodes orientation as coordinate
  * sign; here a reverse view of seq is the interval [0, len) with
  * ori=-1 and position p on the reverse axis reads forward position
  * len-1-p complemented.
  */
class SequenceAlgebraSpec extends SparkSuite {

  private val SEQ = "atttgactatgctccag" // sequence_test.py:10 fixture
  private val LEN = SEQ.length // 17

  private def one = {
    import spark.implicits._
    Seq(SEQ.toUpperCase).toDF("seq")
  }

  private def str(c: org.apache.spark.sql.Column): String =
    one.select(lower(c).as("r")).head().getString(0)

  private def rc(c: org.apache.spark.sql.Column) =
    SeqFunctions.reverseComplement(c)

  test("slice then revcomp vs revcomp then slice (sequence_test.py:17-26)") {
    // str(seq[5:10]) == 'actat'
    assert(str(col("seq").substr(6, 5)) === "actat")
    // str(-(seq[5:10])) == 'atagt'  (slice, then reverse view)
    assert(str(rc(col("seq").substr(6, 5))) === "atagt")
    // str((-seq)[5:10]) == 'gcata'  (reverse view, then slice: the
    // reverse axis [5,10) maps to forward [LEN-10, LEN-5) revcomped)
    assert(str(rc(col("seq").substr(LEN - 10 + 1, 5))) === "gcata")
  }

  test("truncation clamps to bounds (sequence_test.py:28-49)") {
    import spark.implicits._
    // pygr clamps out-of-range slice bounds to the sequence: the
    // equivalent here is clipStart/clipEnd against [0, LEN)
    val cases = Seq(
      (-202020202L, 5L, "atttg"),   // seq[-202020202:5]
      (-2020202L, LEN.toLong, SEQ), // seq[-2020202:]
      (12L, 2029L, "tccag"))        // seq[-5:2029] == [12, clamp)
    val df = cases.toDF("s", "e", "want")
      .withColumn("cs", Intervals.clipStart(col("s"), lit(0L)))
      .withColumn("ce", Intervals.clipEnd(col("e"), lit(LEN.toLong)))
      .withColumn("got", lower(expr(
        s"substring('${SEQ.toUpperCase}', CAST(cs AS INT) + 1, CAST(ce - cs AS INT))")))
    assert(df.where(col("got") =!= col("want")).count() === 0)
    // fully-out-of-bounds slices are EMPTY after clipping — the
    // explicit-ori analog of pygr's IndexError trap is start >= end
    val oob = Seq((999L, 10000L), (1000L, LEN.toLong)).toDF("s", "e")
      .withColumn("cs", Intervals.clipStart(col("s"), lit(0L)))
      .withColumn("ce", Intervals.clipEnd(col("e"), lit(LEN.toLong)))
    assert(oob.where(col("ce") > col("cs")).count() === 0)
  }

  test("join = interval intersection, forward and reverse (sequence_test.py:77-82)") {
    // str(seq[5:15] * seq[8:]) == 'atgctcc'  → [8,15)
    val ilen = one.select(
      Intervals.intersectLen(lit(5L), lit(15L), lit(8L), lit(LEN.toLong)).as("l"))
      .head().getLong(0)
    assert(ilen === 7L)
    assert(str(col("seq").substr(9, 7)) === "atgctcc")
    // str((-(seq[5:10])) * ((-seq)[5:10])) == 'ata': on the reverse
    // axis the operands are [7,12)rc and [5,10)rc in forward coords →
    // forward intersection [7,10), read reverse-complemented
    val lo = math.max(5, 7)
    val hi = math.min(10, 12)
    assert((lo, hi) === ((7, 10)))
    assert(str(rc(col("seq").substr(lo + 1, hi - lo))) === "ata")
  }

  test("seqtype heuristic (sequence_test.py:84-91)") {
    import spark.implicits._
    val df = Seq(
      ("atttgactatgctccag", "dna"),
      ("auuugacuaugcuccag", "rna"),
      ("kqwestvvarphal", "protein")).toDF("seq", "want")
      .withColumn("got", SeqFunctions.guessSeqType(col("seq")))
    assert(df.where(col("got") =!= col("want")).count() === 0)
  }
}
