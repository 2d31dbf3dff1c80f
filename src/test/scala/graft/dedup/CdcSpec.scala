package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The property that makes content-defined chunking worth its hash
  * cost: an edit only disturbs the chunks whose windows it touches —
  * everything past resynchronizes. Fixed-size chunking shifts EVERY
  * downstream chunk on a one-char insertion.
  */
class CdcSpec extends SparkSuite {

  import spark.implicits._

  private def chunksOf(texts: Seq[String]): Map[String, Seq[String]] =
    texts.toDF("text")
      .select(col("text"), Cdc.chunks(col("text")).as("cs"))
      .as[(String, Seq[String])].collect().toMap

  test("chunks reassemble to the input; empty and short strings are one chunk") {
    val texts = Seq("", "abc", "a" * 7, "hello world this is a longer text " * 8)
    val m = chunksOf(texts)
    for (t <- texts) {
      assert(m(t).mkString === t, s"chunks must cover '$t'")
      if (t.length < 8) assert(m(t).size === 1)
    }
  }

  test("prefix insertion resynchronizes: only the first chunk changes") {
    val base = "the quick brown fox jumps over the lazy dog and keeps going " * 10
    val edited = "X" + base
    val m = chunksOf(Seq(base, edited))
    val (cb, ce) = (m(base), m(edited))
    assert(cb.size > 2, "fixture must chunk into several pieces")
    // every boundary window beyond the edit sees identical content, so
    // the chunk streams agree from the second chunk on
    assert(ce.tail === cb.tail)
    assert(ce.head === "X" + cb.head)
  }

  test("mid-document edit disturbs only the touched chunks (seeded property)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 40) {
      val s = Array.fill(400)(('a' + rnd.nextInt(26)).toChar).mkString
      val pos = 50 + rnd.nextInt(300)
      val edited = s.substring(0, pos) + "ZZZ" + s.substring(pos)
      val m = chunksOf(Seq(s, edited))
      val (cb, ce) = (m(s), m(edited))
      // a chunk ending at 1-based position e is untouched iff e <= pos:
      // its boundary window [e-7, e] lies entirely in the unchanged
      // prefix, and no earlier content changed to create a new boundary
      val endsB = cb.scanLeft(0)(_ + _.length).tail
      val nBefore = endsB.count(_ <= pos)
      assert(ce.take(nBefore) === cb.take(nBefore))
      // the tail resynchronizes: when the base's last chunk starts well
      // past the edit (+ window slack), the edited text's last chunk is
      // byte-identical — every boundary window past the edit sees the
      // same content, merely shifted
      val lastStart = s.length - cb.last.length + 1
      if (lastStart > pos + 12) assert(ce.last === cb.last)
    }
  }
}
