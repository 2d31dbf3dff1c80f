package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-letter alignment-match counter — the inner loop of the
  * flagship Seq2SeqEdge consume path (pygr `sequence.py:706-724`:
  * letter-by-letter identity over an aligned block). Counts positions
  * p in 1..n where `substr(src, p, 1) == substr(dest, p, 1)`,
  * including the out-of-range case where BOTH substrings are empty
  * (that position counts as a match) — byte-for-byte the semantics of
  * the declarative HOF form
  * `size(filter(sequence(1, n), p => substr(src,p,1)===substr(dest,p,1)))`,
  * which Spark interprets with one lambda invocation PER LETTER. Same
  * trap the repo measured at 27× on d13 (BENCH.md); this expression
  * is one fused loop in codegen.
  *
  * Positions are character positions: ASCII inputs (the DNA corpus)
  * take the byte-indexed fast path; any multi-byte input falls back
  * to a per-character loop with identical results.
  */
case class LetterMatches(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "letter_matches"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"letter_matches requires (STRING, STRING, INT), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override protected def nullSafeEval(src: Any, dest: Any, n: Any): Any =
    LetterMatches.count(
      src.asInstanceOf[UTF8String], dest.asInstanceOf[UTF8String],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d, n) =>
      s"${ev.value} = graft.functions.LetterMatches.count($s, $d, $n);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LetterMatches =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LetterMatches {

  /** Shared eval/codegen kernel. */
  def count(src: UTF8String, dest: UTF8String, n: Int): Long = {
    if (n <= 0) return 0L
    val sb = src.getBytes
    val db = dest.getBytes
    if (sb.length == src.numChars() && db.length == dest.numChars()) {
      // ASCII fast path: byte index == char index.
      val m = math.min(n, math.min(sb.length, db.length))
      var c = 0L
      var i = 0
      while (i < m) { if (sb(i) == db(i)) c += 1; i += 1 }
      // Positions past BOTH strings compare "" == "" → match.
      val beyondBoth = n - math.max(sb.length, db.length)
      if (beyondBoth > 0) c += beyondBoth
      c
    } else {
      val sn = src.numChars()
      val dn = dest.numChars()
      var c = 0L
      var p = 0
      val m = math.min(n, math.min(sn, dn))
      while (p < m) {
        if (src.substring(p, p + 1).equals(dest.substring(p, p + 1))) c += 1
        p += 1
      }
      val beyondBoth = n - math.max(sn, dn)
      if (beyondBoth > 0) c += beyondBoth
      c
    }
  }

  def letter_matches(src: Column, dest: Column, n: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(LetterMatches(
      ColumnBridge.expression(src), ColumnBridge.expression(dest),
      ColumnBridge.expression(n)))
  }

  /** SQL surface: `SELECT letter_matches(s, d, n) …` */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerChecked(spark, "letter_matches", 3)(
      exprs => LetterMatches(exprs(0), exprs(1), exprs(2)))
}
