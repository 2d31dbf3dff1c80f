package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-distribution stats in ONE map-side pass:
  * `(n_distinct_chars, entropy_u)` where `entropy_u` is
  * Σ_c floor(1e6 · (n_c/n) · ln(n/n_c)) over the text's code points —
  * the integer-quantized Shannon entropy the t16 quality signal uses.
  *
  * The declarative form this replaces exploded ONE ROW PER CHARACTER
  * corpus-wide, shuffled them into a (doc, char) aggregate, joined the
  * per-doc totals back and aggregated again — 134 task-CPU s at v2sf1
  * with the explode already native (DRIFT_r13 §3: the per-char GROUP
  * BY dominates, not the explode). A document's alphabet is bounded
  * and tiny, so the whole computation is a per-row frequency map:
  * zero shuffle, linear scan, nothing leaves the task.
  *
  * Arithmetic parity: per distinct code point the term is computed as
  * `(1e6 · (nc/n)) · ln(n/nc)` in exactly the old column expression's
  * association, floored per term THEN summed — matching the DuckDB
  * oracle (which keeps the unnest form) bit for bit, since both
  * engines evaluate the identical IEEE-double expression tree per
  * term. Distinct code points are visited in ascending order so the
  * floor-then-sum order is deterministic (terms are floored integers,
  * so any order sums equally — the sort is belt and braces).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = new StructType()
    .add("n_distinct_chars", LongType, nullable = false)
    .add("entropy_u", LongType, nullable = false)

  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires STRING, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1L
      i += Character.charCount(cp)
    }
    var entropy = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val nc = it.next()
      entropy += math.floor(
        (1e6d * (nc.toDouble / n.toDouble)) *
          math.log(n.toDouble / nc.toDouble)).toLong
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](counts.size().toLong, entropy))
  }

  def char_entropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))
}
