package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for reverse complement — the
  * UDF→Expression perf promotion called out in SURVEY.md §4: a single
  * byte-table pass in generated code instead of the two-pass
  * `reverse`+`translate` composition, and no UDF serialization
  * boundary, so it stays inside whole-stage codegen.
  *
  * Semantics match `SeqFunctions.reverseComplement`
  * (pygr `sequence.py:513-520`): ACGTUacgtu complemented, others
  * pass through. ASCII fast path; sequences are ASCII by contract.
  */
case class ReverseComplement(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "reverse_complement"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"reverse_complement requires STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    val n = bytes.length
    while (i < n) {
      out(n - 1 - i) = ReverseComplement.TABLE(bytes(i) & 0xff)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("rcTable", ReverseComplement.TABLE, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        byte[] $bytes = $c.getBytes();
        int $n = $bytes.length;
        byte[] $out = new byte[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$n - 1 - $i] = $tableRef[$bytes[$i] & 0xff];
        }
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ReverseComplement =
    copy(child = newChild)
}

object ReverseComplement {

  /** 256-entry complement table; non-nucleotide bytes map to themselves. */
  val TABLE: Array[Byte] = {
    val t = Array.tabulate[Byte](256)(i => i.toByte)
    val pairs = "ACGTUacgtu".zip("TGCAAtgcaa")
    pairs.foreach { case (from, to) => t(from.toInt) = to.toByte }
    t
  }

  /** Column API. */
  def reverse_complement(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ReverseComplement(ColumnBridge.expression(c)))
  }

  /** Register `reverse_complement` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerChecked(spark, "reverse_complement", 1)(
      exprs => ReverseComplement(exprs.head))
}
