package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen codon translation — second UDF→Expression promotion
  * (SURVEY.md §4): DNA → protein in one byte pass using a 4096-entry
  * table indexed by packed upper-cased base codes, instead of a
  * per-codon map lookup expression tree. Semantics identical to
  * `SeqFunctions.translateCodons` (stops '*', unknown codons 'X',
  * partial trailing codon dropped, case-insensitive) — the oracle
  * gate verifies the equivalence end-to-end.
  */
case class TranslateCodons(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "translate_codons"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"translate_codons requires STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = b.length / 3
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c0 = TranslateCodons.code(b(i * 3))
      val c1 = TranslateCodons.code(b(i * 3 + 1))
      val c2 = TranslateCodons.code(b(i * 3 + 2))
      val idx = if (c0 < 0 || c1 < 0 || c2 < 0) 64 else (c0 << 4) | (c1 << 2) | c2
      out(i) = TranslateCodons.table(idx)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("codonTable", TranslateCodons.table, "byte[]")
    val codes = ctx.addReferenceObj("baseCodes", TranslateCodons.codes, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val c0 = ctx.freshName("c0"); val c1 = ctx.freshName("c1"); val c2 = ctx.freshName("c2")
      s"""
        byte[] $b = $c.getBytes();
        int $n = $b.length / 3;
        byte[] $out = new byte[$n];
        for (int $i = 0; $i < $n; $i++) {
          byte $c0 = $codes[$b[$i*3] & 0xff];
          byte $c1 = $codes[$b[$i*3+1] & 0xff];
          byte $c2 = $codes[$b[$i*3+2] & 0xff];
          int idx = ($c0 < 0 || $c1 < 0 || $c2 < 0)
            ? 64 : (($c0 << 4) | ($c1 << 2) | $c2);
          $out[$i] = $tbl[idx];
        }
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TranslateCodons =
    copy(child = newChild)
}

object TranslateCodons {

  /** base byte → 2-bit code (T=0,C=1,A=2,G=3), -1 for unknown. */
  val codes: Array[Byte] = {
    val t = Array.fill[Byte](256)(-1)
    for ((ch, v) <- Seq('T' -> 0, 'C' -> 1, 'A' -> 2, 'G' -> 3)) {
      t(ch.toInt) = v.toByte
      t(ch.toLower.toInt) = v.toByte
    }
    t
  }

  private[functions] def code(b: Byte): Int = codes(b & 0xff)
  private[functions] def known(b: Byte): Boolean = codes(b & 0xff) >= 0

  /** 65-entry AA table: index = packed TCAG codes; 64 = unknown → X.
    * Built from the same genetic-code map the declarative version
    * uses, so the two paths cannot drift.
    */
  val table: Array[Byte] = {
    val t = new Array[Byte](65)
    val bases = "TCAG"
    for (i <- 0 until 4; j <- 0 until 4; k <- 0 until 4) {
      val codon = s"${bases(i)}${bases(j)}${bases(k)}"
      t((i << 4) | (j << 2) | k) =
        graft.seq.SeqFunctions.codonTable(codon).head.toByte
    }
    t(64) = 'X'.toByte
    t
  }

  def translate_codons(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TranslateCodons(ColumnBridge.expression(c)))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerChecked(spark, "translate_codons", 1)(
      exprs => TranslateCodons(exprs.head))
}
