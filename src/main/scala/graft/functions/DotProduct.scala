package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the array dot product — the hot
  * inner op of every embedding operator (ANN ladder, embedding
  * near-dup, SemDeDup cell assignment). The composed
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold allocates an
  * intermediate array per PAIR; at an n·k assignment join that is
  * tens of millions of 64-element allocations per task (measured:
  * the √n-codebook SemDeDup assignment spent ~10× its compute in
  * that allocation+GC churn). This expression is one fused loop in
  * generated code — zero allocation, whole-stage-codegen friendly.
  *
  * Bit-compatibility contract (what keeps every oracle hash green):
  * the accumulation is the SAME left-to-right double chain
  * ((0.0 + a0·b0) + a1·b1) + … as the fold it replaces — IEEE ops
  * are correctly rounded, so same association ⇒ same bits. Null
  * semantics also match the fold: null input array, null element, or
  * length mismatch (zip_with pads with null ⇒ null product poisons
  * the fold) all yield NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // a length mismatch or null element nulls the result even when both
  // inputs are non-null
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two ARRAY<DOUBLE>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = acc + x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc = $acc + $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Column API. */
  def dot_product(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Register `dot_product` for SQL use on a session. Arity is
    * validated in the builder: without the check a 0/1/3-arg call
    * would throw IndexOutOfBoundsException (or silently drop extras)
    * instead of a clean analysis error.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.registerChecked(spark, "dot_product", 2)(
      exprs => DotProduct(exprs(0), exprs(1)))
}
