package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fixed-dimension vector kernels for the quantized-ANN path
  * (ProductQuantizer): per-element work in compiled loops instead of
  * the interpreted `transform`/`zip_with`/`aggregate` lambdas that
  * ran per component per row (DRIFT_r12 §8 — the per-element
  * interpreted tax and its JIT lottery). Arithmetic is identical to
  * the declarative forms, so the DuckDB oracles don't move.
  */

/** `floor(x * 1000)` per component — integer milli-unit quantization
  * of a double vector (`transform(v, x -> floor(x*1000))` compiled). */
case class QuantizeMilli(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_milli"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_milli requires ARRAY<DOUBLE>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    QuantizeMilli.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeMilli.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeMilli =
    copy(child = newChild)
}

object QuantizeMilli {
  def quantize(v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) * 1000d).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantize_milli(v: Column): Column =
    ColumnBridge.column(QuantizeMilli(ColumnBridge.expression(v)))
}

/** Integer squared L2 between two equal-length long vectors —
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)²), 0, +)` compiled. The
  * PQ probe evaluates this per (query, codeword) pair: the hottest
  * inner loop of the quantized search. */
case class L2SquaredLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "l2_squared_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"l2_squared_long requires two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2SquaredLong.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.L2SquaredLong.l2($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): L2SquaredLong =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 quantization of a double vector:
  * `floor(x · 127 / max|x|)` per component (all zeros when the vector
  * is all-zero) — the fused form of
  * `transform(v, x -> floor(x*127/array_max(transform(v, abs))))`,
  * which evaluated THREE interpreted per-element passes per row. The
  * double arithmetic is `(x * 127.0) / m` in that order, matching the
  * declarative expression (and the DuckDB oracle) bit for bit.
  *
  * NaN components: the max-magnitude scan uses Java `>` (false for
  * NaN), so a NaN never becomes the scale and an all-NaN vector takes
  * the all-zero branch — whereas the declarative form's `array_max`
  * propagates NaN and emits NULL components via `floor(NaN)`. NaN is
  * treated as "no magnitude" here by design; embeddings in this
  * engine are NaN-free, so the divergence is unreachable on gated
  * paths. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 requires ARRAY<DOUBLE>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    QuantizeInt8.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeInt8.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def quantize(v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    var m = 0d
    var i = 0
    while (i < n) { val a = math.abs(v.getDouble(i)); if (a > m) m = a; i += 1 }
    val out = new Array[Long](n)
    if (m > 0d) {
      i = 0
      while (i < n) {
        out(i) = math.floor(v.getDouble(i) * 127.0d / m).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  def quantize_int8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))
}

/** Integer dot product of two equal-length long vectors —
  * `aggregate(zip_with(a, b, _*_), 0, +)` compiled (the quantized
  * scoring loop, evaluated per candidate pair). */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product_long requires two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductLong.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductLong.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def dot_product_long(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

object L2SquaredLong {
  def l2(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def l2_squared_long(a: Column, b: Column): Column =
    ColumnBridge.column(
      L2SquaredLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
