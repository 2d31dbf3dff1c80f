package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** |a ∩ b| for two ascending-sorted arrays (string or bigint) as ONE
  * fused merge loop — the verification kernel of the exact set-similarity
  * join ([[graft.dedup.SetSimJoin]]). `array_intersect` answers the
  * same question by building a per-row hash set (allocation + string
  * hashing per element, then `size()` discards the array it built);
  * on sorted inputs a two-pointer merge does it with nothing but
  * binary comparisons — the same reason pygr keeps its interval lists
  * sorted and merges rather than hashing (`intervaldb.c:222-306`).
  * Inputs MUST be sorted ascending in Spark's binary string order
  * (`sort_array`) and duplicate-free (set semantics); `null` array
  * elements are ignored.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count requires two ARRAY<STRING> or two " +
          s"ARRAY<BIGINT> inputs, got (${a.sql}, ${b.sql})")
    }

  private def isLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SortedIntersectCount.countLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (isLong) "countLong" else "count"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.$kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Shared eval/codegen kernel: two-pointer merge over sorted,
    * duplicate-free arrays. Null elements (sorted first by Spark) are
    * skipped.
    */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Long-array kernel: same two-pointer merge over sorted distinct
    * BIGINT sets — the element type [[graft.dedup.SetSimJoin]] uses
    * once sets are hashed ([[ShingleHashes]]); primitive comparisons,
    * no per-element string materialization. */
  def countLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Column API. */
  def sorted_intersect_count(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Register `sorted_intersect_count` for SQL use on a session. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerChecked(spark, "sorted_intersect_count", 2)(
      exprs => SortedIntersectCount(exprs(0), exprs(1)))
}
