package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-token scan kernels: the compiled forms of the `filter`/
  * `transform`/`aggregate` HOF lambdas that ran INTERPRETED per token
  * under the corpus-scan queries (langid scoring, quality ratios, the
  * hashed-feature classifier). One `Expression` each, shared
  * eval/codegen kernel, null in → null out; the loop body never
  * leaves compiled Java (DRIFT_r12 §8: interpreted per-element
  * dispatch is ~10× the cost and a per-run JIT lottery).
  */
private[functions] trait ArrayStringKernel extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }
}

/** Count of elements equal to any member of a small literal set, WITH
  * multiplicity — `size(filter(toks, t -> array_contains(set, t)))`
  * compiled (the langid stopword score: one pass per language). */
case class CountInSet(child: Expression, set: Seq[String])
    extends ArrayStringKernel {
  require(set.nonEmpty, "count_in_set needs a non-empty set")

  override def prettyName: String = "count_in_set"

  @transient private lazy val lookup: java.util.HashSet[UTF8String] =
    CountInSet.buildLookup(set.toArray)

  override protected def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val words = ctx.addReferenceObj("inSetWords", set.toArray,
      "java.lang.String[]")
    val lk = ctx.addMutableState("java.util.HashSet", "inSetLookup",
      v => s"$v = graft.functions.CountInSet.buildLookup($words);")
    defineCodeGen(ctx, ev, c => s"graft.functions.CountInSet.count($c, $lk)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def buildLookup(words: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(arr: ArrayData, lookup: java.util.HashSet[UTF8String]): Long = {
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && lookup.contains(t)) c += 1
      i += 1
    }
    c
  }

  def count_in_set(toks: Column, set: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(toks), set))
}

/** Count of non-empty elements consisting only of `[a-z]` —
  * the contract is `\A[a-z]+\z` over the token's raw bytes, NOT
  * `rlike("^[a-z]+$")`: Java's `$` matches before a trailing line
  * terminator, so `"ab\n"` counts under the rlike form but not here.
  * The two agree on any whitespace-split tokenization (tokens can't
  * contain `\n`); callers with other tokenizers get the stricter
  * full-match semantics. Compiled byte scan, no per-element regex
  * machinery (the Gopher alpha-ratio rule). */
case class CountLowerAlpha(child: Expression) extends ArrayStringKernel {

  override def prettyName: String = "count_lower_alpha"

  override protected def nullSafeEval(input: Any): Any =
    CountLowerAlpha.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountLowerAlpha.count($c)")

  override protected def withNewChildInternal(newChild: Expression): CountLowerAlpha =
    copy(child = newChild)
}

object CountLowerAlpha {
  def count(arr: ArrayData): Long = {
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        // pure a-z is single-byte UTF-8: scan the raw bytes
        val nb = t.numBytes()
        var j = 0
        var ok = true
        while (ok && j < nb) {
          val b = t.getByte(j)
          if (b < 'a' || b > 'z') ok = false
          j += 1
        }
        if (ok) c += 1
      }
      i += 1
    }
    c
  }

  def count_lower_alpha(toks: Column): Column =
    ColumnBridge.column(CountLowerAlpha(ColumnBridge.expression(toks)))
}

/** Σ over tokens of `(first32bits(md5(token)) mod m) - shift` — the
  * hashed-feature linear classifier score
  * (`aggregate(transform(toks, t -> conv(substr(md5(t),1,8),16,10) % m - shift), 0, +)`)
  * as one compiled pass: per token one md5 and one fused
  * mod-subtract, no interpreted lambda, no boxed accumulator. The
  * DuckDB oracle restates the identical arithmetic
  * (`('0x' || substr(md5(t), 1, 8))::BIGINT % m - shift`). */
case class HashWeightSum(child: Expression, m: Long, shift: Long)
    extends ArrayStringKernel {
  require(m > 0, s"modulus must be positive, got $m")

  override def prettyName: String = "hash_weight_sum"

  override protected def nullSafeEval(input: Any): Any =
    HashWeightSum.sum(input.asInstanceOf[ArrayData], m, shift)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashWeightSum.sum($c, ${m}L, ${shift}L)")

  override protected def withNewChildInternal(newChild: Expression): HashWeightSum =
    copy(child = newChild)
}

object HashWeightSum {
  def sum(arr: ArrayData, m: Long, shift: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        // first 8 hex chars = first 32 bits, as conv(substr(md5,1,8),16,10)
        var v = 0L
        var bi = 0
        while (bi < 4) { v = (v << 8) | (d(bi) & 0xffL); bi += 1 }
        acc += v % m - shift
      }
      i += 1
    }
    acc
  }

  def hash_weight_sum(toks: Column, m: Long, shift: Long): Column =
    ColumnBridge.column(HashWeightSum(ColumnBridge.expression(toks), m, shift))
}

/** Space-joined tokens whose 1-BASED position is not in `cut` — the
  * compiled fusion of
  * `concat_ws(" ", filter(toks, (t, i) -> !array_contains(cut, i+1)))`
  * (the c6 duplicate-span removal re-emit). The HOF form ran an
  * interpreted lambda doing an O(|cut|) array_contains PER TOKEN; here
  * the cut set is sorted once per row and merge-walked against the
  * ascending token index — O(n + c log c) — and the intermediate
  * `clean` array is never built (survivors go straight into the
  * joined string). Null elements are skipped like concat_ws; null
  * `toks` or `cut` → null (coalesce the cut side when "no cuts" means
  * "keep all"). An empty survivor set yields "" (concat_ws's empty
  * result), not null. `cut` must not contain null ELEMENTS (a null
  * slot reads as position 0, which can never match the 1-based
  * index — harmless today, but the contract is "non-null positions";
  * collect_set, the expected producer, never emits nulls).
  */
case class JoinExceptPositions(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "join_except_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"join_except_positions requires ARRAY<STRING>, ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JoinExceptPositions.join(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JoinExceptPositions.join($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JoinExceptPositions =
    copy(left = newLeft, right = newRight)
}

object JoinExceptPositions {
  private val SEP = UTF8String.fromString(" ")

  def join(toks: ArrayData, cut: ArrayData): UTF8String = {
    val c = cut.numElements()
    val cuts = new Array[Long](c)
    var i = 0
    while (i < c) { cuts(i) = cut.getLong(i); i += 1 }
    java.util.Arrays.sort(cuts)
    val n = toks.numElements()
    val kept = new Array[UTF8String](n)
    var k = 0
    var j = 0
    i = 0
    while (i < n) {
      val pos = i + 1L // 1-based, like the oracle's list positions
      while (j < c && cuts(j) < pos) j += 1
      if (j >= c || cuts(j) != pos) {
        val t = toks.getUTF8String(i)
        if (t != null) { kept(k) = t; k += 1 } // concat_ws skips nulls
      }
      i += 1
    }
    UTF8String.concatWs(SEP, java.util.Arrays.copyOf(kept, k): _*)
  }

  def join_except_positions(toks: Column, cut: Column): Column =
    ColumnBridge.column(JoinExceptPositions(
      ColumnBridge.expression(toks), ColumnBridge.expression(cut)))
}
