package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** GENERATOR emitting the word n-GRAM STRINGS of a token array, one
  * row per gram in token order: `(pos, gram)` with `pos` the 1-based
  * index of the gram's first token and `gram` the space-joined window
  * (concat_ws semantics: a null token contributes neither text nor
  * separator). The native form of
  * `explode(transform(sequence(1, size-n+1), i -> concat_ws(" ", slice(toks, i, n))))`
  * — the `TextFunctions.ngrams` explode that sat under every bigram
  * statistic in the suite (t6/t7/t9/t15) plus the strided chunker
  * (d9): HOF lambdas evaluate INTERPRETED per element and their hot
  * loops are additionally a per-run JIT lottery
  * (DRIFT_r12 §8, `ShingleHashExplode` doc); this loop is one
  * compiled pass per row. Gram VALUES are byte-identical to the
  * declarative chain, so consumers' oracles don't move.
  *
  * `stride` walks the window start in steps (1 = every n-gram; n =
  * non-overlapping chunks). `keepPartial` emits the trailing
  * shorter-than-n window (the chunker's final partial chunk);
  * without it only full windows appear (ngrams semantics, no rows
  * when the doc has fewer than n tokens).
  *
  * Scale: map-side, no shuffle, no per-element boxing; at 100 TB
  * this is the same strided-window story as d8's positional hasher —
  * stride S still sees every duplicate run ≥ n+S-1 tokens.
  */
case class TokenGramsExplode(child: Expression, n: Int, stride: Int,
    keepPartial: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"gram width must be >= 1, got $n")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def elementSchema: StructType =
    new StructType()
      .add("pos", LongType, nullable = false)
      .add("gram", StringType, nullable = false)

  override def prettyName: String = "token_grams_explode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_grams_explode requires ARRAY<STRING>, got ${t.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val toks = child.eval(input).asInstanceOf[ArrayData]
    if (toks == null) return Iterator.empty
    val nTok = toks.numElements()
    val lastStart = if (keepPartial) nTok - 1 else nTok - n
    if (lastStart < 0) return Iterator.empty
    val sb = new java.lang.StringBuilder(64)
    new Iterator[InternalRow] {
      private[this] var i = 0
      private[this] val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      override def hasNext: Boolean = i <= lastStart
      override def next(): InternalRow = {
        sb.setLength(0)
        var appended = false
        var j = i
        val end = math.min(i + n, nTok)
        while (j < end) {
          val t = toks.getUTF8String(j)
          if (t != null) {
            if (appended) sb.append(' ')
            sb.append(t.toString)
            appended = true
          }
          j += 1
        }
        row.update(0, (i + 1).toLong)
        row.update(1, UTF8String.fromString(sb.toString))
        i += stride
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenGramsExplode =
    copy(child = newChild)
}

object TokenGramsExplode {
  /** `toks: array<string>` → one row per n-gram window, columns
    * `(pos: long, gram: string)`; pos is the 1-based first-token
    * index. stride=1/keepPartial=false is the `ngrams` explode. */
  def token_grams_explode(toks: Column, n: Int, stride: Int = 1,
      keepPartial: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      TokenGramsExplode(ColumnBridge.expression(toks), n, stride, keepPartial))
  }
}

/** CHARACTER n-gram twin of [[TokenGramsExplode]]: one row per
  * length-k substring window of a STRING, `(pos, gram)` with `pos`
  * the 1-based first-char index — the k-mer spectrum explode
  * (`explode(transform(sequence(1, len-k+1), i -> substr(text, i, k)))`)
  * and, at k=1, the per-char explode, both previously interpreted per
  * character. Windows are code-point-based (UTF8String.substringSQL),
  * matching `substr` exactly.
  *
  * Sliding mode (`cover = false`, stride 1 typical): only full
  * windows emit — a string shorter than k yields no rows. COVER mode
  * (`cover = true`, stride = k typical): windows tile the whole
  * string, the trailing partial window emits, and an EMPTY string is
  * one empty window (the fixed-size chunker convention — every byte,
  * and every sequence, belongs to some chunk).
  */
case class CharGramsExplode(child: Expression, k: Int, stride: Int = 1,
    cover: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"gram width must be >= 1, got $k")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def elementSchema: StructType =
    new StructType()
      .add("pos", LongType, nullable = false)
      .add("gram", StringType, nullable = false)

  override def prettyName: String = "char_grams_explode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_grams_explode requires STRING, got ${t.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) return Iterator.empty
    val len = text.numChars()
    val lastStart = if (cover) math.max(len - 1, 0) else len - k
    if (lastStart < 0) return Iterator.empty
    new Iterator[InternalRow] {
      private[this] var i = 0
      private[this] val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      override def hasNext: Boolean = i <= lastStart
      override def next(): InternalRow = {
        // substringSQL is 1-based and code-point-aware, like substr
        row.update(0, (i + 1).toLong)
        row.update(1, text.substringSQL(i + 1, k))
        i += stride
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramsExplode =
    copy(child = newChild)
}

object CharGramsExplode {
  /** `text: string` → one row per k-char window, `(pos, gram)`. */
  def char_grams_explode(text: Column, k: Int, stride: Int = 1,
      cover: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CharGramsExplode(ColumnBridge.expression(text), k, stride, cover))
  }
}
