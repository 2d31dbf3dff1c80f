package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructType}

/** GENERATOR that emits the distinct word n-gram hashes of a token
  * array, one row per hash — the fused native form of
  * `explode(transform(shingles(toks, n), s -> conv(substr(md5(s),1,15),16,10) % p))`.
  *
  * Why a generator and not an array-returning expression + `explode`:
  * two measured taxes on the declarative chain, both per corpus row
  * (DRIFT_r12.md §3 and §8):
  *
  *  1. The HOF lambdas (`transform`, `filter`) are INTERPRETED per
  *     element — and, worse, per-element interpreted dispatch is
  *     profile-sensitive: identical d15 runs at v2sf10 measured 341 vs
  *     1075 task-CPU s with the plan, data, and conf byte-identical,
  *     the entire spread inside the one scan stage whose hot loop was
  *     the interpreted shingle chain (JIT inlining of megamorphic
  *     `Expression.eval` trees is a per-run lottery). The compiled
  *     kernel below is both ~an order of magnitude cheaper and stable
  *     run-to-run.
  *  2. `InferFiltersFromGenerate` guards `explode(e)` with
  *     `size(e) > 0 AND isnotnull(e)` and re-evaluates a non-trivial
  *     `e` per conjunct once predicate pushdown inlines it below the
  *     projection. The rule only fires for the built-in explode
  *     family, so a custom generator never grows the guard — its
  *     child here is a plain column, cheap under any guard.
  *
  * Hash parity: identical to [[MinHashU]]'s kernel (first 60 bits of
  * the md5 of the space-joined gram, mod `p`) — the exact arithmetic
  * the DuckDB oracles restate as `('0x' || substr(md5(sh),1,15))::BIGINT % p`.
  * Output hashes are per-row DISTINCT and ascending (sorted longs),
  * matching `array_distinct` up to md5 collisions, which a 60-bit
  * space makes negligible and every consumer (countDistinct /
  * set-membership joins) is insensitive to.
  *
  * Scale: this is a map-side, allocation-light kernel — no shuffle, no
  * boxed element churn; the only state is one MessageDigest and one
  * long buffer per row batch.
  */
case class ShingleHashExplode(child: Expression, n: Int, p: Long)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(p > 0, s"modulus must be positive, got $p")

  override def elementSchema: StructType =
    new StructType().add("h", LongType, nullable = false)

  override def prettyName: String = "shingle_hash_explode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_explode requires ARRAY<STRING>, got ${t.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val toks = child.eval(input).asInstanceOf[ArrayData]
    if (toks == null) return Iterator.empty
    val hs = ShingleHashExplode.distinctHashes(toks, n, p)
    if (hs == null) Iterator.empty
    else new Iterator[InternalRow] {
      private[this] var i = 0
      private[this] val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      override def hasNext: Boolean = i < hs.length
      override def next(): InternalRow = { row.update(0, hs(i)); i += 1; row }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExplode =
    copy(child = newChild)
}

/** POSITIONAL twin of [[ShingleHashExplode]] — one row per n-gram
  * WINDOW in token order, `(pos, h)` with `pos` 1-based and
  * multiplicity kept (no distinct, no sort): the window-hash shape of
  * exact-substring span dedup (Lee et al. 2022), where a hash
  * occurring twice anywhere in the corpus marks BOTH positions and
  * overlapping positions merge into spans. Replaces the interpreted
  * `explode(transform(sequence(1, len-W+1), i -> struct(i,
  * md5(concat_ws(slice(toks, i, W))))))` chain — the same per-element
  * HOF tax (and per-run JIT lottery) documented on
  * [[ShingleHashExplode]], paid on every corpus token. Hash parity:
  * the shared 60-bit-of-md5 kernel; with `p = 2^60` the modulus is
  * the identity and the DuckDB oracle restates the value exactly as
  * `('0x' || substr(md5(w), 1, 15))::BIGINT`.
  */
case class ShingleHashPosExplode(child: Expression, n: Int, p: Long)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(p > 0, s"modulus must be positive, got $p")

  override def elementSchema: StructType =
    new StructType()
      .add("pos", LongType, nullable = false)
      .add("h", LongType, nullable = false)

  override def prettyName: String = "shingle_hash_pos_explode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_pos_explode requires ARRAY<STRING>, got ${t.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val toks = child.eval(input).asInstanceOf[ArrayData]
    if (toks == null) return Iterator.empty
    val hs = ShingleHashExplode.positionalHashes(toks, n, p)
    if (hs == null) Iterator.empty
    else new Iterator[InternalRow] {
      private[this] var i = 0
      private[this] val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      override def hasNext: Boolean = i < hs.length
      override def next(): InternalRow = {
        row.update(0, (i + 1).toLong); row.update(1, hs(i)); i += 1; row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashPosExplode =
    copy(child = newChild)
}

object ShingleHashPosExplode {
  /** With this modulus the 60-bit kernel value passes through
    * unchanged — the oracle form needs no `%` at all. */
  val P60: Long = 1L << 60

  /** `toks: array<string>` → one row per window, columns
    * `(pos: long, h: long)`, pos 1-based, multiplicity kept. */
  def shingle_hash_pos_explode(toks: Column, n: Int, p: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleHashPosExplode(ColumnBridge.expression(toks), n, p))
  }
}

/** Array-returning twin of [[ShingleHashExplode]] — the distinct
  * n-gram hashes of a token array as a sorted `array<long>`, for
  * consumers that need the whole per-row SET (e.g.
  * [[graft.dedup.SetSimJoin]], whose pipeline pins, re-groups and
  * verifies sets rather than streaming elements). Same kernel, same
  * oracle arithmetic. Rows with fewer than `n` tokens return an EMPTY
  * array (mirroring `TextFunctions.shingles`' guard), so downstream
  * explodes drop them identically.
  */
case class ShingleHashes(child: Expression, n: Int, p: Long)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(p > 0, s"modulus must be positive, got $p")

  override def dataType: org.apache.spark.sql.types.DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires ARRAY<STRING>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = ShingleHashExplode.distinctHashes(input.asInstanceOf[ArrayData], n, p)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (hs == null) Array.emptyLongArray else hs)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.computeArray($c, $n, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Shared eval/codegen kernel (array form; never null). */
  def computeArray(toks: ArrayData, n: Int, p: Long)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val hs = ShingleHashExplode.distinctHashes(toks, n, p)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (hs == null) Array.emptyLongArray else hs)
  }

  /** `toks: array<string>` → sorted distinct n-gram hashes. */
  def shingle_hashes(toks: Column, n: Int, p: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(toks), n, p))
  }
}

object ShingleHashExplode {

  /** Per-window hashes of `toks` in POSITION order (index i → the
    * window starting at token i, 0-based; multiplicity kept); null
    * when the row has no windows. The one md5 kernel every shingle
    * consumer shares. */
  def positionalHashes(toks: ArrayData, n: Int, p: Long): Array[Long] = {
    val nTok = toks.numElements()
    if (nTok < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Long](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      sb.setLength(0)
      // concat_ws parity: a null token contributes neither text NOR
      // its separator — ['a', null, 'b'] joins to "a b", not "a  b".
      var appended = false
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        if (t != null) {
          if (appended) sb.append(' ')
          sb.append(t.toString)
          appended = true
        }
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = first 60 bits, as conv(substr(md5,1,15),16,10)
      var v = 0L
      var bi = 0
      while (bi < 8) { v = (v << 8) | (d(bi) & 0xffL); bi += 1 }
      out(i) = (v >>> 4) % p
      i += 1
    }
    out
  }

  /** Sorted distinct n-gram hashes of `toks`; null when the row has no
    * shingles. Shared with [[ShingleHashes]] (the array-returning
    * twin) and tested against the declarative chain in
    * `ShingleHashSpec`. */
  def distinctHashes(toks: ArrayData, n: Int, p: Long): Array[Long] = {
    val out = positionalHashes(toks, n, p)
    if (out == null) return null
    java.util.Arrays.sort(out)
    // in-place unique
    var w = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** `toks: array<string>` → one output row per distinct n-gram hash
    * (column `h: long`, ascending within a row's output). */
  def shingle_hash_explode(toks: Column, n: Int, p: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ShingleHashExplode(ColumnBridge.expression(toks), n, p))
  }
}
