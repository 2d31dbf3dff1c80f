package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused universal-hash minhash over a token array — the per-ROW
  * signature kernel of the streaming near-dup path. One pass builds
  * each space-joined `shingleN`-gram, hashes it (md5 → first 60 bits →
  * mod P), and folds it into all k affine minima — value-identical to
  * the declarative form
  * `array_min(transform(transform(ngrams(toks,n), md5…), affine_i))`
  * per seed, which Spark evaluates with an INTERPRETED lambda
  * invocation per element per pass: (k+1) interpreted sweeps per row
  * (the d13-measured 27× trap; st8's engine CPU at sf1 was ~90%
  * exactly this). Shingle DEDUP is skipped on purpose: min over a
  * multiset equals min over its distinct set, so the values match
  * `signaturesU`'s distinct-shingle aggregation exactly.
  *
  * Returns NULL when the row has no shingles (fewer than `shingleN`
  * tokens) — callers filter `sig0 IS NOT NULL`, same as before.
  */
case class MinHashU(child: Expression, shingleN: Int,
                    seedsA: Seq[Long], seedsB: Seq[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_u"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_u requires ARRAY<STRING>, got ${t.sql}")
  }

  @transient private lazy val aArr = seedsA.toArray
  @transient private lazy val bArr = seedsB.toArray

  override protected def nullSafeEval(input: Any): Any =
    MinHashU.compute(input.asInstanceOf[ArrayData], shingleN, aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.functions.MinHashU.compute($c, $shingleN, $aRef, $bRef);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashU =
    copy(child = newChild)
}

object MinHashU {

  private val P = 1000000007L

  /** Shared eval/codegen kernel. Returns null for rows with no
    * shingles. */
  def compute(toks: ArrayData, n: Int, a: Array[Long], b: Array[Long]): ArrayData = {
    val nTok = toks.numElements()
    if (nTok < n) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= nTok - n) {
      sb.setLength(0)
      // concat_ws parity: a null token contributes neither text NOR its
      // separator — ['a', null, 'b'] joins to "a b", not "a  b".
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
      val h = (v >>> 4) % P
      var s = 0
      while (s < k) {
        val x = (a(s) * h + b(s)) % P
        if (x < mins(s)) mins(s) = x
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhash_u(toks: Column, shingleN: Int, seeds: Seq[(Long, Long)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashU(ColumnBridge.expression(toks), shingleN,
      seeds.map(_._1), seeds.map(_._2)))
  }
}
