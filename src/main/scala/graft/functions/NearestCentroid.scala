package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native coarse-quantizer assignment: nearest codebook centroid by
  * cosine, the codebook carried as a codegen reference object. The
  * join formulation (corpus × broadcast(codebook) → per-id argmax)
  * materializes n·k rows through an aggregate — at a √n codebook
  * that is n^1.5 ROWS of join machinery for n^1.5 FLOPs of real
  * work, and it is re-executed by every self-join branch downstream
  * (measured 2× on SemDeDup). This expression does the same argmax
  * as one scan-local loop per vector: n^1.5 flops, zero extra rows,
  * recompute-cheap — the shape a 100 TB coarse quantizer needs
  * (codebook broadcast as PLAIN DATA, assignment pure map).
  *
  * Semantics pinned to the join+max_by form (and the DuckDB oracle's
  * ROW_NUMBER OVER (ORDER BY cos DESC, cid)): cosine in the same
  * left-to-right double chain as [[DotProduct]], highest cos wins,
  * ties to the smallest centroid id (ascending-cid scan keeping only
  * on a strictly-greater comparison). ZERO NORMS ARE EXCLUDED, not
  * ranked: under ANSI mode (Spark 4's default) the join form THROWS
  * DIVIDE_BY_ZERO on a zero denominator, so "NaN sorts greatest"
  * semantics are unreachable there — the pinned contract is instead
  * that a zero-norm input vector yields NULL and zero-norm centroids
  * are skipped, mirroring `IvfFlat.assignTo`'s norm filters
  * (SemDedupSpec pins the parity). For NaN/±Inf cosines that survive
  * (overflowed dots), the comparison is `java.lang.Double.compare`,
  * not the primitive `>`: both Spark's struct ordering and DuckDB's
  * ORDER BY rank NaN above every other double, and a primitive `>`
  * would silently skip them. Null/empty vector or a dimension
  * mismatch with the codebook → NULL.
  *
  * Codebook fields are `IndexedSeq`s (structural equals/hashCode), so
  * two expressions built from the same collected codebook are
  * `semanticEquals` — keeping subexpression elimination and
  * exchange reuse alive; they are converted to primitive arrays once
  * per expression instance for the eval/codegen hot loop.
  */
case class NearestCentroid(child: Expression,
                           cidsSeq: IndexedSeq[Long],
                           cvsSeq: IndexedSeq[IndexedSeq[Double]],
                           cnsSeq: IndexedSeq[Double]) extends UnaryExpression {

  @transient private lazy val cids: Array[Long] = cidsSeq.toArray
  @transient private lazy val cvs: Array[Array[Double]] = cvsSeq.map(_.toArray).toArray
  @transient private lazy val cns: Array[Double] = cnsSeq.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires ARRAY<DOUBLE>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    NearestCentroid.assign(v, cids, cvs, cns)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("ncCids", cids, "long[]")
    val cvsRef = ctx.addReferenceObj("ncCvs", cvs, "double[][]")
    val cnsRef = ctx.addReferenceObj("ncCns", cns, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
        Long $res = graft.functions.NearestCentroid.assignBoxed(
          $c, $cidsRef, $cvsRef, $cnsRef);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $res.longValue(); }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Shared eval/codegen kernel: one tight pass over the codebook.
    * Returns null (boxed) on empty vector, empty codebook, null
    * element, dimension mismatch, or a ZERO-NORM vector; zero-norm
    * centroids are skipped (both exclusions mirror assignTo's norm
    * filters — ANSI mode would throw on their divisions). Surviving
    * NaN/±Inf cosines participate in the argmax under
    * `Double.compare` total order (NaN greatest) — matching Spark
    * struct ordering and DuckDB ORDER BY.
    */
  def assignBoxed(v: ArrayData, cids: Array[Long],
                  cvs: Array[Array[Double]], cns: Array[Double]): java.lang.Long = {
    val r = assign(v, cids, cvs, cns)
    if (r == null) null else java.lang.Long.valueOf(r.asInstanceOf[Long])
  }

  private[functions] def assign(v: ArrayData, cids: Array[Long],
                                cvs: Array[Array[Double]],
                                cns: Array[Double]): Any = {
    val n = v.numElements()
    if (n == 0 || cids.length == 0) return null
    var i = 0
    var sq = 0.0d
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      sq = sq + x * x
      i += 1
    }
    val nm = math.sqrt(sq)
    if (nm == 0.0d) return null
    var best = 0.0d
    var bestId = -1L
    var found = false
    var j = 0
    while (j < cids.length) {
      val cv = cvs(j)
      if (cv.length != n) return null
      if (cns(j) != 0.0d) { // zero-norm centroid: skipped, like assignTo's filter
        var dot = 0.0d
        var p = 0
        while (p < n) {
          dot = dot + v.getDouble(p) * cv(p)
          p += 1
        }
        val cos = dot / (nm * cns(j))
        // Double.compare strictly-greater on an ascending-cid scan =
        // smallest cid on ties (including all-NaN ties), NaN above every
        // finite/infinite value — matching max_by(struct(cos, -cid)) and
        // the oracle's ORDER BY cos DESC, cid in BOTH engines' NaN order
        if (!found || java.lang.Double.compare(cos, best) > 0) {
          best = cos; bestId = cids(j); found = true
        }
      }
      j += 1
    }
    if (!found) null else bestId
  }

  /** Column API: codebook rows as (cid, centroid, norm) triples —
    * callers pass `IvfFlat.codebook` output collected to the driver
    * (the same ≤ k·dim doubles a broadcast join would ship).
    */
  def nearest_centroid(vec: Column,
                       codebook: Seq[(Long, Array[Double], Double)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sorted = codebook.sortBy(_._1)
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(vec.cast("array<double>")),
      sorted.map(_._1).toIndexedSeq,
      sorted.map(_._2.toIndexedSeq).toIndexedSeq,
      sorted.map(_._3).toIndexedSeq))
  }
}
