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
  * ties to the smallest centroid id (ascending-cid scan with a
  * strictly-greater keep). Null/empty vector, zero norm, or a
  * dimension mismatch with the codebook → NULL.
  */
case class NearestCentroid(child: Expression,
                           cids: Array[Long],
                           cvs: Array[Array[Double]],
                           cns: Array[Double]) extends UnaryExpression {

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
    * Returns null (boxed) on empty vector, zero norm, NaN cosines
    * throughout, or dimension mismatch.
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
    var best = Double.NegativeInfinity
    var bestId = -1L
    var found = false
    var j = 0
    while (j < cids.length) {
      val cv = cvs(j)
      if (cv.length != n) return null
      var dot = 0.0d
      var p = 0
      while (p < n) {
        dot = dot + v.getDouble(p) * cv(p)
        p += 1
      }
      val cos = dot / (nm * cns(j))
      // strictly-greater on an ascending-cid scan = smallest cid on
      // ties, matching max_by(struct(cos, -cid)) and the oracle's
      // ORDER BY cos DESC, cid
      if (cos > best) { best = cos; bestId = cids(j); found = true }
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
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, sorted.map(_._3).toArray))
  }
}
