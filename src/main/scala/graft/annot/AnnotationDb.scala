package graft.annot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Intervals
import graft.operators.IntervalJoin
import graft.seq.SeqFunctions

/** Annotation database (pygr `annotation.py:141-397`; SURVEY.md §1.1,
  * J10): annotations are intervals ON a sequence with typed
  * attributes; negative orientation means the annotation reads the
  * reverse strand. Schema: (annot_id, annot_type, seq_id, start,
  * stop, ori).
  */
class AnnotationDb(val annots: DataFrame) {

  /** Annotations overlapping each query interval, clipped to it
    * (annotation↔sequence interval join, pygr `annotation.py:24-36`,
    * `cnestedlist.pyx:1702-1706`). queries: (q_id, seq_id, q_start,
    * q_end).
    */
  def sliceAnnotations(queries: DataFrame, binWidth: Long = 1 << 12): DataFrame =
    IntervalJoin.binned(annots, queries, Seq("seq_id"),
        "start", "stop", "q_start", "q_end", binWidth)
      .select(col("q_id"), col("seq_id"), col("annot_id"), col("annot_type"),
        Intervals.clipStart(col("start"), col("q_start")).as("c_start"),
        Intervals.clipEnd(col("stop"), col("q_end")).as("c_end"),
        col("ori"))

  /** Attach the annotated sequence text: forward slice for ori=+1,
    * reverse complement for ori=-1 (pygr re-encodes negative
    * orientation as negative coords, `annotation.py:226-231`; we keep
    * explicit ori). `seqs`: (seq_id, seq) with 0-based [start,stop)
    * slicing.
    */
  def withSequence(sliced: DataFrame, seqs: DataFrame,
                   startCol: String = "c_start", endCol: String = "c_end"): DataFrame = {
    val raw = sliced.join(seqs, "seq_id")
      .withColumn("__piece",
        col("seq").substr(col(startCol).cast("int") + 1,
          (col(endCol) - col(startCol)).cast("int")))
    raw.withColumn("aseq",
        when(col("ori") < 0, SeqFunctions.reverseComplement(col("__piece")))
          .otherwise(col("__piece")))
      .drop("seq", "__piece")
  }

  /** Translation annotations (pygr `TranslationAnnot`,
    * `annotation.py:108-126`): protein of the annotated slice.
    */
  def translated(withSeq: DataFrame): DataFrame =
    withSeq.withColumn("aa", SeqFunctions.translateCodons(col("aseq")))
}
