package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Splice-graph constructions (pygr `apps/splicegraph.py:33-61`;
  * SURVEY.md A9): alongside the consecutive-exon edge build
  * (`a9_linegraph`), the reference derives two alternative-splicing
  * pair graphs per cluster — exons sharing the same genomic START
  * (alt5: alternative 5' donor usage) and exons sharing the same
  * genomic END (alt3: alternative 3' acceptor usage).
  *
  * Scale shape: both are equi-self-joins keyed on (cluster,
  * coordinate) — groups are per-position within one cluster, so the
  * join is bounded by local exon multiplicity, never by cluster or
  * genome size. (If a pathological position held thousands of exons,
  * `MotifQuery.sharedNeighbors` is the skew-safe pair generator to
  * reach for; biological positions don't.)
  */
object SpliceGraph {

  /** Directed-canonical alt pairs: one row per unordered pair of
    * distinct exons sharing the key coordinate, `kind` in
    * {alt5, alt3} (the reference stores both directions of each
    * pair; `e1 < e2` here carries the same information once).
    */
  def altPairs(exons: DataFrame, clusterCols: Seq[String],
               exonId: String, start: String, end: String): DataFrame = {
    def pairsOn(pos: String, kind: String): DataFrame = {
      val keyCols = clusterCols :+ pos
      val a = exons.select((keyCols :+ exonId).map(col): _*)
        .withColumnRenamed(exonId, "e1")
      val b = exons.select((keyCols :+ exonId).map(col): _*)
        .withColumnRenamed(exonId, "e2")
      a.join(b, keyCols)
        .where(col("e1") < col("e2"))
        .select((lit(kind).as("kind") +: clusterCols.map(col))
          :+ col(pos).as("pos") :+ col("e1") :+ col("e2"): _*)
    }
    pairsOn(start, "alt5").unionByName(pairsOn(end, "alt3"))
  }

  /** Splice edges: a splice (cluster, donor, acceptor) connects every
    * exon ending at `donor` to every exon starting at `acceptor`
    * (`splicegraph.py:20-33`). Output: cluster cols, splice_id, e1,
    * e2.
    */
  def spliceEdges(exons: DataFrame, splices: DataFrame,
                  clusterCols: Seq[String], exonId: String,
                  start: String, end: String,
                  spliceId: String, donor: String, acceptor: String): DataFrame = {
    val e1 = exons.select((clusterCols :+ end :+ exonId).map(col): _*)
      .withColumnRenamed(exonId, "e1").withColumnRenamed(end, donor)
    val e2 = exons.select((clusterCols :+ start :+ exonId).map(col): _*)
      .withColumnRenamed(exonId, "e2").withColumnRenamed(start, acceptor)
    splices
      .join(e1, clusterCols :+ donor)
      .join(e2, clusterCols :+ acceptor)
      .select((clusterCols.map(col) :+ col(spliceId) :+ col("e1") :+ col("e2")): _*)
  }
}
