package graft.tools

import graft.SparkEntry
import graft.core.Graft

/** Prints formatted physical plans for selected queries — the
  * plan-audit loop: check PushedFilters/ReadSchema on scans, broadcast
  * vs shuffle joins, and WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q3_join", "j1_interval_join", "j5_motif", "d2_minhash_lsh")
    val spark = Graft.session("graft-explain", 8)
    names.foreach { n =>
      println(s"\n=== $n ===")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
