package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-process join mechanism (pygr pipes queries through
  * `blastall`/`megablast` subprocesses, `blast.py:86-413`; SURVEY.md
  * J8): each partition's rows stream through a command's stdin, its
  * stdout lines come back as rows. The native in-engine alternatives
  * for similarity search are `graft.dedup.MinHashLSH` and
  * `graft.similarity.CosineSim` — this exists for genuinely external
  * tools.
  */
object PipeJoin {

  /** Pipe a single-string-column DataFrame through `cmd`, one line
    * per row, returning a `line` column of stdout lines. Runs one
    * process per partition, executor-side.
    */
  def pipeLines(spark: SparkSession, df: DataFrame, cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    df.rdd.map(_.getString(0)).pipe(cmd).toDF("line")
  }
}
