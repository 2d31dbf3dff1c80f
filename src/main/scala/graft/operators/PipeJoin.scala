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

  /** Keyed pipe: `df` is (key STRING, line STRING); each key's lines
    * stream through their OWN invocation of `cmd` and every stdout
    * line comes back tagged with the key — so callers re-associate
    * output with input even when the tool emits zero or many lines
    * per input (the reference's blast pipe keeps query ids through
    * the report for the same reason, `parse_blast.py:39-215`).
    * One process per key, executor-side, keys distributed across the
    * cluster.
    */
  def pipeLinesKeyed(spark: SparkSession, df: DataFrame, cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    df.rdd.map(r => (r.getString(0), r.getString(1)))
      .groupByKey()
      .flatMap { case (k, lines) =>
        import scala.sys.process._
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val io = new ProcessIO(
          in => {
            val w = new java.io.PrintWriter(in)
            lines.foreach(w.println)
            w.close()
          },
          o => {
            scala.io.Source.fromInputStream(o).getLines().foreach(out += _)
            o.close()
          },
          _.close())
        val exit = Process(cmd).run(io).exitValue()
        require(exit == 0, s"pipe command ${cmd.mkString(" ")} exited $exit for key $k")
        out.map(l => (k, l))
      }
      .toDF("key", "line")
  }
}
