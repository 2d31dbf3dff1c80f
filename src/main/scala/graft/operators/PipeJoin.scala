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

  /** Keyed pipe: `df` is (key STRING, line STRING); stdin lines are
    * `key<sep>payload` and the command's contract is to emit
    * `key<sep>output` lines (any order, zero or many per input) — the
    * key travels THROUGH the tool, exactly how the reference's blast
    * pipe keeps query ids flowing through the report so output
    * re-associates with input (`parse_blast.py:39-215`).
    *
    * Scale design: ONE process per PARTITION (not per key — a corpus
    * with 10^5 keys spawns `numPartitions` processes, not 10^5), and
    * both directions stream lazily: `RDD.pipe` feeds stdin from a
    * separate writer thread and exposes stdout as an iterator, so a
    * key with 10^6 output lines never materializes in task heap.
    * Keys must not contain `sep` (tab by default).
    */
  def pipeLinesKeyed(spark: SparkSession, df: DataFrame, cmd: Seq[String],
                     sep: String = "\t"): DataFrame = {
    import spark.implicits._
    df.rdd.map { r =>
      val key = r.getString(0)
      // a key containing `sep` would be silently truncated at the
      // first separator on the way back — corrupting re-association
      // is worse than failing the task
      require(!key.contains(sep),
        s"pipeLinesKeyed: key '$key' contains the separator " +
          s"'${sep}'; choose a different sep")
      key + sep + r.getString(1)
    }
      .pipe(cmd)
      .map { l =>
        val i = l.indexOf(sep)
        require(i >= 0,
          s"pipe command ${cmd.mkString(" ")} emitted a line without the " +
            s"key separator (contract: key${sep}output): $l")
        (l.substring(0, i), l.substring(i + sep.length))
      }
      .toDF("key", "line")
  }
}
