package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the fixed per-micro-batch cost of a minimal stateful
  * streaming query — the number the whole st-family's wall rides on.
  * A trivial keyed count over MemoryStream is fed `batches` waves of
  * `rowsPerBatch` rows; per batch we print the durationMs breakdown
  * and the state operator's allUpdates/commit times, per
  * (provider x partitions x checkpoint volume) cell.
  *
  * Usage: runMain graft.tools.StreamCostProbe [cells...]
  *   cell = provider:partitions:ckptBase  e.g. rocksdb:8:/dev/shm
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    // cell = provider:partitions:ckptBase[:checksum(on|off)]
    val cells = (if (args.nonEmpty) args.toSeq else Seq(
      "hdfs:8:/dev/shm", "rocksdb:8:/dev/shm", "hdfs:2:/dev/shm",
      "hdfs:8:/tmp", "hdfs:32:/dev/shm"))
      .map { c =>
        val parts = c.split(":", 4)
        (parts(0), parts(1).toInt, parts(2),
          parts.length < 4 || parts(3) == "on")
      }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    for ((prov0, parts, base, checksum) <- cells) {
      val (prov, changelog) =
        if (prov0 == "rocksdbcl") ("rocksdb", true) else (prov0, false)
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        checksum.toString)
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog.toString)
      val provClass = prov match {
        case "hdfs" => "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
        case "rocksdb" => "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        case f => f
      }
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provClass)
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "probe_ckpt").toString
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = in.toDF().toDF("k", "v")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val name = "probe_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = out.writeStream.outputMode("complete").format("memory")
        .queryName(name).option("checkpointLocation", ckpt).start()
      val t0 = System.nanoTime()
      val nb = sys.env.getOrElse("PROBE_BATCHES", "5").toInt
      try {
        (0 until nb).foreach { b =>
          in.addData((0 until 1000).map(i => ((i % 100).toLong, b.toLong)))
          q.processAllAvailable()
        }
      } finally {
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"\n=== $prov parts=$parts ckpt=$base checksum=$checksum wall=$wall%.2f s ===")
        q.recentProgress.foreach { p =>
          val durs = {
            val it = p.durationMs.entrySet().iterator()
            val bld = Seq.newBuilder[String]
            while (it.hasNext) { val e = it.next(); bld += s"${e.getKey}=${e.getValue}" }
            bld.result().sorted.mkString(" ")
          }
          val st = Option(p.stateOperators).map(_.iterator.map(o =>
            s"upd=${o.allUpdatesTimeMs} commit=${o.commitTimeMs} rows=${o.numRowsTotal}")
            .mkString("|")).getOrElse("")
          println(s"  batch=${p.batchId} rows=${p.numInputRows} $durs [$st]")
        }
        q.stop()
      }
    }
    spark.stop()
  }
}
