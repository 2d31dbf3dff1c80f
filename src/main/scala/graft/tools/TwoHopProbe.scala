package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.align.AlignmentStore

/** A/B harness for the fused two-hop merge's aggregation placement
  * (round 15): on fixtures where merged groups ≈ pairs (per-pair
  * multiplicity ~1, the j2b shape) the map-side partial aggregate
  * hashes every pair into a near-pair-sized map for ~no collapse —
  * pure overhead. Variant B repartitions the pair stream by the group
  * key FIRST (one pair-sized exchange, rows only) and aggregates once
  * reduce-side. Variant A is the shipped slice2hopMerged (partial agg
  * below the exchange). Prints task-CPU ms for each, min over reps.
  *
  * Usage: runMain graft.tools.TwoHopProbe [sfDir] [reps]
  */
object TwoHopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/v2sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("tsec"))
    val w = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("wnd_id"), col("tsec").as("ws"),
        (col("tsec") + lit(120L) + (col("event_id") % 10) * 60L).as("we"))
    val blocks = w.select(
      concat(lit("u"), col("user_id").cast("string")).as("src_id"),
      col("ws").as("src_start"), col("we").as("src_end"),
      concat(lit("d"), (col("wnd_id") % 20).cast("string")).as("dest_id"),
      ((col("wnd_id") % 500) * 1000L).as("dest_start"),
      ((col("wnd_id") % 500) * 1000L + (col("we") - col("ws"))).as("dest_end"),
      when(col("wnd_id") % 3 === 0, -1).otherwise(1).as("dest_ori"),
      col("wnd_id").as("block_id"))
    val store = new AlignmentStore(
      blocks.unionByName(new AlignmentStore(blocks).inverse.blocks))
    val queries = ev.groupBy(col("user_id"))
      .agg(min(col("tsec")).as("t0"))
      .select(col("user_id").as("q_id"),
        concat(lit("u"), col("user_id").cast("string")).as("src_id"),
        (col("t0") + 5L * 86400L).as("q_start"),
        (col("t0") + 15L * 86400L).as("q_end"))

    def fused: DataFrame = store.slice2hopMerged(queries, binWidth = 172800L)
    def preShuffled: DataFrame = {
      val pairs = store.slice2hop(queries, binWidth = 172800L)
        .repartition(col("q_id"), col("dest_id"), col("dest_ori"))
      store.mergeSeq(pairs)
    }
    def measure(name: String, mk: => DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        listener.snapshotAndReset()
        val n = mk.count()
        val cpu = listener.snapshotAndReset()
          .collectFirst { case ("task_cpu_ms", v) => v.toDouble }.getOrElse(-1.0)
        System.err.println(s"[probe] $name rows=$n cpu_ms=$cpu")
        best = math.min(best, cpu)
      }
      println(s"$name min_cpu_ms=$best")
    }
    measure("fused_partial_agg", fused)
    measure("preshuffle_pairs", preShuffled)
    spark.stop()
  }
}
