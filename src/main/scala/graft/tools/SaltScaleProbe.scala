package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Salt

/** Auto-vs-explicit salted-join twin at scale (VERDICT r17 #7): runs
  * the x21 pipeline (events ⋈ derived event-type dim, shuffle-hash,
  * group aggregate) twice per rep — explicit buckets fixed at the
  * model's hand value, then `buckets = 0` (the full auto path
  * INCLUDING its plan-time sample job) — interleaved in one JVM so
  * the JIT state is shared, min over reps reported per variant. Also
  * reports the measured hot share, the auto-resolved bucket count
  * (must track `recommendBuckets(share, partitions)` at every SF),
  * and the sample job's own wall time (the amortization question:
  * the probe is one 1% scan + small agg, so its share of the query
  * must FALL as SF grows).
  *
  * Usage: runMain graft.tools.SaltScaleProbe [sfDir] [reps]
  * Prints one JSON line.
  */
object SaltScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/v2sf5")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "320")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dec = DecimalType(18, 2)

    def ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("event_id"), col("value").cast(dec).as("v"))
    def dim = ev.select("event_type").distinct()
      .withColumn("w", length(col("event_type")).cast("long"))

    def runJoin(buckets: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = Salt
        .saltedJoin(ev, dim.hint("shuffle_hash"), Seq("event_type"),
          col("event_id"), buckets = buckets)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("v") * col("w")).cast("double").as("weighted_value"))
        .collect()
      ((System.nanoTime() - t0) / 1e6, out.map(_.getLong(1)).sum)
    }

    // the model inputs, measured once up front (timed separately —
    // this is the exact plan-time cost the auto path pays per query)
    val t0 = System.nanoTime()
    val share = Salt.heavyHitterShare(ev, Seq("event_type"))
    val sampleMs = (System.nanoTime() - t0) / 1e6
    val modelB = Salt.recommendBuckets(share, parts.toInt)
    val autoB = Salt.autoBuckets(ev, Seq("event_type"))

    var explicitMin = Double.MaxValue
    var autoMin = Double.MaxValue
    var rows = 0L
    (0 until reps).foreach { _ =>
      val (te, re) = runJoin(modelB)
      val (ta, ra) = runJoin(0)
      require(re == ra, s"variant row counts diverged: $re vs $ra")
      rows = re
      explicitMin = math.min(explicitMin, te)
      autoMin = math.min(autoMin, ta)
    }
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("?")
    println(
      f"""{"probe":"salt_scale","sf":"$sf","partitions":$parts,"hot_share":$share%.4f,"model_buckets":$modelB,"auto_buckets":$autoB,"sample_ms":$sampleMs%.1f,"explicit_ms":$explicitMin%.1f,"auto_ms":$autoMin%.1f,"auto_over_explicit":${autoMin / explicitMin}%.3f,"joined_rows":$rows,"reps":$reps}""")
    spark.stop()
  }
}
