package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.align.AlignmentStore

/** slice2hopMerged row shape for the sortmerge probe variant's
  * streaming fold (same columns as `AlignmentStore.mergeSeq`). */
case class MergedSpan(q_id: Long, dest_id: String, dest_ori: Int,
                      src_start: Long, src_end: Long,
                      dest_start: Long, dest_end: Long, n_blocks: Long)

/** A/B harness for the fused two-hop merge (round 15): measures one
  * (shape, variant, bin widths) combination per run, min task-CPU
  * over reps.
  *
  * shape  j2d — per-user sequences (merged groups ≈ pairs: the
  *              no-collapse regime) | j2e — 256 sequences, queries
  *              sampled %7 (multiplicity grows with SF)
  * variant fused      — slice2hopMerged pinned map-side (partial agg
  *                      below the exchange)
  *         preshuffle — repartition the pair stream by group key
  *                      first, aggregate reduce-side only (the r9
  *                      partial-agg-cliff remedy; measured dead heat
  *                      at v2sf1, candidate when groups ≈ pairs spill
  *                      the map-side hash at v2sf5)
  *         auto       — slice2hopMerged with the r16 lane-stats gate
  *                      (must reproduce fused on j2e, preshuffle on
  *                      j2d)
  *         sortmerge  — range-partition + sortWithinPartitions +
  *                      hand-rolled streaming fold, O(1) agg state
  *                      per task (VERDICT r15 #3: does trading hash
  *                      state for a sort beat preshuffle at sf10?)
  *         pairs      — raw slice2hop, no merge (cost floor)
  *         stats      — no query at all: print the gated store's
  *                      lane multiplicity and the placement the r16
  *                      auto gate chooses, then exit (the DRIFT_r16
  *                      §1 reproduction command)
  *
  * Usage: runMain graft.tools.TwoHopProbe [sfDir] [shape] [variant]
  *          [reps] [binWidth] [axisBinWidth]
  */
object TwoHopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/v2sf1")
    val shape = args.lift(1).getOrElse("j2d")
    val variant = args.lift(2).getOrElse("fused")
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val binWidth = args.lift(4).map(_.toLong).getOrElse(172800L)
    val axisBinWidth = args.lift(5).map(_.toLong).getOrElse(0L)
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
    val seqCol =
      if (shape == "j2e") concat(lit("u"), (col("user_id") % 256).cast("string"))
      else concat(lit("u"), col("user_id").cast("string"))
    val w = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("wnd_id"), col("tsec").as("ws"),
        (col("tsec") + lit(120L) + (col("event_id") % 10) * 60L).as("we"))
    val blocks = w.select(
      seqCol.as("src_id"),
      col("ws").as("src_start"), col("we").as("src_end"),
      concat(lit("d"), (col("wnd_id") % 20).cast("string")).as("dest_id"),
      ((col("wnd_id") % 500) * 1000L).as("dest_start"),
      ((col("wnd_id") % 500) * 1000L + (col("we") - col("ws"))).as("dest_end"),
      when(col("wnd_id") % 3 === 0, -1).otherwise(1).as("dest_ori"),
      col("wnd_id").as("block_id"))
    val store = new AlignmentStore(
      blocks.unionByName(new AlignmentStore(blocks).inverse.blocks))
    val qbase =
      if (shape == "j2e") ev.filter(col("user_id") % 7 === 0) else ev
    val queries = qbase.groupBy(col("user_id"))
      .agg(min(col("tsec")).as("t0"))
      .select(col("user_id").as("q_id"), seqCol.as("src_id"),
        (col("t0") + 5L * 86400L).as("q_start"),
        (col("t0") + 15L * 86400L).as("q_end"))

    def mk: DataFrame = variant match {
      case "fused" => store.slice2hopMerged(queries, binWidth, axisBinWidth,
        mapSideMerge = Some(true))
      case "preshuffle" => store.slice2hopMerged(queries, binWidth, axisBinWidth,
        mapSideMerge = Some(false))
      case "auto" => store.slice2hopMerged(queries, binWidth, axisBinWidth)
      case "sortmerge" =>
        // r16 probe (VERDICT r15 #3): range-partition the pair stream
        // by the group key, sort within partitions, stream-merge —
        // groups arrive contiguously so the fold keeps ONE open group
        // (O(1) state per task), trading j2d's ~60 GB total hash-agg
        // state for one sort of the pair stream the reduce-side plan
        // already ships. A range partitioning never splits a group
        // (all its rows share the full key). Hash agg would hold all
        // distinct groups per partition regardless of input order, so
        // the streaming fold is hand-rolled over the sorted iterator.
        import spark.implicits._
        store.slice2hop(queries, binWidth, axisBinWidth)
          .select(col("q_id"), col("dest_id"), col("dest_ori"),
            col("src_start"), col("src_end"),
            col("dest_start"), col("dest_end"))
          .repartitionByRange(col("q_id"), col("dest_id"), col("dest_ori"))
          .sortWithinPartitions("q_id", "dest_id", "dest_ori")
          .as[(Long, String, Int, Long, Long, Long, Long)]
          .mapPartitions { rows =>
            val buf = rows.buffered
            new Iterator[MergedSpan] {
              def hasNext: Boolean = buf.hasNext
              def next(): MergedSpan = {
                val (q, d, o, ss, se, ds, de) = buf.next()
                var mss = ss; var mse = se; var mds = ds; var mde = de
                var n = 1L
                while (buf.hasNext && {
                  val h = buf.head; h._1 == q && h._2 == d && h._3 == o
                }) {
                  val h = buf.next()
                  mss = math.min(mss, h._4); mse = math.max(mse, h._5)
                  mds = math.min(mds, h._6); mde = math.max(mde, h._7)
                  n += 1
                }
                MergedSpan(q, d, o, mss, mse, mds, mde, n)
              }
            }
          }.toDF()
      case "pairs" => store.slice2hop(queries, binWidth, axisBinWidth)
      case other => sys.error(s"unknown variant $other")
    }

    if (variant == "stats") {
      // reproduce the auto-gate statistic for this shape (DRIFT_r16
      // §1): blocks per distinct (src, dest, ori) lane on the same
      // store the gated query builds, plus the placement the gate
      // would choose at this scale
      val m = store.laneMultiplicity
      val side = if (m >= AlignmentStore.MinMapSideMergeLaneRows) "map" else "reduce"
      println(s"""{"shape":"$shape","variant":"stats","lane_multiplicity":$m,"auto_placement":"$side"}""")
      spark.stop(); return
    }
    var best = Double.MaxValue
    var spill = 0L
    var spillMem = 0L
    for (_ <- 1 to reps) {
      listener.snapshotAndReset()
      val n = mk.count()
      val snap = listener.snapshotAndReset()
      val cpu = snap.collectFirst { case ("task_cpu_ms", v) => v.toDouble }.getOrElse(-1.0)
      val sp = snap.collectFirst { case ("spill_disk_b", v) => v }.getOrElse(0L)
      val spm = snap.collectFirst { case ("spill_mem_b", v) => v }.getOrElse(0L)
      System.err.println(
        s"[probe] $shape/$variant rows=$n cpu_ms=$cpu spill_mem_b=$spm spill_disk_b=$sp")
      if (cpu < best) { best = cpu; spill = sp; spillMem = spm }
    }
    println(s"""{"shape":"$shape","variant":"$variant","binWidth":$binWidth,"axisBinWidth":$axisBinWidth,"min_cpu_ms":$best,"spill_mem_b":$spillMem,"spill_disk_b":$spill}""")
    spark.stop()
  }
}
