package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.StreamOps.{Ev, Session}

class StreamSpec extends SparkSuite {

  test("streaming tumbling window agg with watermark (memory source→sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.tumblingCounts(df, "ts", "event_type", 60L, Some("2 minutes"))
      .writeStream.outputMode("complete").format("memory").queryName("winagg").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    in.addData((t(10), "a", 1.0), (t(20), "a", 2.0), (t(70), "a", 4.0), (t(15), "b", 8.0))
    q.processAllAvailable()
    val got = spark.table("winagg")
      .select("wstart", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    q.stop()
    assert(got === Set((0L, "a", 2L, 3.0), (60L, "a", 1L, 4.0), (0L, "b", 1L, 8.0)))
  }

  test("stream-static interval join (point-in-window lookup)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val intervals = Seq(("u1", 10L, 20L), ("u1", 100L, 110L), ("u2", 0L, 5L))
      .toDF("key", "start", "end")
    val joined = StreamOps.pointInIntervalStream(
      in.toDF().toDF("key", "p"), intervals, "key", "p", "start", "end")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ptjoin").start()
    in.addData(("u1", 15L), ("u1", 50L), ("u1", 105L), ("u2", 4L), ("u2", 7L))
    q.processAllAvailable()
    val got = spark.table("ptjoin").select("key", "p", "start")
      .as[(String, Long, Long)].collect().toSet
    q.stop()
    assert(got === Set(("u1", 15L, 10L), ("u1", 105L, 100L), ("u2", 4L, 0L)))
  }

  test("streaming slice: msa[ival] over a stream of query windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the SAME AlignmentStore.slice call powers a readStream of query
    // intervals against the static store (stream-static inner join)
    val store = graft.align.AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 10L), ("b", 100L, 110L, 1)),
      (("a", 20L, 30L), ("c", 5L, 15L, -1))), bidirectional = false)
    val in = MemoryStream[(Long, String, Long, Long)]
    val queries = in.toDF().toDF("q_id", "src_id", "q_start", "q_end")
    val q = store.slice(queries, binWidth = 16L)
      .writeStream.outputMode("append").format("memory").queryName("slices").start()
    in.addData((1L, "a", 5L, 25L), (2L, "a", 50L, 60L))
    q.processAllAvailable()
    val got = spark.table("slices")
      .select("q_id", "src_start", "src_end", "dest_id", "dest_start", "dest_end")
      .as[(Long, Long, Long, String, Long, Long)].collect().toSet
    q.stop()
    // q1 clips both blocks ([5,10) fwd; [20,25) reverse trims the LOW end)
    assert(got === Set(
      (1L, 5L, 10L, "b", 105L, 110L),
      (1L, 20L, 25L, "c", 10L, 15L)))
  }

  test("streaming exact dedup drops repeated content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.dedupeByContent(df, "ts", "text", "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    in.addData((t(10), 1L, "hello world"), (t(11), 2L, "hello world"),
               (t(12), 3L, "different doc"))
    q.processAllAvailable()
    in.addData((t(20), 4L, "hello world"), (t(21), 5L, "third doc"))
    q.processAllAvailable()
    val got = spark.table("dedup").select("doc_id").as[Long].collect().toSet
    q.stop()
    // 2 (same batch dup) and 4 (cross-batch dup within watermark) drop
    assert(got === Set(1L, 3L, 5L))
  }

  test("streaming NEAR-dup drops fingerprint-equal edits, keeps distinct docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.dedupeByFingerprint(df, "ts", "text", shingleN = 3,
        watermark = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("neardup").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // doc 2 is doc 1 with a trailing addition: the min-shingle-hash
    // fingerprint is unchanged (the new shingles hash higher here),
    // so it collapses; doc 3 shares no shingles and survives
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    in.addData((t(10), 1L, base),
               (t(11), 2L, base + " iota"),
               (t(12), 3L, "one two three four five six"))
    q.processAllAvailable()
    val got = spark.table("neardup").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got.contains(1L) && got.contains(3L) && !got.contains(2L))
  }

  test("stateful gap sessionizer closes sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamOps.sessionize(in.toDS(), gapSec = 100L, timeoutMs = -1L)
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    in.addData(Ev(1, 0), Ev(1, 50), Ev(1, 400), Ev(2, 10))
    q.processAllAvailable()
    // session [0,50] closed by the 400 event (gap > 100)
    val afterBatch = spark.table("sess").as[Session].collect().toSet
    assert(afterBatch === Set(Session(1, 0, 50, 2)))
    // flush sentinels close the remaining open sessions deterministically
    in.addData(Ev(1, StreamOps.FlushAt), Ev(2, StreamOps.FlushAt))
    q.processAllAvailable()
    val afterFlush = spark.table("sess").as[Session].collect().toSet
    q.stop()
    assert(afterFlush === Set(
      Session(1, 0, 50, 2), Session(1, 400, 400, 1), Session(2, 10, 10, 1)))
  }

  test("streaming LSH near-dup candidates match the batch banded-minhash pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val edited = base.replace("word20", "CHANGED")
    val unrelated = (100 to 140).map(i => s"zzz$i").mkString(" ")
    val docsSeq = Seq((1L, base), (2L, edited), (3L, unrelated))

    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.neardupCandidatesStream(df, "ts", "doc_id", "text",
        k = 8, bands = 4, shingleN = 2, watermark = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("lshnd").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // rep arrives in batch 1; dup + unrelated in batch 2 (cross-batch state)
    in.addData((t(10), 1L, base))
    q.processAllAvailable()
    in.addData((t(20), 2L, edited), (t(21), 3L, unrelated))
    q.processAllAvailable()
    val hits = spark.table("lshnd")
      .select("first_doc", "dup_doc").distinct()
      .as[(Long, Long)].collect().toSet
    q.stop()

    // batch reference: same k/bands/shingleN over the same docs
    import graft.dedup.MinHashLSH
    import graft.text.TextFunctions
    val docs = docsSeq.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    // U family: the same hash family the stream path runs
    // (signatureExprsU ≡ signaturesU value-for-value)
    val batchPairs = MinHashLSH.candidatePairs(
        MinHashLSH.bandBucketsU(
          MinHashLSH.signaturesU(docs, "doc_id", "toks", 8, 2), "doc_id", 8, 4),
        "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((1L, 2L)), s"batch found $batchPairs")
    assert(hits === batchPairs, s"stream hits $hits != batch $batchPairs")
  }

  test("stream-stream interval join equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cin = MemoryStream[(Long, Long, Long)]
    val pin = MemoryStream[(Long, Long, Long)]
    val clicks = cin.toDF().toDF("click_id", "user_id", "c_t")
      .withColumn("c_ts", col("c_t").cast("timestamp"))
    val purchases = pin.toDF().toDF("purchase_id", "user_id", "p_t")
      .withColumn("p_ts", col("p_t").cast("timestamp"))
    val q = StreamOps.intervalJoinStreams(
        clicks, purchases, "user_id", "c_ts", "p_ts", "10 minutes", 60L)
      .select("click_id", "purchase_id")
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    // user 1: purchase at 100 → clicks at 100 (match), 159 (match), 160 (out)
    // user 2: click before any purchase (no match); cross-user no match
    cin.addData((11L, 1L, 100L), (12L, 1L, 159L), (13L, 1L, 160L), (21L, 2L, 50L))
    pin.addData((91L, 1L, 100L), (92L, 2L, 70L))
    q.processAllAvailable()
    val got = spark.table("ssj").as[(Long, Long)].collect().toSet
    q.stop()
    assert(got === Set((11L, 91L), (12L, 91L)))
  }

  test("per-row signatureExprs equals the aggregated signatures") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta zeta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.text.TextFunctions.tokens(col("text")).as("toks"))
    import graft.dedup.MinHashLSH
    val agg = MinHashLSH.signatures(docs, "doc_id", "toks", k = 8, shingleN = 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = MinHashLSH.signatureExprs(docs, "toks", k = 8, shingleN = 2)
      .select("doc_id", (0 until 8).map(i => s"sig$i"): _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(agg === perRow)
  }
}
