package graft.streaming

import graft.SparkSuite

/** Structural audit of the state-store-provider choice in every
  * streaming gate query — the HOF-ban pattern applied to state stores
  * (VERDICT r13 #3). The convention it enforces used to live in the
  * author's head: stream-stream replays with churn-dominated,
  * horizon-bounded live state run the in-heap HDFS-backed provider
  * (RocksDB pays put-then-evict SST/tombstone churn that measured
  * 6.4× slower and superlinear — DRIFT_r13 §4); everything whose
  * state grows with the corpus stays on RocksDB (off-heap, no GC
  * bloat). A NEW streaming query silently inheriting the wrong
  * default now fails here with the A/B pointer instead of shipping.
  *
  * Thresholds (argued at the sf0.1 sweep scale, the same fixture the
  * published bench artifacts profile; all four numbers are DETERMINISTIC
  * replay properties — wave construction and watermark advancement fix
  * the per-batch state population):
  *
  *  - An IN-HEAP query must stay heap-safe: peak state ≤ 64 MB and
  *    ≤ 65 536 rows. The in-heap provider keeps each store's full
  *    keyed map on-heap (maps × `spark.sql.shuffle.partitions`
  *    stores), so the bound is what one executor can carry without
  *    GC pressure; the measured st5/st5b peak is 4.8 MB / ~20 k rows
  *    (one replay wave in flight before the watermark passes it), a
  *    13×/3× margin. A stream-stream join whose state is NOT
  *    horizon-bounded holds the whole history and lands orders of
  *    magnitude over both bounds at sf0.1.
  *  - A ROCKSDB query must have non-trivial state: peak ≥ 1 024 rows
  *    or ≥ 256 KB. The smallest genuine RocksDB profiles here are the
  *    sessionizers (1 500 open sessions / ~160 KB mid-run — key count
  *    grows with the corpus, so they are large-state at production
  *    scale even though the horizon evicts them by end-of-replay).
  *    Below both bounds the state fits in one hand and the RocksDB
  *    churn tax buys nothing — flip the replay to
  *    `StreamOps.smallStateProvider` and A/B it via
  *    `SPARK_GRAFT_STATE_STORE` before keeping either choice.
  *
  * Queries with no stateful operator (foreachBatch upserts st9/st9b)
  * record no observation and are exempt by construction.
  */
class StateProviderAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.1"

  private val inHeapMaxBytes = 64L << 20
  private val inHeapMaxRows = 65536L
  private val rocksMinRows = 1024L
  private val rocksMinBytes = 256L << 10

  test("every streaming replay's provider matches its observed state profile") {
    // an explicit SPARK_GRAFT_STATE_STORE run IS the A/B experiment —
    // the profile rule only governs the defaults
    assume(!sys.env.contains("SPARK_GRAFT_STATE_STORE"),
      "provider override active: profile audit only governs defaults")
    val offenders = Seq.newBuilder[String]
    var observed = 0
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if name.startsWith("st")) {
      StreamMeter.reset()
      fn(spark, dir).collect()
      for (o <- StreamMeter.observations) {
        observed += 1
        val inHeap = o.provider.contains("HDFSBackedStateStoreProvider")
        if (inHeap && (o.peakBytes > inHeapMaxBytes || o.peakRows > inHeapMaxRows))
          offenders += s"$name: in-heap provider with peak state " +
            s"${o.peakRows} rows / ${o.peakBytes} B — beyond the heap-safe " +
            "bound; move the replay to StreamOps.stateStoreProvider (RocksDB) " +
            "or justify with an A/B via SPARK_GRAFT_STATE_STORE"
        if (!inHeap && o.peakRows < rocksMinRows && o.peakBytes < rocksMinBytes)
          offenders += s"$name: RocksDB with trivially small state " +
            s"(peak ${o.peakRows} rows / ${o.peakBytes} B) — the put-then-" +
            "evict churn tax buys nothing here; try " +
            "StreamOps.smallStateProvider and A/B via SPARK_GRAFT_STATE_STORE"
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty, s"${bad.size} provider-profile offender(s):\n  " +
      bad.mkString("\n  "))
    // the sweep must actually see the streaming family: if the replay
    // sites stop calling StreamMeter.record inside replaySized, the
    // audit would pass vacuously
    assert(observed >= 10, s"only $observed state observations recorded — " +
      "replay sites must call StreamMeter.record inside replaySized")
  }
}
