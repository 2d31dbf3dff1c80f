package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQuery

/** Separates ENGINE time from HARNESS time in the streaming gate
  * queries. The st-family replays parquet fixtures through
  * MemoryStream (driver-side collect + wave construction + memory
  * sink) — that replay is test scaffolding, not engine work, and at
  * sf0.1 it is ~19% of the whole bench. Each replay site calls
  * `record(q)` before stopping its query; the micro-batch execution
  * time (`triggerExecution` from the query's progress events) is what
  * the ENGINE spent, and wall − engine = harness. Bench reads and
  * resets the accumulator around each query so the published numbers
  * carry a clean perf signal.
  */
object StreamMeter {
  private val engineNs = new AtomicLong(0L)
  private val stateRows = new AtomicLong(0L)
  private val stateBytes = new AtomicLong(0L)

  /** One recorded query's state profile: which provider it ran on and
    * how big its live state got. `peakRows` is the MAX across progress
    * events (the provider-choice signal — a sessionize that evicts
    * everything by end-of-replay still held its open sessions
    * mid-run); `lastRows`/`lastBytes` keep the end-of-replay
    * convention the bench artifacts publish.
    */
  case class StateObs(provider: String, peakRows: Long, peakBytes: Long,
                      lastRows: Long, lastBytes: Long)

  private val obsQ = new java.util.concurrent.ConcurrentLinkedQueue[StateObs]

  /** Per-query state observations since the last reset (one entry per
    * `record(q)` call whose query had stateful operators). */
  def observations: Seq[StateObs] = {
    val b = Seq.newBuilder[StateObs]
    obsQ.forEach(o => b += o)
    b.result()
  }

  def reset(): Unit = {
    engineNs.set(0L); stateRows.set(0L); stateBytes.set(0L); obsQ.clear()
  }

  /** Engine seconds accumulated since the last reset. */
  def engineSeconds: Double = engineNs.get() / 1e9

  /** Total state rows across the recorded queries' stateful operators,
    * read from each query's LAST progress event (the end-of-replay
    * state population). This is the 100 TB state-growth evidence: a
    * watermarked operator's figure is bounded by the horizon, an
    * unwatermarked one grows with the stream — the number shows which.
    */
  def stateRowsTotal: Long = stateRows.get()

  /** Total state-store memory bytes across recorded queries (same
    * last-progress convention as `stateRowsTotal`).
    */
  def stateBytesTotal: Long = stateBytes.get()

  /** Sum this query's micro-batch `triggerExecution` durations into the
    * accumulator. Call after the last `processAllAvailable()` (progress
    * events survive `stop()`, but recording before keeps the contract
    * obvious at the call site). `recentProgress` holds the last
    * `spark.sql.streaming.numRecentProgressUpdates` (default 100)
    * batches — every replay here feeds far fewer waves than that.
    */
  def record(q: StreamingQuery): Unit = {
    // SPARK_GRAFT_STREAM_DEBUG=1: dump every micro-batch's durationMs
    // breakdown (triggerExecution = addBatch + walCommit + planning +
    // state commit + ...) so engine seconds can be attributed to a
    // phase instead of guessed at. Diagnostic only — no timing effect
    // when unset.
    if (sys.env.get("SPARK_GRAFT_STREAM_DEBUG").contains("1")) {
      q.recentProgress.foreach { p =>
        val durs = {
          val it = p.durationMs.entrySet().iterator()
          val b = Seq.newBuilder[String]
          while (it.hasNext) { val e = it.next(); b += s"${e.getKey}=${e.getValue}" }
          b.result().sorted.mkString(" ")
        }
        val st = Option(p.stateOperators).map(_.iterator.map(o =>
          s"commit=${o.allUpdatesTimeMs}+${o.commitTimeMs}ms rows=${o.numRowsTotal}")
          .mkString(" | ")).getOrElse("")
        System.err.println(
          s"[stream-debug] ${p.name} batch=${p.batchId} rows=${p.numInputRows} $durs [$st]")
      }
    }
    val ms = q.recentProgress.iterator.map { p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
    }.sum
    engineNs.addAndGet(ms * 1000000L)
    // state sizes from the last progress that carries stateOperators —
    // the final batch's snapshot, i.e. end-of-replay state population
    q.recentProgress.reverseIterator
      .find(p => p.stateOperators != null && p.stateOperators.nonEmpty)
      .foreach { p =>
        val last = p.stateOperators.iterator.map(_.numRowsTotal).sum
        val lastB = p.stateOperators.iterator.map(_.memoryUsedBytes).sum
        stateRows.addAndGet(last)
        stateBytes.addAndGet(lastB)
        // the provider conf is still in force here: every replay calls
        // record(q) inside its replaySized wrapper, before the finally
        // restores the session conf
        val provider = q.sparkSession.conf.get(
          "spark.sql.streaming.stateStore.providerClass", "<default>")
        val withState = q.recentProgress.iterator
          .filter(r => r.stateOperators != null && r.stateOperators.nonEmpty)
          .map(r => (r.stateOperators.iterator.map(_.numRowsTotal).sum,
            r.stateOperators.iterator.map(_.memoryUsedBytes).sum)).toSeq
        val peak = withState.foldLeft(0L)((m, t) => math.max(m, t._1))
        val peakB = withState.foldLeft(0L)((m, t) => math.max(m, t._2))
        obsQ.add(StateObs(provider, peak, peakB, last, lastB))
      }
  }
}
