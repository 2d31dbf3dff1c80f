package graft.operators

import scala.collection.mutable.ArrayBuffer

/** In-memory interval index over [start, end) intervals — the same
  * performance class as the reference's nested containment list
  * (pygr `intervaldb.c:222-479`: O(log N + k) probes) without its
  * sublist machinery: intervals sorted by start plus a prefix-max of
  * ends. A probe binary-searches the last start < qEnd, then walks
  * left while the prefix-max of ends still clears qStart — the
  * prefix-max prunes the walk exactly where the NCList's nesting
  * hoist would.
  *
  * Serializable; built once per key on the driver and broadcast
  * (see `IntervalJoin.broadcastIndexJoin`).
  */
class IntervalIndex private (starts: Array[Long], ends: Array[Long],
                             prefMaxEnd: Array[Long], payload: Array[Int])
    extends Serializable {

  def size: Int = starts.length

  /** Payload ids of all intervals overlapping [qs, qe). */
  def query(qs: Long, qe: Long): Seq[Int] = {
    if (starts.isEmpty || qe <= qs) return Nil
    // upper bound: first index with start >= qe
    var lo = 0; var hi = starts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (starts(mid) < qe) lo = mid + 1 else hi = mid
    }
    val out = ArrayBuffer.empty[Int]
    var i = lo - 1
    while (i >= 0 && prefMaxEnd(i) > qs) {
      if (ends(i) > qs) out += payload(i)
      i -= 1
    }
    out.reverse.toSeq
  }
}

object IntervalIndex {

  /** Build from (start, end, payloadId) triples. */
  def build(ivals: Seq[(Long, Long, Int)]): IntervalIndex = {
    val sorted = ivals.sortBy(t => (t._1, t._2)).toArray
    val starts = sorted.map(_._1)
    val ends = sorted.map(_._2)
    val pref = new Array[Long](sorted.length)
    var m = Long.MinValue
    var i = 0
    while (i < sorted.length) {
      m = math.max(m, ends(i)); pref(i) = m; i += 1
    }
    new IntervalIndex(starts, ends, pref, sorted.map(_._3))
  }
}
