package graft.sources

/** Shared scanner for gapped alignment text: decomposes a pair of
  * equal-length gapped strings into maximal ungapped 1:1 runs —
  * the normalization every alignment reader (MAF/axt/BLAST) applies
  * before emitting interval rows (the reference builds the same
  * ungapped `IntervalMap`s from its readers, SURVEY.md S4-S6).
  */
object GappedAlign {

  /** (srcOffset, dstOffset, length) runs in UNGAPPED coordinates of
    * each side; offsets count non-gap letters consumed before the run.
    */
  def ungappedRuns(a: String, b: String): Seq[(Long, Long, Long)] = {
    require(a.length == b.length,
      s"gapped strings differ in length: ${a.length} vs ${b.length}")
    val runs = Seq.newBuilder[(Long, Long, Long)]
    var ai = 0L; var bi = 0L
    var runA = -1L; var runB = -1L; var runLen = 0L
    var i = 0
    while (i < a.length) {
      val ga = a.charAt(i) == '-'
      val gb = b.charAt(i) == '-'
      if (!ga && !gb) {
        if (runLen == 0) { runA = ai; runB = bi }
        runLen += 1
      } else if (runLen > 0) {
        runs += ((runA, runB, runLen)); runLen = 0
      }
      if (!ga) ai += 1
      if (!gb) bi += 1
      i += 1
    }
    if (runLen > 0) runs += ((runA, runB, runLen))
    runs.result()
  }
}
