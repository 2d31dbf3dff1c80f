package graft.multimodal

/** REAL audio decode for RIFF/WAVE PCM — a pure byte-format parse
  * (PCM is not compressed), so no codec library is involved at all.
  * Handles the canonical chunk layout: RIFF header, `fmt ` chunk
  * (PCM, format tag 1), any number of skippable chunks, `data`
  * chunk with 16-bit little-endian samples.
  */
object WavCodec {

  /** (sampleRate, nChannels, samples of channel 0) — None if the
    * bytes aren't a PCM16 WAV. */
  def decodePcm16(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def u16(o: Int) = ((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8))
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = 0; var channels = 0; var bits = 0
    var data: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = tag(off); val sz = u32(off + 4).toInt
      val body = off + 8
      id match {
        case "fmt " if body + 16 <= bytes.length =>
          if (u16(body) != 1) return None // PCM only
          channels = u16(body + 2)
          rate = u32(body + 4).toInt
          bits = u16(body + 14)
        case "data" if bits == 16 && channels > 0 =>
          val n = math.min(sz, bytes.length - body) / (2 * channels)
          data = new Array[Short](n)
          var i = 0
          while (i < n) { // channel 0 of each frame
            data(i) = u16(body + i * 2 * channels).toShort
            i += 1
          }
        case _ => ()
      }
      off = body + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate > 0 && data != null) Some((rate, channels, data)) else None
  }

  /** Integer RMS in amplitude units (floor of the true RMS): exact
    * given identical samples — the audio-quality scalar a pipeline
    * gates on (silence / clipping detection). */
  def rms(samples: Array[Short]): Long =
    if (samples.isEmpty) 0L
    else math.sqrt(samples.foldLeft(0L)((a, s) => a + s.toLong * s).toDouble
      / samples.length).toLong

  /** Canonical PCM16 WAV bytes for the given channel-0 samples —
    * the writer side of the roundtrip (tests synthesize fixtures
    * with it; a sink would use it unchanged). Mono. */
  def encodePcm16(rate: Int, samples: Array[Short]): Array[Byte] = {
    val n = samples.length * 2
    val out = new Array[Byte](44 + n)
    def put(o: Int, s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, o) }
    def p16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def p32(o: Int, v: Long): Unit = { var i = 0; while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 } }
    put(0, "RIFF"); p32(4, 36L + n); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1)
    p32(24, rate); p32(28, rate * 2L); p16(32, 2); p16(34, 16)
    put(36, "data"); p32(40, n)
    var i = 0
    while (i < samples.length) { p16(44 + i * 2, samples(i) & 0xffff); i += 1 }
    out
  }
}
