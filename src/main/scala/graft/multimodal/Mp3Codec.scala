package graft.multimodal

/** Compressed-audio METADATA extraction for MPEG-1 Layer III (MP3) —
  * frame-header parsing only, no payload decode (the header carries
  * everything an ingest pipeline shards and gates on: bitrate,
  * sample rate, frame count, duration). Like `Mp4Codec`, this is a
  * pure byte-format walk: each frame starts with an 11-bit sync word
  * and a 4-byte header whose bitrate/samplerate/padding fields
  * determine the FRAME LENGTH (⌊144·bitrate/samplerate⌋ + padding),
  * so stepping frame-to-frame exercises the full header arithmetic —
  * one wrong table entry or a broken size formula desynchronizes the
  * walk immediately.
  *
  * Constant-bitrate streams only (the fixture/ingest-audit shape);
  * VBR would report per-frame bitrates the same way.
  */
object Mp3Codec {

  /** MPEG-1 Layer III bitrate table, kbps, index 1–14. */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, Hz, index 0–2. */
  val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame: Int = 1152

  case class Mp3Meta(nFrames: Long, bitrateKbps: Int, sampleRateHz: Int,
                     nSamples: Long)

  /** Frame length in bytes for (bitrateIndex, sampleRateIndex,
    * padding). */
  def frameLen(bi: Int, si: Int, padding: Int): Int =
    (144 * (BitrateKbps(bi) * 1000) / SampleRateHz(si)) + padding

  /** Walk a constant-bitrate MPEG-1 Layer III stream from byte 0:
    * every frame must carry a valid sync + header and fit entirely in
    * the buffer; the stream must end exactly at a frame boundary.
    * None on any violation — a desynchronized walk fails loudly
    * rather than undercounting.
    */
  def parse(bytes: Array[Byte]): Option[Mp3Meta] = {
    var off = 0
    var n = 0L
    var bi0 = -1
    var si0 = -1
    while (off < bytes.length) {
      if (off + 4 > bytes.length) return None
      val b0 = bytes(off) & 0xff; val b1 = bytes(off + 1) & 0xff
      val b2 = bytes(off + 2) & 0xff
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None // sync
      if (((b1 >> 3) & 3) != 3) return None              // MPEG-1
      if (((b1 >> 1) & 3) != 1) return None              // Layer III
      val bi = (b2 >> 4) & 0xf
      val si = (b2 >> 2) & 3
      val pad = (b2 >> 1) & 1
      if (bi < 1 || bi > 14 || si > 2) return None
      if (bi0 < 0) { bi0 = bi; si0 = si }
      else if (bi != bi0 || si != si0) return None        // CBR only
      val len = frameLen(bi, si, pad)
      if (off + len > bytes.length) return None
      n += 1
      off += len
    }
    if (n == 0) None
    else Some(Mp3Meta(n, BitrateKbps(bi0), SampleRateHz(si0),
      n * SamplesPerFrame))
  }

  /** Canonical CBR frame bytes: `paddings(i)` gives frame i's padding
    * bit; bodies are zeroed (header-only metadata needs no payload).
    * The writer side of the roundtrip for fixtures and tests.
    */
  def encode(bi: Int, si: Int, paddings: Seq[Int]): Array[Byte] = {
    require(bi >= 1 && bi <= 14 && si >= 0 && si <= 2)
    val total = paddings.map(frameLen(bi, si, _)).sum
    val out = new Array[Byte](total)
    var off = 0
    paddings.foreach { pad =>
      out(off) = 0xff.toByte
      // sync(3) | MPEG-1 (11) | Layer III (01) | no CRC (1)
      out(off + 1) = 0xfb.toByte
      out(off + 2) = (((bi & 0xf) << 4) | ((si & 3) << 2) | ((pad & 1) << 1)).toByte
      out(off + 3) = 0xc0.toByte // mono
      off += frameLen(bi, si, pad)
    }
    out
  }
}
