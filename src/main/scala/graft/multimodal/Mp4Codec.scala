package graft.multimodal

/** REAL video-container metadata extraction for ISO-BMFF (MP4/MOV) —
  * a pure byte-format parse of the box tree, no codec library (the
  * container structure is plain length-prefixed boxes; only the
  * codec PAYLOAD would need a decoder, and payload decode is out of
  * sandbox scope the same way compressed audio is). This is the
  * metadata a 100 TB video-ingest pipeline gates and shards on —
  * duration, track count, frame count, frame rate — obtained
  * WITHOUT touching sample data, which is what makes the scan cheap:
  * `moov` is a few KB at the head or tail of a multi-GB file.
  *
  * Handles: u32-sized boxes, unknown-box skipping (`free`/`skip`/
  * anything else), container recursion (moov/trak/mdia/minf/stbl),
  * version-0 `mvhd`/`mdhd` (timescale, duration), and `stts`
  * (decoding time-to-sample: Σ counts = frame count, Σ count·delta
  * = media duration in timescale units). Malformed input — bad
  * ftyp, box overruns, sizes < 8 — yields None, never a crash or a
  * silent partial read.
  */
object Mp4Codec {

  /** One track's media header + sample-table summary. `sampleSizes`
    * and `chunkOffsets` are populated when the track carries stsz/stco
    * boxes (sample data present), empty for metadata-only tracks.
    */
  case class TrackMeta(timescale: Long, duration: Long, nSamples: Long,
                       sampleSizes: Seq[Long] = Nil,
                       chunkOffsets: Seq[Long] = Nil)

  /** Movie header + per-track metadata, in file order. */
  case class MovieMeta(timescale: Long, duration: Long, tracks: Seq[TrackMeta])

  private val containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Walk the box tree and collect movie/track metadata. None if the
    * bytes are not a plausible ISO-BMFF stream (no leading ftyp, a
    * box overrunning its parent, a size under 8).
    */
  def parse(bytes: Array[Byte]): Option[MovieMeta] = {
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 8 || tag(4) != "ftyp") return None
    var mvT = -1L; var mvD = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[TrackMeta]
    var curT = -1L; var curD = -1L; var curN = 0L
    var curSz: Seq[Long] = Nil; var curCo: Seq[Long] = Nil
    def walk(start: Int, end: Int): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val sz = u32(off)
        if (sz < 8L || off + sz > end) return false
        val id = tag(off + 4)
        val body = off + 8
        id match {
          case "trak" =>
            curT = -1L; curD = -1L; curN = 0L; curSz = Nil; curCo = Nil
            if (!walk(body, off + sz.toInt)) return false
            tracks += TrackMeta(curT, curD, curN, curSz, curCo)
          case c if containers(c) =>
            if (!walk(body, off + sz.toInt)) return false
          case "mvhd" if body + 20 <= end =>
            mvT = u32(body + 12); mvD = u32(body + 16)
          case "mdhd" if body + 20 <= end =>
            curT = u32(body + 12); curD = u32(body + 16)
          case "stts" if body + 8 <= end =>
            val n = u32(body + 4).toInt
            if (body + 8 + 8L * n > end) return false
            var i = 0; var tot = 0L
            while (i < n) { tot += u32(body + 8 + i * 8); i += 1 }
            curN = tot
          case "stsz" if body + 12 <= end =>
            // u32 version/flags, u32 uniform sample_size (0 = per-
            // sample entries follow), u32 sample_count
            val uniform = u32(body + 4)
            val n = u32(body + 8).toInt
            if (uniform != 0L) curSz = Seq.fill(n)(uniform)
            else {
              if (body + 12 + 4L * n > end) return false
              curSz = (0 until n).map(i => u32(body + 12 + i * 4))
            }
          case "stco" if body + 8 <= end =>
            val n = u32(body + 4).toInt
            if (body + 8 + 4L * n > end) return false
            curCo = (0 until n).map(i => u32(body + 8 + i * 4))
          case _ => () // unknown/leaf box: skip (free, skip, tkhd, mdat…)
        }
        off += sz.toInt
      }
      off == end || start == 0 // top level may end exactly; children must
    }
    if (!walk(0, bytes.length)) return None
    if (mvT <= 0) None else Some(MovieMeta(mvT, mvD, tracks.toSeq))
  }

  /** Canonical minimal MP4 bytes for the given movie/track metadata —
    * the writer side of the roundtrip (fixtures synthesize with it;
    * its layout is the spec-normal ftyp + free + moov(mvhd, trak(tkhd,
    * mdia(mdhd, minf(stbl(stts))))…) tree, so the parser is exercised
    * on realistic nesting and skippable boxes). Each track is
    * (mediaTimescale, stts entries as (sampleCount, sampleDelta));
    * mdhd duration is derived as Σ count·delta.
    */
  def encode(movieTimescale: Long, movieDuration: Long,
             tracks: Seq[(Long, Seq[(Long, Long)])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def p32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def p16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def ptag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def box(id: String)(bodyLen: Int)(body: => Unit): Unit = {
      p32(8L + bodyLen); ptag(id); body
    }
    // ftyp: isom, minor 512, compatible isom+mp42
    box("ftyp")(16) { ptag("isom"); p32(512L); ptag("isom"); ptag("mp42") }
    // a skippable free box — the walker must step over unknown leaves
    box("free")(4) { p32(0L) }
    def sttsLen(es: Seq[(Long, Long)]) = 8 + 8 * es.length
    def trakLen(es: Seq[(Long, Long)]) = {
      val stts = 8 + sttsLen(es)
      val stbl = 8 + stts
      val minf = 8 + stbl
      val mdhd = 8 + 24
      val mdia = 8 + mdhd + minf
      val tkhd = 8 + 84
      8 + tkhd + mdia
    }
    val moovBody = (8 + 100) + tracks.map { case (_, es) => trakLen(es) }.sum
    box("moov")(moovBody) {
      box("mvhd")(100) {
        p32(0L); p32(0L); p32(0L) // version/flags, creation, modification
        p32(movieTimescale); p32(movieDuration)
        p32(0x00010000L); p16(0x0100); p16(0) // rate, volume, reserved
        p32(0L); p32(0L)                      // reserved
        // identity matrix
        p32(0x00010000L); p32(0L); p32(0L)
        p32(0L); p32(0x00010000L); p32(0L)
        p32(0L); p32(0L); p32(0x40000000L)
        (1 to 6).foreach(_ => p32(0L))        // pre_defined
        p32(tracks.length + 1L)               // next_track_ID
      }
      tracks.zipWithIndex.foreach { case ((ts, es), ti) =>
        val mediaDur = es.foldLeft(0L) { case (a, (c, d)) => a + c * d }
        box("trak")(trakLen(es) - 8) {
          box("tkhd")(84) {
            p32(7L)                  // version 0, flags: enabled|in movie|in preview
            p32(0L); p32(0L)         // creation, modification
            p32(ti + 1L); p32(0L)    // track_ID, reserved
            p32(mediaDur)            // duration (movie timescale; informative)
            p32(0L); p32(0L)         // reserved
            p16(0); p16(0); p16(0); p16(0) // layer, alternate, volume, reserved
            p32(0x00010000L); p32(0L); p32(0L)
            p32(0L); p32(0x00010000L); p32(0L)
            p32(0L); p32(0L); p32(0x40000000L)
            p32(640L << 16); p32(480L << 16) // width, height (16.16)
          }
          box("mdia")(8 + 24 + 8 + 8 + 8 + sttsLen(es)) {
            box("mdhd")(24) {
              p32(0L); p32(0L); p32(0L)
              p32(ts); p32(mediaDur)
              p16(0x55c4); p16(0)   // language "und", pre_defined
            }
            box("minf")(8 + 8 + sttsLen(es)) {
              box("stbl")(8 + sttsLen(es)) {
                box("stts")(sttsLen(es)) {
                  p32(0L); p32(es.length.toLong)
                  es.foreach { case (c, d) => p32(c); p32(d) }
                }
              }
            }
          }
        }
      }
    }
    out.toByteArray
  }

  /** Per-track sample payloads, extracted through the parsed sample
    * tables — the FRAME-SAMPLE read a training-data pipeline runs
    * after the moov-only metadata gate: stsz gives each sample's
    * size, stco the chunk's absolute file offset, and the samples of
    * a chunk are laid contiguously. Single-chunk-per-track layouts
    * only (chunkOffsets.length == 1, the layout `encodeWithSamples`
    * writes and the common faststart small-file shape); multi-chunk
    * files would additionally need the stsc run-length map and yield
    * None here rather than a misaligned slice. Every computed range
    * is bounds-checked against the file — a corrupt offset/size
    * yields None, never a truncated or shifted payload.
    */
  def samples(bytes: Array[Byte]): Option[Seq[Seq[Array[Byte]]]] =
    parse(bytes).flatMap { meta =>
      val out = meta.tracks.map { t =>
        if (t.sampleSizes.isEmpty && t.chunkOffsets.isEmpty) Some(Nil)
        else if (t.chunkOffsets.length != 1) None
        else if (t.sampleSizes.length != t.nSamples) None
        else {
          var off = t.chunkOffsets.head
          val slices = t.sampleSizes.map { sz =>
            val o = off; off += sz
            if (o < 0 || sz < 0 || o + sz > bytes.length) null
            else java.util.Arrays.copyOfRange(bytes, o.toInt, (o + sz).toInt)
          }
          if (slices.contains(null)) None else Some(slices)
        }
      }
      if (out.contains(None)) None else Some(out.map(_.get))
    }

  /** `encode` extended with REAL sample data: each track is
    * (mediaTimescale, sampleDelta, samplePayloads) — one stts run
    * (n × delta), per-sample stsz entries, a one-entry stsc
    * (all samples in one chunk) and a one-entry stco whose absolute
    * offset is computed from the box layout, then a single mdat
    * carrying every track's samples contiguously in track order.
    * `samples(encodeWithSamples(...))` returns the payloads
    * byte-identically (property-checked in CodecProps); the m14
    * query's oracle reproduces the stco/stsz arithmetic — offset
    * 408 + 4n for a one-track file — in pure SQL, so a drift in ANY
    * box length desynchronizes the gate loudly.
    */
  def encodeWithSamples(movieTimescale: Long, movieDuration: Long,
                        tracks: Seq[(Long, Long, Seq[Array[Byte]])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def p32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def p16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def ptag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def box(id: String)(bodyLen: Int)(body: => Unit): Unit = {
      p32(8L + bodyLen); ptag(id); body
    }
    // per-track box lengths (n = sample count): stts one run
    def stblBody(n: Int) = 24 + (20 + 4 * n) + 28 + 20 // stts+stsz+stsc+stco boxes
    def trakBox(n: Int) = 8 + 92 + (8 + 32 + (8 + 8 + stblBody(n))) // tkhd+mdia(mdhd+minf(stbl))
    val moovBox = 8 + 108 + tracks.map(t => trakBox(t._3.length)).sum
    val mdatStart = 24 + 12 + moovBox // ftyp + free + moov
    // absolute chunk offsets: track data laid sequentially in mdat
    val chunkOffs = tracks.scanLeft(mdatStart + 8L) { case (o, (_, _, ss)) =>
      o + ss.map(_.length.toLong).sum
    }
    box("ftyp")(16) { ptag("isom"); p32(512L); ptag("isom"); ptag("mp42") }
    box("free")(4) { p32(0L) }
    box("moov")(moovBox - 8) {
      box("mvhd")(100) {
        p32(0L); p32(0L); p32(0L)
        p32(movieTimescale); p32(movieDuration)
        p32(0x00010000L); p16(0x0100); p16(0)
        p32(0L); p32(0L)
        p32(0x00010000L); p32(0L); p32(0L)
        p32(0L); p32(0x00010000L); p32(0L)
        p32(0L); p32(0L); p32(0x40000000L)
        (1 to 6).foreach(_ => p32(0L))
        p32(tracks.length + 1L)
      }
      tracks.zipWithIndex.foreach { case ((ts, delta, ss), ti) =>
        val n = ss.length
        val mediaDur = n.toLong * delta
        box("trak")(trakBox(n) - 8) {
          box("tkhd")(84) {
            p32(7L); p32(0L); p32(0L)
            p32(ti + 1L); p32(0L)
            p32(mediaDur)
            p32(0L); p32(0L)
            p16(0); p16(0); p16(0); p16(0)
            p32(0x00010000L); p32(0L); p32(0L)
            p32(0L); p32(0x00010000L); p32(0L)
            p32(0L); p32(0L); p32(0x40000000L)
            p32(640L << 16); p32(480L << 16)
          }
          box("mdia")(32 + (8 + 8 + stblBody(n))) {
            box("mdhd")(24) {
              p32(0L); p32(0L); p32(0L)
              p32(ts); p32(mediaDur)
              p16(0x55c4); p16(0)
            }
            box("minf")(8 + stblBody(n)) {
              box("stbl")(stblBody(n)) {
                box("stts")(16) {
                  p32(0L); p32(1L); p32(n.toLong); p32(delta)
                }
                box("stsz")(12 + 4 * n) {
                  p32(0L); p32(0L); p32(n.toLong)
                  ss.foreach(s => p32(s.length.toLong))
                }
                box("stsc")(20) {
                  p32(0L); p32(1L)
                  p32(1L); p32(n.toLong); p32(1L) // first_chunk, samples/chunk, desc idx
                }
                box("stco")(12) {
                  p32(0L); p32(1L); p32(chunkOffs(ti))
                }
              }
            }
          }
        }
      }
    }
    box("mdat")(tracks.map(_._3.map(_.length).sum).sum) {
      tracks.foreach(_._3.foreach(out.write))
    }
    val bytes = out.toByteArray
    assert(bytes.length >= mdatStart + 8, "mdat landed before its computed start")
    bytes
  }
}
