package graft.props

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.multimodal.{ImageCodec, WavCodec}

/** Property tests for the real-decode kernels: arbitrary media in,
  * exact invariants out — no fixed fixtures, so the codecs hold on
  * inputs nobody thought to write down.
  */
object CodecProps extends Properties("graft.codec") {

  // --- WAV ---

  private val wavGen: Gen[(Int, Array[Short])] = for {
    rate <- Gen.choose(8000, 96000)
    n <- Gen.choose(0, 2000)
    samples <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
  } yield (rate, samples.map(_.toShort).toArray)

  property("WAV encode→decode is identity on rate and samples") =
    forAll(wavGen) { case (rate, samples) =>
      WavCodec.decodePcm16(WavCodec.encodePcm16(rate, samples)) match {
        case Some((r, ch, got)) =>
          r == rate && ch == 1 && got.toSeq == samples.toSeq
        case None => false
      }
    }

  property("WAV RMS is amplitude-monotone under doubling (no clip)") =
    forAll(Gen.listOf(Gen.choose(-8000, 8000))) { xs =>
      val s = xs.map(_.toShort).toArray
      val d = xs.map(x => (x * 2).toShort).toArray
      WavCodec.rms(d) >= WavCodec.rms(s)
    }

  // --- image ---

  private def img(w: Int, h: Int, px: Array[Int]): BufferedImage = {
    val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      val v = px(i)
      b.setRGB(i % w, i / w, (v << 16) | (v << 8) | v); i += 1
    }
    b
  }

  private val imgGen: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
    px <- Gen.listOfN(w * h, Gen.choose(0, 200))
  } yield (w, h, px.toArray)

  property("PNG encode→ImageIO decode→dHash equals the in-memory hash") =
    forAll(imgGen) { case (w, h, px) =>
      val b = img(w, h, px)
      val out = new ByteArrayOutputStream()
      ImageIO.write(b, "png", out)
      ImageCodec.decode(out.toByteArray) match {
        case Some(d) => ImageCodec.dHash(d) == ImageCodec.dHash(b)
        case None => false
      }
    }

  property("dHash is invariant under uniform brightness shift (no clip)") =
    forAll(imgGen, Gen.choose(1, 55)) { case ((w, h, px), d) =>
      // px capped at 200, shift ≤ 55 → never clips; strict > compares
      // of equal-shifted sums are unchanged
      ImageCodec.dHash(img(w, h, px.map(_ + d))) == ImageCodec.dHash(img(w, h, px))
    }

  property("constant image pools to identical cells and all-zero dHash") =
    forAll(Gen.choose(0, 255), Gen.choose(1, 30), Gen.choose(1, 30)) { (v, w, h) =>
      val b = img(w, h, Array.fill(w * h)(v))
      val g = ImageCodec.grayGrid(b, 9, 8)
      g.forall(_ == 1000L * v) && ImageCodec.dHash(b) == 0L
    }

  // --- MP4 / ISO-BMFF ---

  private val mp4Gen: Gen[(Long, Long, List[(Long, List[(Long, Long)])])] = for {
    mvTs <- Gen.choose(1L, 1000000L)
    mvDur <- Gen.choose(0L, 1000000L)
    nTracks <- Gen.choose(0, 4)
    tracks <- Gen.listOfN(nTracks, for {
      ts <- Gen.choose(1L, 1000000L)
      nEntries <- Gen.choose(1, 5)
      entries <- Gen.listOfN(nEntries,
        Gen.zip(Gen.choose(1L, 10000L), Gen.choose(1L, 10000L)))
    } yield (ts, entries))
  } yield (mvTs, mvDur, tracks)

  property("MP4 encode→parse is identity on movie/track metadata") =
    forAll(mp4Gen) { case (mvTs, mvDur, tracks) =>
      import graft.multimodal.Mp4Codec
      Mp4Codec.parse(Mp4Codec.encode(mvTs, mvDur, tracks)) match {
        case Some(meta) =>
          meta.timescale == mvTs && meta.duration == mvDur &&
            meta.tracks.length == tracks.length &&
            meta.tracks.zip(tracks).forall { case (got, (ts, es)) =>
              got.timescale == ts &&
                got.duration == es.map { case (c, d) => c * d }.sum &&
                got.nSamples == es.map(_._1).sum
            }
        case None => false
      }
    }

  property("MP4 parse rejects truncation at every prefix length") =
    forAll(mp4Gen) { case (mvTs, mvDur, tracks) =>
      import graft.multimodal.Mp4Codec
      val bytes = Mp4Codec.encode(mvTs, mvDur, tracks)
      // any cut INSIDE the moov box must fail loudly, not return a
      // silent partial parse (a box then overruns its parent)
      val cuts = Seq(bytes.length - 1, bytes.length - 5, 40)
      cuts.filter(c => c > 0 && c < bytes.length).forall { c =>
        Mp4Codec.parse(bytes.take(c)).isEmpty
      }
    }

  private val mp4SampleGen: Gen[(Long, Long, List[(Long, Long, List[Array[Byte]])])] =
    for {
      mvTs <- Gen.choose(1L, 1000000L)
      mvDur <- Gen.choose(0L, 1000000L)
      nTracks <- Gen.choose(1, 3)
      tracks <- Gen.listOfN(nTracks, for {
        ts <- Gen.choose(1L, 1000000L)
        delta <- Gen.choose(1L, 10000L)
        nSamples <- Gen.choose(0, 6)
        samples <- Gen.listOfN(nSamples,
          Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))
      } yield (ts, delta, samples))
    } yield (mvTs, mvDur, tracks)

  property("MP4 samples(encodeWithSamples) is byte-identity per track") =
    forAll(mp4SampleGen) { case (mvTs, mvDur, tracks) =>
      import graft.multimodal.Mp4Codec
      val bytes = Mp4Codec.encodeWithSamples(mvTs, mvDur, tracks)
      Mp4Codec.samples(bytes) match {
        case Some(got) =>
          got.length == tracks.length &&
            got.zip(tracks).forall { case (g, (_, _, want)) =>
              g.length == want.length &&
                g.zip(want).forall { case (a, b) => java.util.Arrays.equals(a, b) }
            }
        case None => false
      }
    }

  property("MP4 sample extraction rejects an mdat-truncating cut") =
    forAll(mp4SampleGen) { case (mvTs, mvDur, tracks) =>
      import graft.multimodal.Mp4Codec
      val bytes = Mp4Codec.encodeWithSamples(mvTs, mvDur, tracks)
      val total = tracks.map(_._3.map(_.length).sum).sum
      // cut into the LAST sample's bytes: the moov tree still parses
      // (metadata intact) but the computed range overruns the file —
      // extraction must return None, never a short slice
      total == 0 || Mp4Codec.samples(bytes.take(bytes.length - 1)).isEmpty
    }

  property("MP4 parse rejects a non-ftyp head") =
    forAll(mp4Gen) { case (mvTs, mvDur, tracks) =>
      import graft.multimodal.Mp4Codec
      val bytes = Mp4Codec.encode(mvTs, mvDur, tracks)
      bytes(4) = 'X'.toByte
      Mp4Codec.parse(bytes).isEmpty
    }

  // --- MP3 (MPEG-1 Layer III headers) ---

  private val mp3Gen: Gen[(Int, Int, List[Int])] = for {
    bi <- Gen.choose(1, 14)
    si <- Gen.choose(0, 2)
    n <- Gen.choose(1, 80)
    pads <- Gen.listOfN(n, Gen.choose(0, 1))
  } yield (bi, si, pads)

  property("MP3 encode→parse is identity on frame count / bitrate / rate") =
    forAll(mp3Gen) { case (bi, si, pads) =>
      import graft.multimodal.Mp3Codec
      Mp3Codec.parse(Mp3Codec.encode(bi, si, pads)) match {
        case Some(m) =>
          m.nFrames == pads.length &&
            m.bitrateKbps == Mp3Codec.BitrateKbps(bi) &&
            m.sampleRateHz == Mp3Codec.SampleRateHz(si) &&
            m.nSamples == pads.length.toLong * Mp3Codec.SamplesPerFrame
        case None => false
      }
    }

  property("MP3 parse rejects truncation mid-frame") =
    forAll(mp3Gen) { case (bi, si, pads) =>
      import graft.multimodal.Mp3Codec
      val bytes = Mp3Codec.encode(bi, si, pads)
      Mp3Codec.parse(bytes.take(bytes.length - 1)).isEmpty
    }

  property("MP3 parse rejects a corrupted sync word") =
    forAll(mp3Gen) { case (bi, si, pads) =>
      import graft.multimodal.Mp3Codec
      val bytes = Mp3Codec.encode(bi, si, pads)
      bytes(0) = 0x7f.toByte
      Mp3Codec.parse(bytes).isEmpty
    }
}
