package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSuite

/** The REAL decode tier: ImageIO-backed image decode + perceptual
  * dHash dedup, and the RIFF PCM16 parse. Fixtures are synthesized
  * in-test (BufferedImage → PNG/BMP bytes; WavCodec's own encoder),
  * so every assertion runs against genuine media bytes — no stub in
  * this path.
  */
class RealDecodeSpec extends SparkSuite {

  private def img(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, px(x, y))
    b
  }

  private def encode(b: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(b, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  private def gray(v: Int) = (v << 16) | (v << 8) | v

  // smooth horizontal gradient — dHash = all ascending bits
  private val base = img(64, 48)((x, _) => gray(x * 4))
  // same gradient, small bright square painted over 6×6 px (~1 cell)
  private val nearDup = img(64, 48)((x, y) =>
    if (x >= 20 && x < 26 && y >= 20 && y < 26) gray(255) else gray(x * 4))
  // reversed gradient with a checker — far from base
  private val far = img(64, 48)((x, y) =>
    if ((x / 8 + y / 8) % 2 == 0) gray(255 - x * 3) else gray(20))

  test("ImageCodec decodes PNG and BMP to identical pixels (lossless roundtrip)") {
    val fromPng = ImageCodec.decode(encode(base, "png")).get
    val fromBmp = ImageCodec.decode(encode(base, "bmp")).get
    assert(fromPng.getWidth === 64 && fromPng.getHeight === 48)
    assert(ImageCodec.dHash(fromPng) === ImageCodec.dHash(base))
    assert(ImageCodec.dHash(fromBmp) === ImageCodec.dHash(base))
    assert(ImageCodec.decode("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("dHash: near-dup within 4 bits, distinct image far beyond it") {
    val hBase = ImageCodec.dHash(base)
    val hNear = ImageCodec.dHash(nearDup)
    val hFar = ImageCodec.dHash(far)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hBase, hNear) <= 4,
      s"perturbed copy drifted ${ham(hBase, hNear)} bits")
    assert(ham(hBase, hFar) > 16,
      s"distinct image only ${ham(hBase, hFar)} bits away")
    // the gradient's hash is fully determined by integer arithmetic:
    // every horizontal neighbor ascends → all 64 bits set
    assert(hBase === -1L)
  }

  test("imageMeta decodes real bytes distributed; garbage degrades to null") {
    import spark.implicits._
    val rows = Seq(
      (1L, encode(base, "png")), (2L, encode(nearDup, "png")),
      (3L, encode(far, "bmp")), (4L, "garbage".getBytes("UTF-8")))
    val meta = Multimodal.imageMeta(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getInt(1) === 64 && meta(1L).getInt(2) === 48)
    assert(meta(1L).getLong(3) === ImageCodec.dHash(base))
    assert(meta(3L).getLong(3) === ImageCodec.dHash(far))
    assert(meta(4L).isNullAt(1) && meta(4L).isNullAt(3))
  }

  test("imageNearDup64 finds exactly the perceptual pair via banded Hamming join") {
    import spark.implicits._
    val rows = Seq(
      (1L, encode(base, "png")), (2L, encode(nearDup, "png")),
      (3L, encode(far, "bmp")), (4L, "garbage".getBytes("UTF-8")))
    val pairs = Multimodal.imageNearDup64(
        Multimodal.imageMeta(rows.toDF("media_id", "content")), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"expected only (1,2), got ${pairs.toSeq}")
    assert(pairs.head._3 <= 4)
  }

  test("pigeonhole recall: every ≤r-bit pair of 64-bit hashes shares a block") {
    // exhaustive-ish randomized check of the r+1-block guarantee the
    // banded join relies on, at the 64-bit width imageNearDup uses
    val rnd = new scala.util.Random(7)
    val maxHamming = 4
    val nBlocks = maxHamming + 1
    val blockBits = (64 + nBlocks - 1) / nBlocks
    for (_ <- 1 to 500) {
      val h = rnd.nextLong()
      val flips = rnd.nextInt(maxHamming + 1)
      val h2 = (1 to flips).foldLeft(h)((v, _) => v ^ (1L << rnd.nextInt(64)))
      val shared = (0 until nBlocks).exists { b =>
        ((h >>> (b * blockBits)) & ((1L << blockBits) - 1)) ==
          ((h2 >>> (b * blockBits)) & ((1L << blockBits) - 1))
      }
      assert(shared, f"no shared block for h=$h%x h2=$h2%x")
    }
  }

  test("WavCodec: encode → decode roundtrip, RMS, and audioMeta") {
    import spark.implicits._
    // deterministic triangle-ish wave, amplitude 10000
    val samples = Array.tabulate(4410)(i => ((i % 100 - 50) * 400).toShort)
    val bytes = WavCodec.encodePcm16(44100, samples)
    val Some((rate, ch, got)) = WavCodec.decodePcm16(bytes)
    assert(rate === 44100 && ch === 1)
    assert(got.toSeq === samples.toSeq)
    assert(WavCodec.decodePcm16("RIFFjunk".getBytes("UTF-8")).isEmpty)
    val rows = Seq((1L, bytes), (2L, "noise".getBytes("UTF-8")))
    val meta = Multimodal.audioMeta(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getInt(1) === 44100 && meta(1L).getLong(3) === 4410L)
    assert(meta(1L).getLong(4) === WavCodec.rms(samples))
    assert(meta(2L).isNullAt(1))
  }
}
