package graft.multimodal

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** The pooled codec session must be bit-identical to the one-shot
  * path it replaces — the m9/m10/m16/m17 oracles hash every pixel-
  * derived value, so any raster-reuse contamination or codec-state
  * leak across rows fails the gate. This spec pins the parity
  * directly, including the cross-row reuse the pool exists for.
  */
class PngSessionSpec extends AnyFunSuite {

  private def synth(w: Int, h: Int, seed: Long): BufferedImage = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      md.reset()
      val v = md.digest(s"$seed:$x:$y".getBytes("UTF-8"))(0) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def oneShot(img: BufferedImage): BufferedImage = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    ImageCodec.decode(out.toByteArray).get
  }

  private def pixels(img: BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y)

  test("roundtrip is pixel-identical to the one-shot encode+decode across reused rows") {
    val sess = new PngSession
    // MANY rows through ONE session: destination-raster reuse must not
    // leak pixels between rows, and writer/reader state must reset
    for (seed <- 0L until 40L) {
      val src = synth(9, 8, seed)
      val viaPool = sess.roundtrip(src)
      val viaOneShot = oneShot(synth(9, 8, seed))
      assert(pixels(viaPool) === pixels(viaOneShot), s"pixel drift at seed $seed")
      assert(ImageCodec.dHash(viaPool) === ImageCodec.dHash(viaOneShot))
    }
  }

  test("canvas reuse with full overwrite matches fresh images; dims switch reallocates") {
    val sess = new PngSession
    // alternate dimensions (m9's 9x8 vs m17's 17x8) through one session
    for (seed <- 0L until 10L; (w, h) <- Seq((9, 8), (17, 8))) {
      val c = sess.canvas(w, h)
      val fresh = synth(w, h, seed)
      for (y <- 0 until h; x <- 0 until w) c.setRGB(x, y, fresh.getRGB(x, y))
      val got = sess.roundtrip(c)
      assert(pixels(got) === pixels(oneShot(fresh)), s"drift at $w x $h seed $seed")
    }
  }

  test("decode of standalone bytes matches ImageCodec.decode; junk degrades to None-equivalent") {
    val sess = new PngSession
    val img = synth(16, 12, 7L)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val bytes = out.toByteArray
    assert(sess.decode(bytes).map(pixels) === ImageCodec.decode(bytes).map(pixels))
    assert(sess.decode("not a png".getBytes("UTF-8")) === None)
  }
}
