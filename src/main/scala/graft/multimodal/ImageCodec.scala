package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** REAL image decode — no stub. The JDK's `java.desktop` module ships
  * ImageIO readers for PNG/BMP/GIF/JPEG, so pixel access needs no
  * external codec library. Everything downstream of `decode` is
  * integer arithmetic (exact, JVM-portable): ITU-R 601 luma in
  * thousandths, area-sum grayscale pooling with floor cell bounds,
  * and the 9×8-grid difference hash.
  *
  * Reference analog: pygr treats sequences as the only payload type;
  * this is the new-surface media path (SURVEY §2 multimodal), where
  * the binary column is a real image and near-duplicate detection
  * runs on perceptual hashes instead of shingles.
  */
object ImageCodec {

  // ImageIO's default stream cache backs every read/write with a TEMP
  // FILE — one file create+delete per image. Per-image decode cost
  // then grows with filesystem pressure instead of staying constant
  // (the r9 sf5 drift audit caught m10 drifting superlinear on
  // exactly this: 500k tmp-file round-trips from 32 threads). The
  // images here arrive as in-memory byte arrays; cache off makes the
  // stream memory-backed, which is the only sane mode executor-side.
  ImageIO.setUseCache(false)

  /** Decode image bytes via ImageIO; None for bytes no installed
    * reader accepts (undecodable media must degrade to a row-level
    * null, never a task failure). */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Integer luma in [0, 255000]: 299·R + 587·G + 114·B (ITU-R 601
    * coefficients in thousandths — exact, no float). */
  private def luma1000(argb: Int): Long = {
    val r = (argb >>> 16) & 0xff
    val g = (argb >>> 8) & 0xff
    val b = argb & 0xff
    299L * r + 587L * g + 114L * b
  }

  /** Area-average grayscale downsample to a gw×gh grid, row-major.
    * Cell (cy, cx) covers pixel rows [floor(cy·h/gh), floor((cy+1)·h/gh))
    * and the analogous columns; each cell value is the mean luma1000
    * over its pixels (integer division — deterministic). Images
    * smaller than the grid repeat boundary pixels (cells never empty:
    * bounds are clamped to at least one pixel). */
  def grayGrid(img: BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = (cy.toLong * h / gh).toInt
      val y1 = math.max((((cy + 1).toLong * h) / gh).toInt, y0 + 1)
      var cx = 0
      while (cx < gw) {
        val x0 = (cx.toLong * w / gw).toInt
        val x1 = math.max((((cx + 1).toLong * w) / gw).toInt, x0 + 1)
        var sum = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            sum += luma1000(img.getRGB(x, y)); n += 1; x += 1
          }
          y += 1
        }
        out(cy * gw + cx) = if (n == 0) 0L else sum / n
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash): 9×8 grayscale grid, one bit per
    * horizontal neighbor pair — bit (row r, col c) set iff
    * cell(r, c+1) > cell(r, c). Robust to rescaling, recompression,
    * brightness shifts (gradient SIGNS survive what absolute values
    * don't) — the standard cheap perceptual fingerprint; near-dup
    * images land within a small Hamming distance. */
  def dHash(img: BufferedImage): Long = {
    val g = grayGrid(img, 9, 8)
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c + 1) > g(r * 9 + c))
          h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** 128-bit difference hash (17×8 grid → 16 diffs × 8 rows) as two
    * longs — the AT-SCALE perceptual hash: the 64-bit dHash's 5-block
    * pigeonhole has 13-bit blocks whose random-collision candidate
    * mass grows as N²/2¹³ (the r9 drift audit measured m10's residual
    * exp 1.27 from exactly this); 128 bits give 26-bit blocks and
    * push the crossover past 10⁸ images. Bit b = row·16 + col; bits
    * land in h(0) for b < 63 and h(1) for 64 ≤ b < 127 (bits 63 and
    * 127 are dropped so both longs stay non-negative — the same
    * sign-bit convention as the 64-bit path's `& Long.MaxValue`,
    * which keeps every value and block extraction bit-identical in
    * integer SQL). Hamming distance = popcount(h0⊕h0')+popcount(h1⊕h1').
    */
  def dHash128(img: BufferedImage): Array[Long] = {
    val g = grayGrid(img, 17, 8)
    var h0 = 0L
    var h1 = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 16) {
        if (g(r * 17 + c + 1) > g(r * 17 + c)) {
          val b = r * 16 + c
          if (b < 63) h0 |= 1L << b
          else if (b >= 64 && b < 127) h1 |= 1L << (b - 64)
        }
        c += 1
      }
      r += 1
    }
    Array(h0, h1)
  }
}
