package graft.multimodal

import java.awt.image.BufferedImage

import javax.imageio.stream.{ImageInputStreamImpl, ImageOutputStreamImpl}
import javax.imageio.{IIOImage, ImageIO, ImageReader, ImageWriter}

/** Per-partition reusable PNG encode/decode state for the image
  * kernels (m9/m10/m16/m17 shapes: synthesize pixels → PNG encode →
  * ImageIO decode → integer feature math).
  *
  * Why it exists: the one-shot path allocates a fresh BufferedImage
  * raster, ByteArrayOutputStream, ImageWriter, MemoryCache image
  * stream (8 KB block cache each side), ImageReader, AND a second
  * decoded raster PER ROW — at v2sf5 that churn reached 18–21% of
  * task CPU as GC on the image pair (DRIFT_r14 §3), the one measured
  * non-linearity left in the multimodal family. This class pins all
  * of them per PARTITION: the source canvas, a growable byte buffer
  * exposed as seekable ImageOutput/ImageInput streams (no block
  * cache), the PNG writer/reader instances, and the decode
  * destination raster (`ImageReadParam.setDestination` — the reader
  * fills the same raster every row). Pixel values are untouched:
  * every canvas pixel is rewritten per row by the caller, the
  * destination raster is fully overwritten by each decode, and
  * `grayGrid`/`dHash` read pixels through `getRGB`, which is
  * raster-layout-independent — hashes are bit-identical to the
  * one-shot path (PngSessionSpec pins the parity). The residual
  * per-row allocation is the JDK-internal Deflater/Inflater pair,
  * which the public ImageIO API cannot pool.
  *
  * NOT thread-safe — one instance per mapPartitions task, which is
  * single-threaded. Decode destination reuse assumes the stream of
  * images in one partition shares one (width, height, type); a
  * mismatch just reallocates (correct, unpooled).
  */
final class PngSession {
  ImageIO.setUseCache(false) // memory-backed streams (idempotent, JVM-global)

  /** Seekable in-memory ImageOutputStream over one growable pooled
    * buffer — replaces MemoryCacheImageOutputStream's per-instance
    * block cache. Seek/backpatch supported (writes land at streamPos). */
  private final class PooledImgOut extends ImageOutputStreamImpl {
    var buf = new Array[Byte](8192)
    var len = 0
    // flushedPos must reset too: it survives from the previous row and
    // the PNG writer seeks BACK to patch chunk lengths (ChunkStream
    // .finish) — a stale flushedPos rejects that seek
    def reset0(): Unit = { len = 0; streamPos = 0L; bitOffset = 0; flushedPos = 0L }
    private def ensure(cap: Int): Unit = if (cap > buf.length) {
      val nb = new Array[Byte](math.max(buf.length * 2, cap))
      System.arraycopy(buf, 0, nb, 0, len)
      buf = nb
    }
    override def write(b: Int): Unit = {
      val p = streamPos.toInt; ensure(p + 1)
      buf(p) = b.toByte; streamPos += 1; if (p + 1 > len) len = p + 1
    }
    override def write(b: Array[Byte], off: Int, l: Int): Unit = {
      val p = streamPos.toInt; ensure(p + l)
      System.arraycopy(b, off, buf, p, l)
      streamPos += l; if (p + l > len) len = p + l
    }
    override def read(): Int =
      if (streamPos >= len) -1
      else { val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    override def read(b: Array[Byte], off: Int, l: Int): Int =
      if (streamPos >= len) -1
      else {
        val n = math.min(l, len - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n); streamPos += n; n
      }
    override def length(): Long = len.toLong
  }

  /** Seekable in-memory ImageInputStream over a caller-provided
    * buffer — replaces MemoryCacheImageInputStream per decode. */
  private final class PooledImgIn extends ImageInputStreamImpl {
    private var buf: Array[Byte] = _
    private var len = 0
    def set(b: Array[Byte], l: Int): Unit =
      { buf = b; len = l; streamPos = 0L; bitOffset = 0; flushedPos = 0L }
    override def read(): Int =
      if (streamPos >= len) -1
      else { val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    override def read(b: Array[Byte], off: Int, l: Int): Int =
      if (streamPos >= len) -1
      else {
        val n = math.min(l, len - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n); streamPos += n; n
      }
    override def length(): Long = len.toLong
  }

  private val out = new PooledImgOut
  private val in = new PooledImgIn
  private val writer: ImageWriter =
    ImageIO.getImageWritersByFormatName("png").next()
  private val reader: ImageReader =
    ImageIO.getImageReadersByFormatName("png").next()
  private var canvasImg: BufferedImage = _
  private var dest: BufferedImage = _

  /** Reusable TYPE_INT_RGB source canvas. Callers must write EVERY
    * pixel before encoding (the kernels do — their pixel loops cover
    * the full grid). */
  def canvas(w: Int, h: Int): BufferedImage = {
    if (canvasImg == null || canvasImg.getWidth != w || canvasImg.getHeight != h)
      canvasImg = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    canvasImg
  }

  private def encode(img: BufferedImage): Unit = {
    out.reset0()
    writer.setOutput(out)
    try writer.write(null, new IIOImage(img, null, null), null)
    finally writer.setOutput(null)
  }

  /** PNG-encode to standalone bytes (when the bytes themselves are
    * the payload, e.g. a binary column write). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    encode(img)
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  private def decodePooled(): BufferedImage =
    try {
      reader.setInput(in, true, true)
      val w = reader.getWidth(0)
      val h = reader.getHeight(0)
      val param = reader.getDefaultReadParam
      if (dest == null || dest.getWidth != w || dest.getHeight != h) {
        val types = reader.getImageTypes(0)
        dest = if (types.hasNext) types.next().createBufferedImage(w, h) else null
      }
      if (dest != null) param.setDestination(dest)
      reader.read(0, param)
    } finally reader.setInput(null)

  /** Encode → decode round trip without materializing the byte array
    * (the m9/m16/m10/m17 kernels never keep the PNG bytes): the image
    * still passes through a complete in-memory PNG encode and a real
    * ImageIO decode, so the pixel path under test is unchanged. */
  def roundtrip(img: BufferedImage): BufferedImage = {
    encode(img)
    in.set(out.buf, out.len)
    decodePooled()
  }

  /** Pooled-destination PNG decode of standalone bytes; None when the
    * bytes are not decodable PNG (degrade to a row-level null, never
    * a task failure — same contract as ImageCodec.decode, which also
    * serves as the fallback for non-PNG media). */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try { in.set(bytes, bytes.length); Option(decodePooled()) }
    catch { case _: Exception => ImageCodec.decode(bytes) }
}
