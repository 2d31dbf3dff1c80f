package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark side — schema, partitioned
  * batch decode via mapPartitions, feature/frame row shapes — is real
  * and tested. Decode comes in two tiers:
  *
  *  - REAL decoders for formats the JVM covers without external
  *    libraries: `ImageCodec` (PNG/BMP/GIF/JPEG via the JDK's
  *    ImageIO) feeding `imageMeta`/`imageNearDup` (perceptual-hash
  *    image dedup), and `WavCodec` (RIFF PCM16 byte parse) feeding
  *    `audioMeta`.
  *  - `stubDecode`, a clearly-marked deterministic md5-seeded STUB,
  *    kept for the oracle-gated m1/m2 queries whose fixture bytes are
  *    arbitrary (not valid media) — DuckDB can replay md5, not a
  *    pixel decode. Compressed-video codecs stay out of scope (no
  *    libs in this environment); `sampleFrames` is the plumbing a
  *    real one would slot into.
  */
object Multimodal {

  /** Metadata columns every media table carries. */
  def withMeta(df: DataFrame, binCol: String, kindCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("content_hash", md5(col(binCol)))

  /** STUB decoder: deterministic pseudo-features from the byte
    * content (md5-seeded), shaped like an embedding. A real
    * implementation would decode pixels/samples here.
    */
  def stubDecode(dims: Int)(bytes: Array[Byte]): Array[Float] = {
    val md = MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(dims) { i =>
      val b = md(i % md.length) & 0xff
      (b - 128) / 128.0f
    }
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Batch feature extraction: decode runs once per row inside
    * mapPartitions (batched per task, no per-row UDF serialization),
    * preserving partitioning of the input. df: (media_id LONG,
    * content BINARY).
    */
  def extractFeatures(df: DataFrame, dims: Int = 8,
                      decode: Array[Byte] => Array[Float] = null): DataFrame = {
    val dec = Option(decode).getOrElse(stubDecode(dims) _)
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    df.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r => Row(r.getLong(0), dec(r.getAs[Array[Byte]](1))) }
      }(enc)
  }

  private val imgMetaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("dhash", LongType)))

  /** REAL image decode: (media_id, width, height, dhash) via
    * ImageIO inside mapPartitions — one decoder per task, no per-row
    * UDF serialization, input partitioning preserved. Undecodable
    * bytes yield null dims/dhash (a bad object must cost one null
    * row, never a task retry storm). df: (media_id LONG, content
    * BINARY). */
  def imageMeta(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imgMetaSchema)
    df.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          ImageCodec.decode(r.getAs[Array[Byte]](1)) match {
            case Some(img) =>
              Row(r.getLong(0), img.getWidth, img.getHeight, ImageCodec.dHash(img))
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }(enc)
  }

  /** Near-duplicate image pairs — THE API DEFAULT routes to the
    * 128-bit dHash path ([[imageNearDup128]], columns h0/h1 from
    * `ImageCodec.dHash128`): at corpus scale the 64-bit variant's
    * 13-bit pigeonhole blocks admit ≈5·N²/2¹³ random cross-collision
    * candidates (measured cpu_exp 1.27 at sf10), while the five
    * 26-bit blocks keep the collision term negligible AND cost less
    * at sf10. Use [[imageNearDup64]] only for legacy single-LONG
    * `dhash` metadata. */
  def imageNearDup(meta: DataFrame, maxHamming: Int = 4): DataFrame =
    imageNearDup128(meta, maxHamming)

  /** LEGACY 64-bit near-dup within `maxHamming` bits of the single
    * `dhash` column — the d5 pigeonhole guarantee on the 64-bit
    * perceptual hash: r+1 blocks mean any pair ≤ r bits apart shares
    * at least one block untouched by the differing bits, so the
    * banded equi-join on (block_no, block_value) has GUARANTEED
    * recall; per-block work is bounded by bucket population, never
    * all-pairs. Kept for pre-dHash128 metadata: its 13-bit blocks
    * saturate past ~10⁶ images (quadratic collision term), so new
    * pipelines should produce h0/h1 and take [[imageNearDup]]. Emits
    * (media_a < media_b, hamming). */
  def imageNearDup64(meta: DataFrame, maxHamming: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64)
    val nBlocks = maxHamming + 1
    val blockBits = (64 + nBlocks - 1) / nBlocks
    val keyed = meta.where(col("dhash").isNotNull)
      .select(col("media_id"), col("dhash"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("block_no"))
      .withColumn("block_val",
        expr(s"shiftrightunsigned(dhash, block_no * $blockBits)")
          .bitwiseAND(lit((1L << blockBits) - 1)))
    val a = keyed.select(col("block_no"), col("block_val"),
      col("media_id").as("media_a"), col("dhash").as("ha"))
    val b = keyed.select(col("block_no"), col("block_val"),
      col("media_id").as("media_b"), col("dhash").as("hb"))
    a.join(b, Seq("block_no", "block_val"))
      .where(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Near-duplicate pairs on the 128-BIT dHash (`ImageCodec.dHash128`
    * columns h0/h1) — the scale path past ~10⁶ images: the 64-bit
    * variant's 13-bit pigeonhole blocks collide randomly at N²/2¹³
    * pairs (measured residual drift exp 1.27 at sf10); five 26-bit
    * blocks over the 126 kept bits push that term below any realistic
    * corpus. Block i covers logical bits [26i, 26i+26) of the (h1:h0)
    * 63+63-bit vector; block 2 spans the h0/h1 boundary (11 bits of
    * h0, 15 of h1), block 4 has 22. Any pair within `maxHamming` ≤ 4
    * bits shares ≥ 1 untouched block (r+1 pigeonhole), so recall is a
    * guarantee, not a heuristic. Emits (media_a < media_b, hamming).
    */
  def imageNearDup128(meta: DataFrame, maxHamming: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 4,
      "imageNearDup128 blocks are laid out for the 5-block maxHamming<=4 guarantee")
    val m = (w: Int) => lit((1L << w) - 1L)
    val blocks = Seq(
      expr("h0").bitwiseAND(m(26)),
      expr("shiftrightunsigned(h0, 26)").bitwiseAND(m(26)),
      expr("shiftrightunsigned(h0, 52)").bitwiseAND(m(11))
        .bitwiseOR(shiftleft(col("h1").bitwiseAND(m(15)), 11)),
      expr("shiftrightunsigned(h1, 15)").bitwiseAND(m(26)),
      expr("shiftrightunsigned(h1, 41)").bitwiseAND(m(22)))
    val keyed = meta.where(col("h0").isNotNull && col("h1").isNotNull)
      .select(col("media_id"), col("h0"), col("h1"),
        posexplode(array(blocks: _*)).as(Seq("block_no", "block_val")))
    val a = keyed.select(col("block_no"), col("block_val"),
      col("media_id").as("media_a"), col("h0").as("a0"), col("h1").as("a1"))
    val b = keyed.select(col("block_no"), col("block_val"),
      col("media_id").as("media_b"), col("h0").as("b0"), col("h1").as("b1"))
    a.join(b, Seq("block_no", "block_val"))
      .where(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        (bit_count(col("a0").bitwiseXOR(col("b0"))) +
         bit_count(col("a1").bitwiseXOR(col("b1")))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  private val audioMetaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("rms", LongType)))

  /** REAL audio decode: (media_id, sample_rate, n_channels,
    * n_samples, rms) from RIFF PCM16 bytes — the silence/clipping
    * quality gate for audio corpora. Non-WAV bytes → null fields. */
  def audioMeta(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioMetaSchema)
    df.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          WavCodec.decodePcm16(r.getAs[Array[Byte]](1)) match {
            case Some((rate, ch, samples)) =>
              Row(r.getLong(0), rate, ch, samples.length.toLong,
                WavCodec.rms(samples))
            case None => Row(r.getLong(0), null, null, null, null)
          }
        }
      }(enc)
  }

  /** Frame sampling stub for video-like blobs: N evenly spaced byte
    * windows as (media_id, frame_no, off, len) — the real variant
    * samples decoded frames; the slicing/explode shape is identical.
    */
  def sampleFrames(df: DataFrame, n: Int, frameBytes: Int = 256): DataFrame =
    df.select(col("media_id"), octet_length(col("content")).cast("long").as("nb"))
      .select(col("media_id"), col("nb"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_no"))
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        least(floor(col("nb") * col("frame_no") / n).cast("long"),
          greatest(col("nb") - frameBytes, lit(0L))).as("off"),
        least(lit(frameBytes.toLong), col("nb")).as("len"))
}
