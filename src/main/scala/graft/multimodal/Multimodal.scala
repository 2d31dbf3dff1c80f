package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark side — schema, partitioned
  * batch decode via mapPartitions, feature/frame row shapes — is real
  * and tested; the DECODE step is a clearly-marked deterministic STUB
  * (`stubDecode`), because no codec libraries exist in this
  * environment. Swap `decode` for a real codec (JNI/FFI) without
  * touching the distributed plumbing.
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
