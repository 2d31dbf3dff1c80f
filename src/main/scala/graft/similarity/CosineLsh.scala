package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH bucketing — the scale path for ANN: vectors
  * are signed against `nPlanes` deterministic ±1 hyperplanes and the
  * sign bits form a bucket id; search is then brute force only within
  * a bucket (the IVF-cell/LSH analog of SURVEY §7.7). Planes are
  * derived from pure integer arithmetic so any engine reproduces
  * them: plane p component i is +1 iff (i*31 + p*17) mod 7 < 3.
  *
  * Sizing at scale: bucket count is 2^nPlanes and the within-bucket
  * search is quadratic in bucket population, so nPlanes must grow
  * with the corpus — nPlanes ≈ log2(n / targetBucketSize) keeps
  * buckets constant-size (the sf1 audit's lesson for every
  * fixed-cardinality blocking key).
  */
object CosineLsh {

  /** Plane count keeping expected bucket population ≈
    * `targetBucketSize`: ceil(log2(n / target)), min 1 — the sizing
    * rule the scaling audit mandates for every fixed-cardinality
    * blocking key.
    */
  def autoPlanes(n: Long, targetBucketSize: Long = 1024L): Int =
    math.max(1, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucketSize)) / math.log(2.0)).toInt)

  def planeExpr(p: Int, dims: Int): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => when(((i * 31 + lit(p) * 17) % 7) < 3, lit(1.0d)).otherwise(lit(-1.0d)))

  /** Add a `bucket` column (LONG in [0, 2^nPlanes)). */
  def signBuckets(df: DataFrame, vecCol: String, dims: Int,
                  nPlanes: Int = 4): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val bits = (0 until nPlanes).map { p =>
      val d = CosineSim.dot(v, planeExpr(p, dims))
      when(d > 0d, lit(1L << p)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bits.reduce(_ + _))
  }

  /** SQL fragment producing the same bucket for a DOUBLE[] expr. */
  def bucketSql(vExpr: String, dims: Int, nPlanes: Int = 4): String =
    (0 until nPlanes).map { p =>
      s"(CASE WHEN list_dot_product($vExpr, list_transform(range(0, $dims), " +
        s"i -> CASE WHEN (i*31 + $p*17) % 7 < 3 THEN 1.0 ELSE -1.0 END)) > 0 " +
        s"THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
