package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH bucketing — the scale path for ANN: vectors
  * are signed against `nPlanes` deterministic ±1 hyperplanes and the
  * sign bits form a bucket id; search is then brute force only within
  * a bucket (the IVF-cell/LSH analog of SURVEY §7.7). Planes are
  * derived from pure integer arithmetic so any engine reproduces
  * them: plane p component i is +1 iff (i*31 + p*17 + i*p*13)
  * mod 101 < 50. The i*p cross term is load-bearing: a separable
  * formula (an earlier mod-7 variant) depends on p only through
  * p mod 7, giving just 7 DISTINCT planes — bucket bits beyond the
  * 7th repeat earlier ones, so bucket count saturates at 2^7 and
  * occupancy (hence within-bucket pair work) silently goes linear
  * again no matter what `autoPlanes` asks for. With the cross term
  * each dimension sees coefficient (17 + 13*i) mod 101 on p, so
  * plane patterns stay distinct for p up to 101 (2^101 buckets —
  * beyond any corpus).
  *
  * Sizing at scale: bucket count is 2^nPlanes and the within-bucket
  * search is quadratic in bucket population, so nPlanes must grow
  * with the corpus — nPlanes ≈ log2(n / targetBucketSize) keeps
  * buckets constant-size (the sf1 audit's lesson for every
  * fixed-cardinality blocking key).
  */
object CosineLsh {

  /** Plane count keeping expected bucket population ≈
    * `targetBucketSize` — the sizing rule the scaling audit mandates
    * for every fixed-cardinality blocking key. Pure integer
    * arithmetic (binary length of (n-1)/target, i.e.
    * floor(log2)+1 ≈ ceil(log2(n/target))), so any engine — and the
    * SQL oracle via `autoPlanesSql` — reproduces the same count with
    * no float-boundary drift at powers of two.
    */
  def autoPlanes(n: Long, targetBucketSize: Long = 1024L): Int = {
    val v = math.max(0L, (n - 1) / targetBucketSize)
    if (v == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)
  }

  /** SQL fragment computing `autoPlanes` from a COUNT expression —
    * same integer arithmetic (DuckDB `bin()` is the minimal binary
    * string, so its length is floor(log2)+1).
    */
  def autoPlanesSql(nExpr: String, targetBucketSize: Long = 1024L): String =
    s"(CASE WHEN (($nExpr) - 1) // $targetBucketSize <= 0 THEN 1 " +
      s"ELSE length(bin((($nExpr) - 1) // $targetBucketSize)) END)"

  /** The plane is a CONSTANT (a function of p and i only) — computed
    * once driver-side and shipped as an array literal. The transform-
    * over-sequence form it replaces depended on no row data yet was
    * rebuilt per row through interpreted lambdas (HOFs are not
    * constant-folded), which made the sign projection the scan's hot
    * loop; the DuckDB twin `bucketSql` keeps the same arithmetic. */
  def planeExpr(p: Int, dims: Int): Column =
    typedLit((0 until dims).map { i =>
      if ((i * 31 + p * 17 + i * p * 13) % 101 < 50) 1.0d else -1.0d
    })

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
        s"i -> CASE WHEN (i*31 + $p*17 + i*$p*13) % 101 < 50 THEN 1.0 ELSE -1.0 END)) > 0 " +
        s"THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** `bucketSql` with a RUNTIME plane count (any SQL expression, e.g.
    * the `autoPlanesSql` scalar subquery) — the oracle twin of
    * auto-sized `signBuckets`, where the plane count grows with the
    * corpus instead of being baked into the query text.
    */
  def bucketSqlDyn(vExpr: String, dims: Int, npExpr: String): String =
    s"CAST(list_sum(list_transform(range(0, CAST($npExpr AS BIGINT)), p -> " +
      s"CASE WHEN list_dot_product($vExpr, list_transform(range(0, $dims), " +
      s"i -> CASE WHEN (i*31 + p*17 + i*p*13) % 101 < 50 THEN 1.0 ELSE -1.0 END)) > 0 " +
      s"THEN 1 << p ELSE 0 END)) AS BIGINT)"
}
