package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY.md §7.4 risk list): hot grouping
  * keys are split across `buckets` salt values, aggregated partially,
  * then re-aggregated without the salt. Works for any decomposable
  * aggregate supplied as (partial, final) column pairs; `saltedSum` /
  * `saltedCount` cover the common cases.
  *
  * Every salt here is DETERMINISTIC — derived from row content or a
  * caller-named column, never `rand()`/`monotonically_increasing_id()`.
  * A nondeterministic salt re-assigns rows to different reduce
  * partitions when a task retry or AQE replan recomputes part of the
  * salting stage, which double-counts or drops rows against the
  * surviving map outputs: exactly the failure mode salting exists to
  * survive at scale.
  *
  * Sizing the knob: [[recommendBuckets]] derives the bucket count
  * from a measured skew model (heavy-hitter share × reduce tasks vs
  * a target max/mean task bound), with [[heavyHitterShare]] as the
  * one-sample estimator — see SKEW_r15.json for the probe table the
  * model is validated against.
  *
  * BEHAVIOR CHANGE (r17): every entry point defaults to
  * `buckets = 0` = measure-and-decide via [[autoBuckets]] (was a
  * fixed 16). The auto path runs one eager sample job at plan
  * construction; a STREAMING frame cannot be sampled, so it rides
  * the same model through a declared prior ([[declareHotShare]],
  * measured on a static bootstrap of the source — r18) and is
  * refused with a clear error when neither a prior nor explicit
  * buckets are given.
  */
object Salt {

  /** Deterministic content salt: hash of ALL the frame's columns mod
    * `buckets`. Rows with identical full content share a salt (a key
    * whose hot rows are byte-identical duplicates share a salt — if
    * that is the skew, dedup first). The same caveat applies to a
    * NARROW pre-projected frame with few distinct value combinations
    * per hot key: the content hash then lands on few salt buckets and
    * the skew relief degrades — pass an explicit `salt` expression
    * over a higher-cardinality source column in that case.
    * `hash` never returns null, and `pmod` keeps the range [0, b). */
  private def contentSalt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(buckets))

  /** Two-phase count per key group. Identical results to a direct
    * groupBy().count() — the salt only reshapes the shuffle.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 0): DataFrame =
    saltedAgg(df, keys, buckets)(count(lit(1)).as("__pc"))(sum("__pc").as("n"))

  /** Two-phase sum of `valueCol` per key group. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 0): DataFrame =
    saltedAgg(df, keys, buckets)(
      sum(valueCol).as("__ps"))(sum("__ps").as(s"sum_$valueCol"))

  /** The measured bucket count for `buckets = 0` (VERDICT r16 #1 —
    * the same measure-and-decide default the alignment store already
    * uses for `indexed = None`, `mapSideMerge = None` and
    * `binWidth = 0`): estimate the hot key's share from one
    * deterministic Bernoulli sample ([[heavyHitterShare]], seed-fixed
    * so retries and re-plans see the same number) and solve the
    * validated skew model ([[recommendBuckets]]) against the session's
    * shuffle-partition count. COST NOTE: this is one eager sample job
    * (a narrow 1% scan + a small agg) at plan-construction time —
    * callers who already know their skew pass an explicit `buckets`
    * and pay nothing. Over-estimating the share is the cheap error
    * side (a few extra buckets), so sampling noise on small frames is
    * benign; the share estimate concentrates tightly wherever salting
    * matters, because a key worth salting dominates any sample.
    */
  def autoBuckets(df: DataFrame, keys: Seq[String],
                  targetMaxOverMean: Double = 2.0,
                  fraction: Double = 0.01): Int = {
    val tasks = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.isStreaming) {
      // a streaming frame cannot be sampled eagerly, but its skew can
      // be KNOWN (r18, VERDICT r17 #2): measured from a static
      // bootstrap of the same source and declared per key set via
      // [[declareHotShare]]. With no declared prior the refusal
      // stands — silently guessing a bucket count is worse than
      // asking for one.
      val declared = df.sparkSession.conf.getOption(hotShareKey(keys))
      require(declared.isDefined,
        s"auto salt sizing samples the frame eagerly, which a streaming side cannot " +
        s"support — either pass explicit buckets, or declare a measured skew prior for " +
        s"the key set (Salt.declareHotShare(spark, Seq(${keys.mkString("\"", "\", \"", "\"")}), " +
        "share) with share from Salt.heavyHitterShare on a static bootstrap of the source)")
      recommendBuckets(declared.get.toDouble, tasks, targetMaxOverMean)
    } else
      recommendBuckets(heavyHitterShare(df, keys, fraction), tasks, targetMaxOverMean)
  }

  /** Session-conf key carrying a declared hot-key-share prior for a
    * key set — the streaming route into the `buckets = 0` auto path.
    */
  def hotShareKey(keys: Seq[String]): String =
    "spark.graft.salt.hotShare." + keys.mkString(",")

  /** Declare a measured skew prior so STREAMING frames grouped by
    * `keys` can ride `buckets = 0` (r18, VERDICT r17 #2): the batch
    * auto path measures `heavyHitterShare` per plan, which an
    * unbounded frame cannot do — but production streams have static
    * bootstraps (yesterday's batch of the same topic), and the skew
    * model needs only the hot key's share. Typical wiring:
    * {{{
    * Salt.declareHotShare(spark, Seq("user_id"),
    *   Salt.heavyHitterShare(spark.read.parquet(bootstrap), Seq("user_id")))
    * streamingFrame → Salt.saltedJoin(stream, dim, Seq("user_id"), saltExpr) // buckets = 0
    * }}}
    * The prior is per key set and session-scoped; over-declaring the
    * share errs toward a few extra buckets (the cheap side of the
    * model). Returns the bucket count the declaration resolves to at
    * the session's current shuffle-partition count, so callers can
    * log the decision.
    */
  def declareHotShare(spark: org.apache.spark.sql.SparkSession, keys: Seq[String],
                      share: Double, targetMaxOverMean: Double = 2.0): Int = {
    require(share >= 0.0 && share <= 1.0, s"hot share $share not in [0,1]")
    spark.conf.set(hotShareKey(keys), share.toString)
    recommendBuckets(share, spark.sessionState.conf.numShufflePartitions,
      targetMaxOverMean)
  }

  /** General two-phase aggregate: `partial` runs per (keys, salt) group,
    * `final` re-combines per key with the salt dropped. Caller supplies
    * decomposable pairs (e.g. count → sum, sum → sum, min → min); any
    * aggregate whose merge is associative works. The hot key's rows land
    * in `buckets` shuffle partitions instead of one, so the reduce-side
    * skew ceiling drops by that factor while the result is bit-identical
    * to the unsalted groupBy (decimal/long partials are
    * order-independent). The default salt is the deterministic content
    * hash — stable under task retries and AQE replans; pass `salt`
    * (any deterministic data-derived expression, as `saltedJoin`
    * takes) when the frame is a narrow projection whose content hash
    * would collapse into few buckets.
    *
    * `buckets = 0` (the default) sizes the salt from the data via
    * [[autoBuckets]] — one eager sample job; see its cost note.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int = 0,
                salt: Option[Column] = None)
               (partialAggs: Column*)(finalAggs: Column*): DataFrame = {
    require(partialAggs.nonEmpty && finalAggs.nonEmpty,
      "saltedAgg needs at least one partial and one final aggregate")
    val b = if (buckets > 0) buckets else autoBuckets(df, keys)
    df.withColumn("__salt",
        salt.map(s => pmod(coalesce(s.cast("int"), lit(0)), lit(b)))
          .getOrElse(contentSalt(df, b)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-safe equi-join: the (large, skewed) `fact` side carries a
    * deterministic salt derived from `saltExpr` (any data column — NOT a
    * random, so re-execution under task retry or AQE replans is stable;
    * NULL values coalesce to bucket 0 rather than silently dropping the
    * row from the equi-join); the `dim` side replicates each row across
    * all `buckets` salt values. Joining on keys :+ salt spreads a hot
    * join key's fact rows over `buckets` reduce tasks instead of one.
    * Row-for-row identical to `fact.join(dim, keys)`; cost is a
    * `buckets`× blow-up of the dim side's shuffle, the standard trade
    * for big-big skewed joins where the dim exceeds broadcast range
    * (when it fits, broadcast instead — salting a broadcastable dim is
    * pure overhead).
    *
    * `buckets = 0` (the default) sizes the salt from the FACT side's
    * measured key skew via [[autoBuckets]] — one eager sample job; a
    * uniform join key honestly recommends 1 bucket (= the plain join:
    * salting it would only replicate the dim). Callers modeling a
    * known-skewed production key on a uniform fixture pass explicit
    * buckets.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltExpr: Column, buckets: Int = 0): DataFrame = {
    val b = if (buckets > 0) buckets else autoBuckets(fact, keys)
    val f = fact.withColumn("__salt",
      pmod(coalesce(saltExpr, lit(0)), lit(b)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(b - 1))))
    f.join(d, keys :+ "__salt").drop("__salt")
  }

  /** Residual reduce-task max/mean a salted shuffle shows once no
    * single key dominates — hash-placement unevenness plus the
    * second-tier keys. Measured on the Zipf probe (SkewProbe, r15:
    * hot key fully diluted at B=32 → max/mean 1.69; the B=8→16→32
    * curve back-solves to a ~1.5 floor at 64 reduce tasks / 1 M
    * rows). The floor shrinks with rows-per-task; 1.5 is the
    * conservative planning figure for task counts sized to the data.
    */
  val ResidualMaxOverMean: Double = 1.5

  /** Recommended salt bucket count, from the skew profile to a target
    * reduce-task bound (VERDICT r15 #5 — makes the `buckets` knob
    * principled instead of folklore). Model, validated against the
    * measured SkewProbe table (SKEW_r15.json): the hottest key holds
    * `hotShare` of the rows, so unsalted it pins one of `tasks`
    * reduce tasks at ~`hotShare·tasks`× the mean (measured 6.98 at
    * share 0.10, 64 tasks). Salting over B buckets divides that term
    * by B on top of the residual background `ResidualMaxOverMean`:
    *
    *   max/mean ≈ residual + hotShare·tasks/B
    *
    * (measured 2.35/1.87/1.69 at B=8/16/32 vs predicted
    * 2.3/1.9/1.7). The smallest B meeting `targetMaxOverMean` is
    * hotShare·tasks/(target − residual), rounded up to a power of
    * two (keeps pmod bucketing well-spread), clamped to [1, tasks]
    * (more buckets than reduce tasks dilutes nothing further — the
    * hot key already reaches every task — while multiplying the dim
    * replication in `saltedJoin`). For share 0.10 at 64 tasks and the
    * default target 2.0 this recommends 16 — the probe's measured
    * sweet spot (1.87, diminishing returns past it); for the hotter
    * share-0.17 key it recommends 32, matching the measured
    * degradation of B=16 there (2.40).
    */
  def recommendBuckets(hotShare: Double, tasks: Int,
                       targetMaxOverMean: Double = 2.0): Int = {
    require(hotShare >= 0.0 && hotShare <= 1.0, s"hotShare $hotShare not in [0,1]")
    require(tasks >= 1, s"tasks $tasks < 1")
    require(targetMaxOverMean > ResidualMaxOverMean,
      s"target $targetMaxOverMean unreachable: residual unevenness alone is ~$ResidualMaxOverMean")
    val raw = hotShare * tasks / (targetMaxOverMean - ResidualMaxOverMean)
    // power-of-two BEFORE the tasks clamp: clamping first and then
    // rounding up would exceed tasks for non-power-of-two task counts
    // (e.g. 48 tasks → 64 buckets), breaking the documented bound
    var p = 1
    while (p < math.max(1.0, raw)) p <<= 1
    math.min(p, tasks)
  }

  /** Cheap heavy-hitter estimate feeding [[recommendBuckets]]: the
    * hottest key group's share of rows, from a `fraction` Bernoulli
    * sample (one narrow scan + one small aggregation — for a 1%
    * sample the groupBy holds at most sampledRows keys, and the hot
    * key's share estimate concentrates tightly because by definition
    * it has many samples). Deterministic seed so a replanned stage
    * samples identically. Returns 0.0 on an empty frame/sample.
    */
  def heavyHitterShare(df: DataFrame, keys: Seq[String],
                       fraction: Double = 0.01): Double = {
    val r = df.sample(withReplacement = false, fraction, seed = 41L)
      .groupBy(keys.map(col): _*).count()
      .agg(max("count").cast("double"), sum("count").cast("double")).head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }
}
