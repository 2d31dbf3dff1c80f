package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import CosineSim.dot

/** IVF-Flat approximate nearest neighbor — the inverted-file scale
  * path next to the LSH buckets of `CosineLsh` (SURVEY.md §7.7 ANN):
  * a coarse quantizer (sampled centroids — id-stride sampling, no
  * iterative training, so the structure is deterministic and
  * oracle-reproducible) partitions the corpus into inverted lists;
  * a query probes only its `nprobe` nearest cells and brute-forces
  * within them.
  *
  * Scale shape: centroids are ~n/stride rows and broadcast; corpus
  * assignment is one broadcast join + per-id argmax (no shuffle of
  * the corpus beyond the aggregate); the search joins queries to
  * corpus ON THE CELL ID, so per-task work is bounded by cell
  * population — the corpus is never scanned per query, unlike the
  * `topK` brute-force baseline.
  */
object IvfFlat {

  /** Stride giving ~√n centroids: keeps the assignment join at
    * n·√n distance computations (fixed stride makes centroid count
    * grow linearly with the corpus and assignment quadratic — the
    * sf1 scaling audit measured exactly that). √n cells of ~√n
    * vectors each is the classic IVF balance.
    */
  def autoStride(n: Long): Long =
    math.max(2L, math.ceil(math.sqrt(n.toDouble)).toLong)

  /** Fixed-size codebook: the `k` corpus vectors with the smallest
    * md5(id) — a deterministic hash sample, so the centroid COUNT is
    * constant in corpus size and assignment stays n·k (linear in n),
    * where the id-stride sampler's √n centroids make it n^1.5. This
    * is the 100 TB coarse quantizer; `refine` turns it into a trained
    * (Lloyd) codebook. Output: (__cid, __cv, __cn).
    */
  def codebook(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int): DataFrame = {
    require(k > 0, "IvfFlat.codebook: k must be positive")
    corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
        sqrt(dot(col(vecCol), col(vecCol))).as("__cn"),
        md5(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h"), col("__cid"))
      .limit(k)
      .drop("__h")
  }

  /** Assign every vector to its nearest codebook centroid by cosine.
    * Output: (idCol, vecCol, cell) — cell is the centroid's id; ties
    * break to the lowest centroid id. The codebook is broadcast, so
    * the corpus shuffles only for the per-id argmax aggregate.
    *
    * Zero norms are EXCLUDED (zero-norm vectors dropped, zero-norm
    * centroids ignored): under ANSI mode their cosine division would
    * throw DIVIDE_BY_ZERO mid-job, and DuckDB's 0/0 is NULL — neither
    * engine can rank them consistently, so the pinned contract is
    * exclusion, identical in `assignWith`'s scan-local expression
    * (SemDedupSpec holds the two to parity on exactly this edge).
    */
  def assignTo(corpus: DataFrame, idCol: String, vecCol: String,
               cb: DataFrame): DataFrame =
    // Delegates to the SCAN-LOCAL kernel. The join+argmax form this
    // replaced materialized n·k rows (each carrying BOTH vectors)
    // through an aggregate — row machinery, not flops, and at a √n
    // codebook that is n^1.5 rows: the r9 sf5 drift audit measured
    // n3 at 2 397 s CPU (exp ≈ 1.85) on the join form vs n·k flops in
    // a map here. Semantics pinned identical by SemDedupSpec (cosine
    // argmax, ties to lowest cid, zero-norm vectors and centroids
    // excluded). One visible difference: exact duplicate (id, vec)
    // corpus ROWS are no longer merged by the old groupBy — each row
    // keeps its own assignment (ids are unique in every caller).
    assignWith(corpus, idCol, vecCol, cb)

  /** Same assignment as `assignTo`, as a SCAN-LOCAL projection: the
    * codebook collects to the driver (the identical ≤ k·dim doubles a
    * broadcast join would ship) and rides into the
    * [[graft.functions.NearestCentroid]] codegen expression. The join
    * form materializes n·k rows through an argmax aggregate — at a √n
    * codebook that is n^1.5 rows of join machinery, re-executed by
    * every downstream self-join branch; this form is n·k flops in a
    * map, recompute-cheap. Tie-breaks and cosine arithmetic are
    * pinned to `assignTo` (SemDedupSpec cross-checks the two).
    */
  def assignWith(corpus: DataFrame, idCol: String, vecCol: String,
                 cb: DataFrame): DataFrame = {
    val triples = cb
      .select(col("__cid").cast("long"), col("__cv").cast("array<double>"),
        col("__cn"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .toSeq
    corpus.select(col(idCol), col(vecCol),
      graft.functions.NearestCentroid.nearest_centroid(col(vecCol), triples)
        .as("cell"))
      // NULL cell = zero-norm vector (or all-zero codebook): dropped,
      // matching assignTo's `__n > 0` filter row-for-row
      .where(col("cell").isNotNull)
  }

  /** Lloyd refinement: `iters` rounds of assign → per-cell mean.
    * Improves cell balance and recall over the raw hash sample;
    * float means are summation-order-sensitive, so refined codebooks
    * are spec-gated (the oracle queries pin unrefined codebooks).
    * A cell that loses all members keeps its previous centroid.
    * Each round is one broadcast-join assign plus one (cell, pos)
    * aggregate — linear in n, no per-iteration corpus shuffle growth.
    */
  def refine(corpus: DataFrame, idCol: String, vecCol: String,
             cb: DataFrame, iters: Int): DataFrame = {
    var cur = cb
    for (_ <- 1 to iters) {
      val assigned = assignTo(corpus, idCol, vecCol, cur)
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol).cast("array<double>")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("__cv"))
        .select(col("cell").as("__cid"), col("__cv"),
          sqrt(dot(col("__cv"), col("__cv"))).as("__cn"))
      cur = means.unionByName(
        cur.join(means.select(col("__cid")), Seq("__cid"), "left_anti"))
    }
    cur
  }

  /** Assign every vector to its nearest sampled centroid by cosine
    * (id-stride sampler — deterministic without a hash pass; centroid
    * count ~n/stride, so pair `autoStride` for the √n balance).
    * Output: (idCol, vecCol, cell).
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             stride: Long): DataFrame = {
    require(stride > 1)
    val cents = corpus.where(col(idCol) % stride === 0)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
        sqrt(dot(col(vecCol), col(vecCol))).as("__cn"))
    // a filtered/offset id space can miss stride multiples entirely —
    // fail loudly instead of silently assigning (and searching) nothing
    require(!cents.isEmpty,
      s"IvfFlat: no centroid ids divisible by $stride in '$idCol' — " +
        "use a stride that intersects the id space")
    assignTo(corpus, idCol, vecCol, cents)
  }

  /** Top-k cosine neighbors per query, searching only the query's
    * `nprobe` nearest cells of an assigned corpus (`assign` output).
    * Self-matches excluded. Output: (q, rank, neighbor, cos).
    */
  def searchTopK(queries: DataFrame, assigned: DataFrame,
                 qCol: String, idCol: String, vecCol: String,
                 k: Int, nprobe: Int, stride: Long): DataFrame = {
    val cents = assigned.where(col(idCol) % stride === 0)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
        sqrt(dot(col(vecCol), col(vecCol))).as("__cn"))
    require(!cents.isEmpty,
      s"IvfFlat: no centroid ids divisible by $stride in '$idCol' — " +
        "searchTopK would probe zero cells and return no neighbors")
    searchTopKWith(queries, assigned, cents, qCol, idCol, vecCol, k, nprobe)
  }

  /** `searchTopK` against an explicit codebook (`codebook`/`refine`
    * output) instead of re-deriving stride-sampled centroids — the
    * constant-k path. Same output: (q, rank, neighbor, cos).
    */
  def searchTopKWith(queries: DataFrame, assigned: DataFrame, cents: DataFrame,
                     qCol: String, idCol: String, vecCol: String,
                     k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col(qCol).as("q"), col(vecCol).as("qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("qn"))
    val wQ = Window.partitionBy("q")
      .orderBy((dot(col("qv"), col("__cv")) / (col("qn") * col("__cn"))).desc, col("__cid"))
    val probes = q.join(broadcast(cents))
      .withColumn("__rk", row_number().over(wQ))
      .where(col("__rk") <= nprobe)
      .select(col("q"), col("qv"), col("qn"), col("__cid").as("cell"))
    val lists = assigned.select(col("cell"), col(idCol).as("neighbor"),
      col(vecCol).as("cv"), sqrt(dot(col(vecCol), col(vecCol))).as("cn"))
    val scored = probes.join(lists, "cell")
      .where(col("q") =!= col("neighbor"))
      .select(col("q"), col("neighbor"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val wK = Window.partitionBy("q").orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(wK))
      .where(col("rank") <= k)
      .select("q", "rank", "neighbor", "cos")
  }
}
