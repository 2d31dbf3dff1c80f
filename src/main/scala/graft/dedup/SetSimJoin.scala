package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** EXACT set-similarity join at Jaccard threshold t, scaled by prefix
  * filtering (the AllPairs / PPJoin candidate bound) — the exact
  * companion of [[MinHashLSH]]'s approximate path, and the engine
  * behind recall audits that need exact ground truth without an
  * all-pairs or raw posting-list join.
  *
  * Why not join the posting lists directly (`probe ⋈ corpus ON
  * shingle`)? Stop-shingles: under a Zipf vocabulary the most frequent
  * shingle appears in a constant FRACTION of documents, so its posting
  * list is Θ(n) on both join sides and the join output — pairs that
  * share only stopwords and verify at Jaccard ≈ 0 — grows Θ(n²).
  * Measured on the cardinality-faithful fixtures: 21 GB of shuffle and
  * 5 055 s of task CPU at v2sf5 for d14's 1/7-sample probe
  * (DRIFT_r12.md), 94% of it pairs the threshold then discards.
  *
  * The prefix filter removes exactly that term and NOTHING else
  * (lossless): order every set's elements by ascending global document
  * frequency (ties by value — any total order shared by all sets
  * works), and index only each set's first |x| − ⌈t·|x|⌉ + 1 elements.
  * For any pair with J(x,y) ≥ t the intersection C satisfies
  * |C| ≥ ⌈t·|x|⌉ and |C| ≥ ⌈t·|y|⌉, so the globally-smallest common
  * element — the first element of C in BOTH sets' orderings — sits
  * within the first |x| − |C| + 1 ≤ |x| − ⌈t·|x|⌉ + 1 positions of x
  * and likewise of y: every qualifying pair shares a prefix element
  * and is generated. A stop-shingle, by contrast, lands in a set's
  * prefix only when the set has almost no rarer element, so frequent
  * elements stop driving the join. Candidates are then verified
  * exactly (`array_intersect` on the full sets), keeping the output
  * bit-identical to the naive join.
  *
  * All-pairs scope within a corpus is the reference's similarity-join
  * shape (pygr `blast.py:86-413` finds neighbors for every query
  * sequence); the probe predicate narrows the left side the way a
  * query-set BLAST run does.
  */
object SetSimJoin {

  /** Per-set elements sorted by ascending global document frequency
    * (ties by element value): `(id, els: array, sz: int)`. The shared
    * total order that makes per-record prefixes comparable.
    * Linear: one vocab-sized count, one fact-sized join, one
    * id-partitioned re-assembly.
    */
  def freqSortedSets(sets: DataFrame, idCol: String, setCol: String): DataFrame = {
    // Pin the caller's set expression BEFORE exploding it. Two
    // reasons, both measured at v2sf1 (370 CPU s per scan vs 15.7 for
    // one clean evaluation): the element and document-frequency
    // branches below each re-scan the input, and Catalyst's
    // infer-filters-from-generate rewrite guards the explode with
    // `size(e) > 0 AND isnotnull(e)` — re-evaluating the generator
    // INPUT expression per conjunct. When that input is an interpreted
    // higher-order-function chain (tokenize → shingle), the duplicated
    // evaluation dominates the whole join.
    val pinned = sets.select(col(idCol), col(setCol)).localCheckpoint()
    val el = pinned.select(col(idCol), explode(col(setCol)).as("_el"))
    val df = el.groupBy("_el").agg(count(lit(1)).as("_df"))
    el.join(df, "_el")
      .select(col(idCol), struct(col("_df"), col("_el")).as("_e"))
      // pre-partition by id so the collect_list agg sees bounded,
      // colocated groups instead of partial-aggregating a map keyed
      // by every id in the corpus per input chunk
      .repartition(col(idCol))
      .groupBy(col(idCol)).agg(sort_array(collect_list(col("_e"))).as("_es"))
      .select(col(idCol),
        expr("transform(_es, x -> x._el)").as("els"),
        size(col("_es")).as("sz"))
  }

  /** Pairs `(q, o, ic, szq, szo, jac_bp)` with exact set Jaccard
    * ≥ `minBp`/10000, `q` drawn from rows where `probePred(id)` holds,
    * `o` from the whole frame, `q ≠ o`. `sets` rows are
    * `(idCol, setCol: array)` with DISTINCT elements (e.g.
    * [[TextFunctions.shingles]] output). `jac_bp` is
    * floor(10000·|∩|/|∪|) — integer bp, engine-portable — and the
    * ≥ `minBp` gate equals J ≥ minBp/10000 exactly on integers.
    */
  def jaccardPairsBp(sets: DataFrame, idCol: String, setCol: String,
                     minBp: Int,
                     probePred: Column => Column = _ => lit(true)): DataFrame = {
    require(minBp > 0 && minBp <= 10000, s"minBp must be in (0,10000], got $minBp")
    val t = minBp.toLong
    // Materialize the sorted sets once: the frame feeds the probe
    // explode, the index explode, AND the verification joins — left as
    // lineage, the tokenize/shingle/df subtree re-evaluates per
    // consumer (measured 4× at sf0.1; ReuseExchange does not collapse
    // the differently-filtered branches).
    val sorted = freqSortedSets(sets, idCol, setCol).localCheckpoint()
    // prefix length |x| − ⌈t·|x|⌉ + 1, integer ceil
    val preLen = (col("sz")
      - floor((lit(t) * col("sz") + lit(9999L)) / lit(10000L)) + lit(1)).cast("int")
    val pre = sorted.select(col(idCol).as("_id"), col("sz"),
      posexplode(slice(col("els"), lit(1), preLen)))
    val qSide = pre.where(probePred(col("_id")))
      .select(col("_id").as("q"), col("sz").as("szq"),
        col("pos").as("_pq"), col("col").as("_el"))
    val oSide = pre.select(col("_id").as("o"), col("sz").as("szo"),
      col("pos").as("_po"), col("col").as("_el"))
    val cand = qSide.join(oSide, "_el")
      .where(col("q") =!= col("o"))
      // J ≥ t forces t·max(|x|,|y|) ≤ min(|x|,|y|) — prune before the
      // pair aggregation
      .where(least(col("szq"), col("szo")) * lit(10000L)
        >= lit(t) * greatest(col("szq"), col("szo")))
      .groupBy("q", "szq", "o", "szo")
      .agg(min("_pq").as("_pqm"), min("_po").as("_pom"))
      // positional filter (PPJoin): the globally-smallest common
      // element minimizes BOTH prefix positions, and every other
      // common element sits after it in both freq-ordered arrays, so
      // ic ≤ min(szq − pqm, szo − pom); J ≥ t needs
      // ic ≥ ⌈t·(szq+szo)/(1+t)⌉ — drop pairs whose bound can't reach
      // it before they touch the verify join
      .where(least(col("szq") - col("_pqm"), col("szo") - col("_pom"))
        * lit(10000L + t) >= lit(t) * (col("szq") + col("szo")))
      .select("q", "szq", "o", "szo")
    // Verification is compute-bound (one hash-set intersection per
    // pair), but the candidate table is BYTE-small — AQE coalesces it
    // to a handful of partitions and, when the set table fits the
    // broadcast threshold, the whole verify stage inherits that
    // near-serial layout (measured 8.2 s on one task at sf0.1). An
    // explicit partition count pins compute parallelism to the
    // session's shuffle width; AQE honors user-numbered repartitions.
    val parts = sets.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Verify on LEX-sorted copies of the same sets (one sort_array per
    // doc) with the fused merge kernel — no per-pair hash set, no
    // intersection array materialized just to take its size.
    val arrs = sorted.select(col(idCol), sort_array(col("els")).as("_lex"))
    cand.repartition(parts, col("q"))
      .join(arrs.select(col(idCol).as("q"), col("_lex").as("_aq")), "q")
      .join(arrs.select(col(idCol).as("o"), col("_lex").as("_ao")), "o")
      .select(col("q"), col("o"),
        graft.functions.SortedIntersectCount
          .sorted_intersect_count(col("_aq"), col("_ao")).as("ic"),
        col("szq").cast("long").as("szq"),
        col("szo").cast("long").as("szo"))
      .withColumn("jac_bp",
        TextFunctions.bp(col("ic"), col("szq") + col("szo") - col("ic")))
      .where(col("jac_bp") >= t)
  }
}
