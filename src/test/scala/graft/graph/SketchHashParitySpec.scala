package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The xxhash64 production path of `sharedNeighborsSketch` (the
  * library default; the DuckDB-gated j5b query pins the md5 variant)
  * must deliver the same sketch QUALITY as the md5 path: identical
  * neighbor sets always collide and estimate exactly, and estimates
  * for true near-identical pairs stay tight. Both hash families run
  * the same estimate formula, so this is a guard on the wiring, not
  * the math.
  */
class SketchHashParitySpec extends SparkSuite {

  // two cliques of 5 nodes with IDENTICAL neighbor sets (J = 1 within
  // a clique, 0 across), plus a pair at J ~ 18/22
  private def edges = {
    import spark.implicits._
    val cliqueA = for (s <- 1L to 5L; p <- 101L to 120L) yield (s, p)
    val cliqueB = for (s <- 11L to 15L; p <- 201L to 220L) yield (s, p)
    val near = (for (p <- 301L to 320L) yield (21L, p)) ++
      (for (p <- 303L to 322L) yield (22L, p))
    (cliqueA ++ cliqueB ++ near).toDF("src", "dst")
  }

  for (hasher <- Seq("xx", "md5")) {
    test(s"$hasher sketch: identical sets estimate J=1, cross-clique stays low") {
      import spark.implicits._
      val got = MotifQuery.sharedNeighborsSketch(edges, k = 16, bands = 4,
          hasher = hasher)
        .select("s1", "s2", "est_jac_bp", "n_shared_est")
        .as[(Long, Long, Long, Long)].collect()
      val byPair = got.map(r => ((r._1, r._2), (r._3, r._4))).toMap
      // every within-clique pair (identical neighbor sets) must be
      // found — all 16 signature mins agree, so every band collides
      val cliquePairs =
        (for (a <- 1L to 5L; b <- a + 1 to 5L) yield (a, b)) ++
          (for (a <- 11L to 15L; b <- a + 1 to 15L) yield (a, b))
      cliquePairs.foreach { p =>
        val (jac, nsh) = byPair.getOrElse(p, fail(s"$hasher: missing clique pair $p"))
        assert(jac === 10000L, s"$hasher: $p est_jac_bp=$jac")
        assert(nsh === 20L, s"$hasher: $p n_shared_est=$nsh")
      }
      // cross-clique sets are disjoint: any accidental candidate must
      // estimate low (a high estimate means the hash wiring is broken)
      got.filter(r => r._1 <= 5L && r._2 >= 11L).foreach { r =>
        assert(r._3 < 5000L, s"$hasher: disjoint pair $r estimates high")
      }
    }
  }

  test("xx and md5 agree on the near-identical pair's estimate within 2 components") {
    import spark.implicits._
    def est(h: String) =
      MotifQuery.sharedNeighborsSketch(edges, k = 16, bands = 4, hasher = h)
        .where(col("s1") === 21L && col("s2") === 22L)
        .select("est_jac_bp").as[Long].collect().headOption
    val xx = est("xx")
    val md = est("md5")
    // J(21,22) = 18/22 ≈ 0.818: both families must find the pair
    // (expected matching components ≈ 13/16; all 4 bands matching by
    // chance each round makes a miss vanishingly unlikely) and land
    // within 2/16 components of each other
    assert(xx.isDefined && md.isDefined, s"near pair missed: xx=$xx md5=$md")
    assert(math.abs(xx.get - md.get) <= 2 * 10000 / 16,
      s"families disagree: xx=$xx md5=$md")
  }
}
