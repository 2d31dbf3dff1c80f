package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.similarity.{CosineLsh, CosineSim}
import graft.text.TextFunctions

class DedupSpec extends SparkSuite {

  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon")

  test("minhash LSH finds planted near-duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def randDoc() = (1 to 40).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, randDoc()))
    // plant near-dups: copies of docs 0,1,2 with one word changed
    val dups = (0 until 3).map { i =>
      val words = base(i)._2.split(" ")
      words(20) = "CHANGED"
      (100L + i, words.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

    val sigs = MinHashLSH.signatures(docs, "doc_id", "toks", k = 8, shingleN = 2)
    val cand = MinHashLSH.candidatePairs(
      MinHashLSH.bandBuckets(sigs, "doc_id", 8, 4), "doc_id")
    val withJac = MinHashLSH.jaccardBp(cand, docs, "doc_id", "toks", 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    (0 until 3).foreach { i =>
      val key = (i.toLong, 100L + i)
      assert(withJac.contains(key), s"planted pair $key not found in ${withJac.keys}")
      assert(withJac(key) > 8000L, s"planted pair $key jaccard too low: ${withJac(key)}")
    }
  }

  test("xxhash64 production path finds the planted near-dups the md5 path finds") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def randDoc() = (1 to 40).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, randDoc()))
    // exact copies MUST collide in any hash family (identical shingle
    // set ⇒ identical signature); one-word edits check the s-curve
    val exact = (0 until 3).map(i => (200L + i, base(i)._2))
    val near = (0 until 3).map { i =>
      val words = base(i)._2.split(" "); words(20) = "CHANGED"
      (100L + i, words.mkString(" "))
    }
    val docs = (base ++ exact ++ near).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val candXx = MinHashLSH.candidatePairs(
      MinHashLSH.bandBucketsXx(
        MinHashLSH.signaturesXx(docs, "doc_id", "toks", 8, 2), "doc_id", 8, 4),
      "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 3).foreach { i =>
      assert(candXx.contains((i.toLong, 200L + i)), s"exact dup $i missed by xx path")
      assert(candXx.contains((i.toLong, 100L + i)), s"near dup $i missed by xx path")
    }
  }

  test("universal-hash production path finds the planted near-dups, in-range, injective buckets") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def randDoc() = (1 to 40).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, randDoc()))
    val exact = (0 until 3).map(i => (200L + i, base(i)._2))
    val near = (0 until 3).map { i =>
      val words = base(i)._2.split(" "); words(20) = "CHANGED"
      (100L + i, words.mkString(" "))
    }
    val docs = (base ++ exact ++ near).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val sigs = MinHashLSH.signaturesU(docs, "doc_id", "toks", 8, 2)
    // every signature lies in [0, P): the range the affine family and
    // the injective pairing both depend on
    sigs.collect().foreach { r =>
      (1 to 8).foreach { c =>
        val v = r.getLong(c)
        assert(v >= 0L && v < MinHashLSH.P, s"sig out of range: $v")
      }
    }
    val buckets = MinHashLSH.bandBucketsU(sigs, "doc_id", 8, 4)
    // injective pairing: bucket equality within a band ⇔ equality of
    // BOTH band signatures (decode back and compare)
    val sigMap = sigs.collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    buckets.collect().foreach { r =>
      val (id, band, bk) = (r.getLong(0), r.getInt(1), r.getLong(2))
      val s = sigMap(id)
      assert(bk === s(2 * band) * MinHashLSH.P + s(2 * band + 1))
    }
    val candU = MinHashLSH.candidatePairs(buckets, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 3).foreach { i =>
      assert(candU.contains((i.toLong, 200L + i)), s"exact dup $i missed by U path")
      assert(candU.contains((i.toLong, 100L + i)), s"near dup $i missed by U path")
    }
  }

  test("simhash of a near-duplicate is within small hamming distance") {
    import spark.implicits._
    val a = (1 to 60).map(i => s"tok$i").mkString(" ")
    val b = (1 to 60).map(i => if (i == 30) "XX" else s"tok$i").mkString(" ")
    val c = (200 to 260).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val h = SimHash.simhash(docs, "doc_id", "toks")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(3L)),
      s"near-dup ${ham(h(1L), h(2L))} should beat unrelated ${ham(h(1L), h(3L))}")
    assert(ham(h(1L), h(2L)) <= 8)
  }

  test("bucket cap drops degenerate buckets, keeps discriminative ones") {
    import spark.implicits._
    // 50 identical boilerplate docs (one giant bucket per band) + one
    // genuine near-dup pair with distinct content
    val boiler = (0 until 50).map(i => (i.toLong, "the same boilerplate text here"))
    val real = Seq((100L, "unique content alpha beta gamma delta"),
                   (101L, "unique content alpha beta gamma zeta"))
    val docs = (boiler ++ real).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val buckets = MinHashLSH.bandBuckets(
      MinHashLSH.signatures(docs, "doc_id", "toks", 8, 2), "doc_id", 8, 4)

    val capped = MinHashLSH.candidatePairs(buckets, "doc_id", maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped.contains((100L, 101L)), "real pair must survive the cap")
    assert(!capped.exists(p => p._1 < 50 && p._2 < 50),
      "boilerplate bucket must be dropped")
    // the audit view reports exactly the dropped buckets
    val over = MinHashLSH.oversizedBuckets(buckets, 10)
      .select("n").as[Long].collect()
    assert(over.nonEmpty && over.forall(_ === 50L))
    // uncapped keeps the quadratic bucket (the default/oracle path)
    val full = MinHashLSH.candidatePairs(buckets, "doc_id")
      .as[(Long, Long)].collect()
    assert(full.length === capped.size + 50 * 49 / 2)
  }

  test("56-bit 7-block banded join recalls every pair at hamming <= 6") {
    import spark.implicits._
    // random token docs + planted near-dups → some pairs land within
    // hamming 6; the banded join must find EXACTLY the brute-force set
    val rnd = new scala.util.Random(17)
    def randDoc() = (1 to 30).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, randDoc()))
    val dups = (0 until 6).map { i =>
      val words = base(i)._2.split(" "); words(10) = "CHANGED"
      (100L + i, words.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val sh = SimHash.simhash(docs, "doc_id", "toks", bits = 56)

    val brute = {
      val h = sh.collect().map(r => r.getLong(0) -> r.getLong(1))
      (for {
        (i, hi) <- h; (j, hj) <- h if i < j
        if java.lang.Long.bitCount(hi ^ hj) <= 6
      } yield (i, j)).toSet
    }
    assert(brute.nonEmpty, "test data must contain close pairs")

    val blocks = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(6))).as("b"))
      .withColumn("blk", expr("(shiftright(simhash, CAST(b*8 AS INT)) & 255)"))
    val a = blocks.select(col("doc_id").as("i"), col("simhash").as("h1"), col("b"), col("blk"))
    val bb = blocks.select(col("doc_id").as("j"), col("simhash").as("h2"), col("b"), col("blk"))
    val banded = a.join(bb, Seq("b", "blk"))
      .where(col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("ham"))
      .distinct().where(col("ham") <= 6)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(banded === brute)
  }

  test("IVF-Flat matches exact brute force on separable clusters") {
    import spark.implicits._
    import graft.similarity.{CosineSim, IvfFlat}
    val rnd = new scala.util.Random(23)
    // 3 well-separated clusters (axis-dominant); ids laid out so
    // id-stride-20 centroid sampling lands one centroid per cluster
    val vecs = (0 until 60).map { i =>
      val c = i % 3
      val v = Array.fill(8)(rnd.nextFloat() * 0.1f)
      v(c) = 10f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val assigned = IvfFlat.assign(vecs, "vec_id", "embedding", stride = 20L)
    // every vector lands in its own cluster's cell
    val cells = assigned.select("vec_id", "cell").as[(Long, Long)].collect()
    cells.foreach { case (id, cell) => assert(cell % 3 === id % 3) }

    val qs = vecs.where(col("vec_id") < 6)
    val ivf = IvfFlat.searchTopK(qs, assigned, "vec_id", "vec_id", "embedding",
        k = 3, nprobe = 1, stride = 20L)
      .select("q", "rank", "neighbor").as[(Long, Int, Long)].collect().toSet
    val exact = CosineSim.topK(qs, vecs, "vec_id", "vec_id", "embedding", k = 3)
      .select("q", "rank", "neighbor").as[(Long, Int, Long)].collect().toSet
    assert(ivf === exact)
  }

  test("cosine LSH planes are pairwise distinct and balanced through p=32") {
    // Regression pin for the round-7 plane-family fix: the original
    // (i*31 + p*17) mod 7 formula depended on p only through p mod 7,
    // so planes 7.. repeated planes 0..6 — bucket cardinality
    // saturated at 2^7 and occupancy went linear in n no matter what
    // autoPlanes requested. The i*p cross term keeps patterns
    // distinct; assert that, plus rough ±1 balance, for every plane
    // count autoPlanes could realistically emit (2^32 buckets covers
    // any corpus at targetBucketSize 64).
    val dims = 64
    def signs(p: Int): Seq[Boolean] =
      (0 until dims).map(i => (i * 31 + p * 17 + i * p * 13) % 101 < 50)
    val planes = (0 until 32).map(signs)
    for (a <- 0 until 32; b <- (a + 1) until 32)
      assert(planes(a) !== planes(b), s"planes $a and $b identical")
    // balance: most planes sit near 32/64 positive (p=21 is the worst
    // at 17/64 — a skewed split, not a degenerate one); guard against
    // constant/near-constant planes only
    planes.zipWithIndex.foreach { case (pl, p) =>
      val pos = pl.count(identity)
      assert(pos >= 10 && pos <= 54, s"plane $p degenerate: $pos/64 positive")
    }
    // and the Column expression agrees with the arithmetic above
    import spark.implicits._
    val one = Seq(Tuple1(Array.fill(dims)(1.0f))).toDF("embedding")
    val got = CosineLsh.signBuckets(one, "embedding", dims, nPlanes = 8)
      .select("bucket").as[Long].head()
    val want = (0 until 8).map { p =>
      val d = signs(p).map(if (_) 1.0 else -1.0).sum
      if (d > 0) 1L << p else 0L
    }.sum
    assert(got === want)
  }

  test("cosine LSH: identical vectors share a bucket, top-k finds the clone") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    def vec() = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val base = (0 until 20).map(i => (i.toLong, vec()))
    val clone = Seq((100L, base.head._2.map(x => x * 1.5f))) // same direction
    val df = (base ++ clone).toDF("vec_id", "embedding")
    val bucketed = CosineLsh.signBuckets(df, "embedding", dims = 16, nPlanes = 3)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(bucketed(0L) === bucketed(100L)) // same direction → same signs
    val top = CosineSim.topK(df.filter(col("vec_id") === 0), df,
        "vec_id", "vec_id", "embedding", k = 1)
      .select("neighbor").as[Long].collect()
    assert(top.toSeq === Seq(100L)) // the scaled clone has cosine 1
  }
  test("recommendBands hits the textbook banding operating points") {
    // the standard banding analysis: threshold ~ (1/b)^(1/r), r = k/b.
    // Classic example k=100: b=20, r=5 -> ~0.549 is the closest
    // divisor point to a 0.5 target
    assert(MinHashLSH.recommendBands(k = 100, targetJaccard = 0.5) === 20)
    assert(math.abs(MinHashLSH.bandThreshold(100, 20) - 0.549) < 0.01)
    // k=128 at a strict 0.8 target -> b=8 (r=16, threshold ~0.878;
    // the b=16 point 0.707 is farther in log space)
    assert(MinHashLSH.recommendBands(k = 128, targetJaccard = 0.8) === 8)
    assert(math.abs(MinHashLSH.bandThreshold(128, 16) - 0.707) < 0.01)
    // monotone: more bands = lower threshold, over all divisors
    val ds = (1 to 128).filter(128 % _ == 0)
    val ts = ds.map(MinHashLSH.bandThreshold(128, _))
    assert(ts === ts.sorted.reverse, s"thresholds not decreasing: $ts")
    // extremes clamp to the all-or-nothing bands (0.99 picks b=2:
    // its 0.989 point is genuinely closer than b=1's 1.0)
    assert(MinHashLSH.recommendBands(128, 0.999) === 1)
    assert(MinHashLSH.recommendBands(128, 0.99) === 2)
    assert(MinHashLSH.recommendBands(128, 0.01) === 128)
    assert(intercept[IllegalArgumentException](
      MinHashLSH.bandThreshold(128, 3)).getMessage.contains("divide"))
  }

  test("bands = 0 auto path equals the hand-picked banding (VERDICT r16 #1)") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"alpha beta gamma delta epsilon zeta $i"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("toks"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "band", "bucket").collect().map(_.toSeq).toSeq
    // U path: auto = k/2 (the only injective choice) = the gated d2
    // value; recommendBands at the 0.5 default agrees for k = 8
    assert(MinHashLSH.recommendBands(8, MinHashLSH.DefaultTargetJaccard) === 4)
    val sigsU = MinHashLSH.signaturesU(docs, "doc_id", "toks", 8, 2)
    assert(rows(MinHashLSH.bandBucketsU(sigsU, "doc_id", 8)) ===
           rows(MinHashLSH.bandBucketsU(sigsU, "doc_id", 8, bands = 4)))
    // md5 path: auto = recommendBands(k, 0.5)
    val sigs = MinHashLSH.signatures(docs, "doc_id", "toks", 8, 2)
    assert(rows(MinHashLSH.bandBuckets(sigs, "doc_id", 8)) ===
           rows(MinHashLSH.bandBuckets(sigs, "doc_id", 8, bands = 4)))
    // xx path too
    val sigsXx = MinHashLSH.signaturesXx(docs, "doc_id", "toks", 8, 2)
    assert(rows(MinHashLSH.bandBucketsXx(sigsXx, "doc_id", 8)) ===
           rows(MinHashLSH.bandBucketsXx(sigsXx, "doc_id", 8, bands = 4)))
  }
}
