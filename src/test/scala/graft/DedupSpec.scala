package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, dir)

  test("exact dedup keeps one id per content hash, counts copies") {
    val base = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(base, "doc_id", "text").collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash+LSH recovers the exact-jaccard pairs (recall ≥ 0.9, precision 1.0)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8, shingleN = 5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus must contain near-dups")
    // verify stage computes exact jaccard -> every reported pair is real
    assert(mh.subsetOf(exact), s"false positives: ${mh -- exact}")
    val recall = (mh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
  }

  test("simhash: near-identical docs collide within hamming 3, distinct docs don't") {
    val a = "the quick brown fox jumps over the lazy dog again and again in the park"
    val b = a.replace("park", "yard") // one token changed
    val c = "completely different content about spark query engines and columnar io paths"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash signatures are deterministic") {
    val s1 = Dedup.simhashSignatures(docs.limit(50), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.simhashSignatures(docs.limit(50), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val emb = Tables.embeddings(spark, dir)
    val pairs = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.3).collect()
    assert(pairs.forall(r => r.getAs[Long]("id1") < r.getAs[Long]("id2")))
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.3))
  }

  test("kernelized exact embedding pairs == expression-form brute force (incl. round boundary)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.array_cosine
    // random vectors plus PLANTED pairs whose raw cosine sits just
    // under the threshold but ROUNDS up to it — the contract filters
    // on round(cos, 4), so the kernel's pre-round margin must keep them
    val rnd = new scala.util.Random(41)
    val dim = 16
    val base = (0 until 120).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val df = base.toDF("id", "emb")
    for (t <- Seq(0.1, 0.3, 0.7)) {
      val got = Dedup.embeddingPairsExact(df, "id", "emb", t, maxRows = 1000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = df.select(col("id").as("id1"), col("emb").as("e1"))
        .join(df.select(col("id").as("id2"), col("emb").as("e2")), col("id1") < col("id2"))
        .withColumn("cosine", round(array_cosine(col("e1"), col("e2")), 4) + lit(0.0))
        .filter(col("cosine") >= t)
        .select("id1", "id2", "cosine")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"threshold $t: kernel ${got.size} vs expression ${want.size}")
    }
    // duplicate vectors: every unordered pair appears exactly once
    val dup = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)))
      .toDF("id", "emb")
    val pairs = Dedup.embeddingPairsExact(dup, "id", "emb", 0.9, maxRows = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)) && pairs.length == 3)
  }

  test("rangePairs: dot and euclidean forms match expression brute force") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.{array_dot, array_euclidean}
    import graft.operators.{Metric, Similarity}
    val rnd = new scala.util.Random(43)
    val df = (0 until 80).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("id", "emb")
    def brute(scoreCol: org.apache.spark.sql.Column, keep: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      df.select(col("id").as("id1"), col("emb").as("e1"))
        .join(df.select(col("id").as("id2"), col("emb").as("e2")), col("id1") < col("id2"))
        .withColumn("score", scoreCol)
        .filter(keep(col("score")))
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dotGot = Similarity.rangePairs(df, "id", "emb", Metric.Dot, 2.0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dotGot == brute(array_dot(col("e1"), col("e2")), _ >= 2.0) && dotGot.nonEmpty)
    val eucGot = Similarity.rangePairs(df, "id", "emb", Metric.Euclidean, 3.0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eucGot == brute(array_euclidean(col("e1"), col("e2")), _ <= 3.0) && eucGot.nonEmpty)
  }

  test("embeddingPairsExact guards its O(n²) form above maxRows") {
    val emb = Tables.embeddings(spark, dir)
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.3, maxRows = 10L)
    }
    assert(e.getMessage.contains("O(n²)") && e.getMessage.contains("embeddingPairsLsh"))
  }

  test("embeddingPairsLsh: precision 1.0 vs exact; recall ≥ 0.8 on high-sim pairs") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.3, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus must contain embedding near-dups")
    // verify stage is exact cosine → every reported pair is real
    assert(lsh.subsetOf(exact.keySet), s"false positives: ${lsh -- exact.keySet}")
    // recall target is the near-dup regime (cos ≥ 0.8), where sign-LSH
    // collision probability is high; moderate-sim pairs are allowed to slip
    val hi = exact.filter(_._2 >= 0.8).keySet
    if (hi.nonEmpty) {
      val recall = (lsh & hi).size.toDouble / hi.size
      assert(recall >= 0.8, s"high-sim recall $recall over ${hi.size} pairs")
    }
  }

  test("LSH bucket cap bounds a degenerate bucket at O(n) star pairs") {
    val boiler = "lorem ipsum dolor sit amet the same boilerplate text in every copy"
    val degenerate = (1000L until 1300L).map(i => (i, boiler))
    val nearDupA = (1L, "the quick brown fox jumps over the lazy dog in the sunny park today")
    val nearDupB = (2L, "the quick brown fox jumps over the lazy dog in the sunny yard today")
    val distinctC = (3L, "completely unrelated writing about distributed query engines and io")
    val df = (degenerate ++ Seq(nearDupA, nearDupB, distinctC)).toDF("doc_id", "text")
    val capped = Dedup.minhashPairs(df, "doc_id", "text", threshold = 0.7,
        maxBucketSize = 50)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // degenerate bucket degrades to star pairs: exactly n-1 pairs, all
    // anchored at the bucket min — not C(300, 2) = 44 850
    val degeneratePairs = capped.filter { case (a, b) => a >= 1000L && b >= 1000L }
    assert(degeneratePairs.size == 299, s"got ${degeneratePairs.size}")
    assert(degeneratePairs.forall(_._1 == 1000L))
    // pairs outside the degenerate bucket are unaffected by the cap
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists { case (a, b) => a == 3L || b == 3L })
    // connectivity for clusterPairs survives: one cluster over the 300
    val ids = df.select("doc_id")
    val clusters = Dedup.clusterPairs(ids, "doc_id",
        Dedup.minhashPairs(df, "doc_id", "text", threshold = 0.7, maxBucketSize = 50))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1000L until 1300L).forall(clusters(_) == 1000L))
  }

  test("simhash pigeonhole chunks derive from maxDist (complete at maxDist 7)") {
    val rnd = new scala.util.Random(5)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu")
    val corpus = (0L until 60L).map { i =>
      (i, Seq.fill(12)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val maxDist = 7
    val got = Dedup.simhashPairs(df, "doc_id", "text", maxDist = maxDist)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force oracle over the signatures
    val sigs = Dedup.simhashSignatures(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= maxDist
    } yield (a, b)).toSet
    assert(got == want, s"missing: ${want -- got}; extra: ${got -- want}")
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(df, "doc_id", "text", maxDist = 17))
  }

  test("simhashPairsWide == simhashPairs (both complete) at maxDist 3 and 7") {
    val rnd = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val corpus = (0L until 80L).map { i =>
      (i, Seq.fill(10)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    for (d <- Seq(3, 7)) {
      val narrow = Dedup.simhashPairs(df, "doc_id", "text", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val wide = Dedup.simhashPairsWide(df, "doc_id", "text", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(wide == narrow, s"maxDist=$d: wide ${wide.size} vs narrow ${narrow.size}")
    }
  }

  test("simhashPairsAuto: ALWAYS the narrow geometry — the refuted wide crossover never fires") {
    val rnd = new scala.util.Random(29)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val corpus = (0L until 80L).map { i =>
      (i, Seq.fill(10)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    def pairs(frame: org.apache.spark.sql.DataFrame) =
      frame.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val auto = pairs(Dedup.simhashPairsAuto(df, "doc_id", "text", maxDist = 3))
    assert(auto == pairs(Dedup.simhashPairs(df, "doc_id", "text", maxDist = 3)))
    // round 11 measured the wide form 12× SLOWER at 10M (identical
    // pairs) — the pre-r12 auto switched to it past a 5×10⁶ hint; pin
    // that no hint re-enables it. The wide plan is recognizable by its
    // flip-expansion filter column (`isExact`), absent from narrow.
    val hinted = Dedup.simhashPairsAuto(
      df, "doc_id", "text", maxDist = 3, nDocsHint = 2000000000L)
    assert(!hinted.queryExecution.analyzed.toString.contains("isExact"),
      "simhashPairsAuto routed to the retired wide geometry on a large corpus hint")
    assert(pairs(hinted) == auto)
  }

  test("large-star/small-star CC equals min-label propagation on random graphs") {
    val rnd = new scala.util.Random(7)
    val n = 300
    val pairList = (1 to 220).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val ids = (0L until n.toLong).toDF("doc_id")
    val pdf = pairList.toDF("id1", "id2")
    val stars = Dedup.clusterPairsStars(ids, "doc_id", pdf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // propagation needs diameter rounds — this sparse random graph has
    // >20-hop paths, which is precisely why the stars form exists
    val prop = Dedup.clusterPairs(ids, "doc_id", pdf, maxIters = 300)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == prop)
  }

  test("stars CC converges on a long chain (diameter >> round count)") {
    // a 120-node path needs 120 rounds of min-label propagation but
    // O(log² n) star rounds — this is why it's the 100 TB path
    val n = 120L
    val ids = (0L until n).toDF("doc_id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id1", "id2")
    val stars = Dedup.clusterPairsStars(ids, "doc_id", chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(stars.length == n && stars.forall(_._2 == 0L))
  }

  test("stars CC: empty pair set → every id its own cluster") {
    val ids = (0L until 10L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val out = Dedup.clusterPairsStars(ids, "doc_id", empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.forall { case (id, c) => id == c } && out.length == 10)
  }

  test("keep-best drop: argmax score per cluster, ties to lowest id, singletons survive") {
    // clusters: {0,1,2} (chain), {5,6}, singleton 9
    val docs = Seq(
      (0L, "a", 10), (1L, "b", 30), (2L, "c", 20),  // best: 1 (score 30)
      (5L, "d", 7), (6L, "e", 7),                   // tie → lowest id 5
      (9L, "f", 1)                                   // singleton stays
    ).toDF("doc_id", "text", "quality")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id1", "id2")
    val kept = Dedup.dropDuplicatesByPairsKeepBest(docs, "doc_id", pairs, "quality")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 9L))
    // keep-first on the same graph keeps min ids — different winners
    val first = Dedup.dropDuplicatesByPairs(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first == Set(0L, 5L, 9L))
  }

  test("dropNearDuplicates keeps exactly one representative per dup group") {
    val base = "the quick brown fox jumps over the lazy dog in the sunny park today"
    val rows = Seq(
      (1L, base), (2L, base), (9L, base),                  // exact dup group → keep 1
      (4L, base.replace("park", "yard")),                  // near dup of the group → same cluster
      (5L, "completely unrelated writing about spark query engines and io paths"),
      (6L, "another standalone document about columnar storage formats and scans"))
    val df = rows.toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text", threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 6L), s"kept $kept")
    // all columns survive
    assert(Dedup.dropNearDuplicates(df, "doc_id", "text", threshold = 0.7)
      .columns.toSeq == Seq("doc_id", "text"))
  }

  test("overlapPairs finds docs sharing a passage; boilerplate df-cut suppresses mass pairs") {
    val rnd = new scala.util.Random(31)
    def rt(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val passage = rt(80)
    val a = (10L, rt(100) + " " + passage + " " + rt(100))
    val b = (20L, rt(150) + " " + passage + " " + rt(50))
    val unrelated = (30L, rt(300))
    // 40 docs all ending in the same boilerplate footer
    val footer = rt(60)
    val boiler = (100L until 140L).map(i => (i, rt(120) + " " + footer))
    val df = (Seq(a, b, unrelated) ++ boiler).toDF("doc_id", "text")
    val pairs = Dedup.overlapPairs(df, "doc_id", "text", minShared = 2, maxDocFreq = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 20L)), "shared-passage pair missed")
    assert(!pairs.exists { case (x, y) => x == 30L || y == 30L }, "unrelated doc paired")
    // footer fingerprints appear in 40 docs > maxDocFreq=10 → cut; the
    // boilerplate docs' random bodies share nothing else
    assert(!pairs.exists { case (x, y) => x >= 100L && y >= 100L },
      "boilerplate footer paired the whole corpus")
  }

  test("char_shingles == composed-builtin form (property, incl. multibyte)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    // single-codepoint pieces spanning 1-, 2-, 3-, and 4-byte UTF-8
    val pieces = Seq("a", "b", " ", "0", "é", "ß", "€", "日", "😀")
    val strs = (0 until 300).map(i => (i.toLong,
      (0 until rnd.nextInt(14)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString))
    val df = strs.toDF("id", "t")
    for (n <- Seq(1, 3, 5)) {
      val fast = df.select(col("id"),
          graft.functions.SketchFunctions.char_shingles(col("t"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val slow = df.select(col("id"), array_distinct(transform(
          sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1))),
          i => col("t").substr(i, lit(n)))).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(fast == slow, s"n=$n")
    }
  }

  test("ngram jaccard with df-cut still finds the high-sim pairs") {
    val noCut = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.9)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // df-cut drops ubiquitous shingles; candidate intersection shrinks, so
    // compare membership at a lower verify threshold
    val cut = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.5,
        maxDocFreq = 100L)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noCut.subsetOf(cut), s"missing: ${noCut -- cut}")
  }

  test("semanticPairs: precision 1.0 vs exact, recall ≥ 0.8, deterministic") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem1 = Dedup.semanticPairs(emb, "vec_id", "embedding", 0.3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus must contain semantic pairs")
    // within-cell pairs are exact-cosine verified -> subset of truth
    assert(sem1.subsetOf(exact), s"false positives: ${(sem1 -- exact).take(5)}")
    val recall = (sem1 & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall over ${exact.size} pairs")
    val sem2 = Dedup.semanticPairs(emb, "vec_id", "embedding", 0.3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem1 == sem2, "seeded k-means + capped buckets must be deterministic")
  }

  test("semanticPairs: explicit maxTrain is a hard driver-collect budget, never silently raised") {
    val emb = Tables.embeddings(spark, dir)
    // nCells above an EXPLICIT maxTrain must fail fast, not quietly
    // collect nCells vectors past the caller's budget (round-6 advice)
    val e = intercept[IllegalArgumentException](
      Dedup.semanticPairs(emb, "vec_id", "embedding", 0.3,
        nCells = 512, maxTrain = 256))
    assert(e.getMessage.contains("maxTrain"))
    // explicit nCells within an explicit budget still works
    assert(Dedup.semanticPairs(emb, "vec_id", "embedding", 0.3,
      nCells = 16, maxTrain = 256).count() >= 0)
  }

  test("dropSemanticDuplicates: kept set is pair-free, dropped ids were paired") {
    val emb = Tables.embeddings(spark, dir)
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val kept = Dedup.dropSemanticDuplicates(emb, "vec_id", "embedding", 0.3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pairs = Dedup.semanticPairs(emb, "vec_id", "embedding", 0.3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    // one representative per component: no surviving pair has both ends kept
    assert(!pairs.exists(p => kept(p._1) && kept(p._2)))
    // nothing unpaired was dropped
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert((all -- kept).subsetOf(paired))
  }

  test("cellPairsAbove == within-cell brute force; oversized cell degrades to anchor star") {
    import graft.operators.{Metric, Similarity}
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 120).map { i =>
      (i.toLong, (i % 3).toLong, Array.fill(8)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "cell", "vec")
    val got = Similarity.cellPairsAbove(df, "id", "cell", "vec", Metric.Cosine, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na <= 1e-10 || nb <= 1e-10) 0.0 else dot / (na * nb)
    }
    val want = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 == b._2 && cos(a._3, b._3) >= 0.2
    } yield (a._1, b._1)).toSet
    assert(got == want)
    // oversized cell: every emitted pair is anchored at the cell min id
    val capped = Similarity.cellPairsAbove(df.filter(col("cell") === 0),
        "id", "cell", "vec", Metric.Cosine, -1.0, maxCellSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.nonEmpty && capped.forall(_._1 == 0L))
    assert(capped.length == 39, "anchor star must cover every other member once")
  }

  test("decontaminateSemantic: near-eval vectors dropped, orthogonal kept, columns intact") {
    val evalDf = Seq((100L, Array(1.0, 0.0, 0.0))).toDF("id", "emb")
    val train = Seq(
      (1L, Array(1.0, 0.0, 0.0)),   // cos 1.0   → dropped
      (2L, Array(0.9, 0.1, 0.0)),   // cos 0.994 → dropped
      (3L, Array(0.0, 1.0, 0.0)),   // cos 0.0   → kept
      (4L, Array(0.0, -1.0, 0.5)))  // cos 0.0   → kept
      .toDF("id", "emb")
    val kept = Dedup.decontaminateSemantic(train, evalDf, "id", "emb", threshold = 0.5)
    assert(kept.columns.toSeq == Seq("id", "emb")) // train schema preserved
    assert(kept.collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    // threshold above every cosine: nothing dropped
    val none = Dedup.decontaminateSemantic(train, evalDf, "id", "emb", threshold = 1.1)
    assert(none.count() == 4)
  }

  test("decontaminate drops exactly the train docs sharing a word n-gram with eval") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "totally unrelated words live here indeed"),
      (4L, "too short")).toDF("doc_id", "text")
    val evalDf = Seq(
      (100L, "prefix Alpha, beta GAMMA delta epsilon! suffix"), // normalized overlap with 1
      (101L, "nothing shared with anything at all")).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(train, evalDf, "doc_id", "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 1 shares the normalized 5-gram "alpha beta gamma delta epsilon";
    // doc 4 is shorter than n tokens -> no grams -> can't be contaminated
    assert(kept == Set(2L, 3L, 4L))
  }

  test("wordGrams: empty below n tokens, sliding window otherwise") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "t")
    val out = df.select(col("id"),
        graft.functions.TextFunctions.wordGrams(
          graft.functions.TextFunctions.tokens(col("t")), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("exactIncremental: within-batch min-id reps, landed hashes dropped, fresh kept") {
    val corpus = Seq((1L, "landed doc one"), (2L, "landed doc two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "landed doc one"),   // already in corpus -> dropped
      (11L, "fresh doc alpha"),  // new -> kept
      (12L, "fresh doc beta"),   // new, duplicated in batch -> min id kept
      (13L, "fresh doc beta"),
      (14L, "fresh doc beta")).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch,
        Dedup.contentHashes(corpus, "text"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(11L, 12L))
  }

  test("exactIncrementalBloom: identical to exactIncremental, even with a saturated filter") {
    val corpus = docs.filter($"doc_id" % 5 === 0)
    // null-text rows must survive both paths identically (NULL hash ->
    // NULL bloom verdict; the exact path keeps them, so must bloom's)
    val batch = docs.filter($"doc_id" % 5 =!= 0)
      .unionByName(Seq((999001L, null.asInstanceOf[String], "xx", "srcx", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val landed = Dedup.contentHashes(corpus, "text")
    val expected = Dedup.exactIncremental(batch, landed, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // well-sized filter: output must match the exact path
    val sized = Dedup.exactIncrementalBloom(batch, landed,
        Dedup.contentBloom(landed), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sized == expected)
    // adversarial: a filter sized for 1 item saturates (near-100% false
    // positives) — everything routes through the verify join, output
    // still exact
    val saturated = Dedup.exactIncrementalBloom(batch, landed,
        Dedup.contentBloom(landed, expectedItems = 1L, fpp = 0.5), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(saturated == expected)
  }

  test("bloom pre-filter routes definitely-new rows around the corpus join") {
    val corpus = Seq((1L, "landed doc one")).toDF("doc_id", "text")
    val batch = Seq((10L, "landed doc one"), (11L, "fresh doc alpha"))
      .toDF("doc_id", "text")
    val landed = Dedup.contentHashes(corpus, "text")
    val bloom = Dedup.contentBloom(landed)
    // the filter itself must separate landed from fresh content
    assert(bloom.mightContainString(
      java.security.MessageDigest.getInstance("MD5")
        .digest("landed doc one".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
    val out = Dedup.exactIncrementalBloom(batch, landed, bloom, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(11L))
  }

  test("minhash incremental: batch near-dups of the corpus dropped, batch twins keep min id") {
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val corpus = Seq(
      (1L, base),
      (2L, "an entirely different landed document about columnar execution engines"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base.replace("today", "tonight")),       // near-dup of corpus 1 -> dropped
      (11L, "completely fresh content on minhash banding and skew valves in join plans"),
      (12L, "completely fresh content on minhash banding and skew valves in join planning"),
      (13L, "another standalone new document with no relatives anywhere at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNewVsCorpusPairs(batch, corpus, "doc_id", "text",
      threshold = 0.7, shingleN = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L)), s"cross pairs: $pairs")
    val survivors = Dedup.minhashIncremental(batch, corpus, "doc_id", "text",
      threshold = 0.7, shingleN = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 10 matches corpus; 11/12 are batch twins -> min id 11 survives
    assert(survivors == Set(11L, 13L))
  }

  test("minhashBandTable: over-cap buckets degrade to the min-id anchor, detection survives") {
    val boiler = "identical boilerplate header repeated verbatim across every landed page"
    val corpus = (1L to 20L).map(i => (i, boiler)).toDF("doc_id", "text")
    // built and probed at the same threshold — the auto geometry is
    // part of the table contract
    val bandTable = Dedup.minhashBandTable(corpus, "doc_id", "text",
      threshold = 0.9, maxBucketSize = 5)
    // every doc is identical -> each band is ONE bucket of 20 > cap,
    // so exactly one (anchor) row per band survives
    val perBand = bandTable.groupBy("band").count().collect()
    assert(perBand.forall(_.getLong(1) == 1L), "over-cap bucket not reduced to anchor")
    assert(bandTable.select("id").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a new copy of the boilerplate is still detected via the anchor
    val batch = Seq((100L, boiler)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNewVsBandsPairs(batch, bandTable, corpus,
      "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 1L)))
  }

  test("lshBands: fewest-bands divisor split whose S-curve midpoint clears τ−0.05") {
    // the two geometries the operators actually run
    assert(Dedup.lshBands(128, 0.8) == 16) // midpoint (1/16)^(1/8) ≈ 0.707 ≤ 0.75
    assert(Dedup.lshBands(128, 0.7) == 32) // midpoint (1/32)^(1/4) ≈ 0.420 ≤ 0.65; 16 would sit at 0.707 > 0.65
    // a stricter threshold never gets MORE bands (more bands = lower
    // midpoint = more background collisions): b is antitone in τ
    val taus = Seq(0.1, 0.3, 0.5, 0.7, 0.8, 0.9, 0.99)
    val bs = taus.map(Dedup.lshBands(128, _))
    assert(bs == bs.sorted.reverse, s"bands not antitone in τ: ${taus.zip(bs)}")
    // every chosen b divides numPerms and satisfies the midpoint bound
    for ((t, b) <- taus.zip(bs)) {
      assert(128 % b == 0)
      if (b < 128) // the b=128 fallback is the τ-below-every-midpoint escape
        assert(math.pow(1.0 / b, b / 128.0) <= t - 0.05)
    }
    // τ below every achievable midpoint: single-row bands (max recall)
    assert(Dedup.lshBands(128, 0.01) == 128)
    assertThrows[IllegalArgumentException](Dedup.lshBands(128, 0.0))
    assertThrows[IllegalArgumentException](Dedup.lshBands(128, 1.5))
  }

  test("removeDuplicatedSpans: shared span vanishes from all docs, unique text intact") {
    val passage = "one two three four five six seven eight" // exactly L=8 tokens
    val base = Seq(
      (1L, s"alpha start $passage tail1 end"),
      (2L, s"beta begin $passage tail2 fin"),
      (3L, "gamma wholly unique document body here")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(base, "doc_id", "text", l = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha start tail1 end", 12L, 8L)))
    assert(out(2L) == (("beta begin tail2 fin", 12L, 8L)))
    assert(out(3L) == (("gamma wholly unique document body here", 6L, 0L)))
  }

  test("removeDuplicatedSpans: overlapping duplicated windows merge to a maximal span") {
    // a shared 10-token run: its three 8-token windows overlap and the
    // union covers all 10 tokens in both docs
    val run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val base = Seq(
      (1L, s"u1 $run u2"),
      (2L, s"v1 $run v2")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(base, "doc_id", "text", l = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(1L) == (("u1 u2", 10L)))
    assert(out(2L) == (("v1 v2", 10L)))
  }

  test("removeDuplicatedSpans: within-doc repetition alone is NOT a duplicated span (doc frequency, not occurrences)") {
    val span = "p1 p2 p3 p4 p5 p6 p7 p8"
    val base = Seq(
      (1L, s"$span middle $span"), // twice in ONE doc
      (2L, "entirely different words in this document body")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(base, "doc_id", "text", l = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 0L && out(2L) == 0L)
  }

  test("decontaminateSpans: eval span excised from train, near-miss and unique text intact") {
    val leak = "q1 q2 q3 q4 q5 q6" // an eval question, L=6 tokens
    val eval = Seq((100L, s"intro $leak outro")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"body starts $leak body ends"),       // quoted verbatim -> excised
      (2L, "q1 q2 q3 q4 q5 DIFFERENT trailing"),  // 5/6 overlap -> no 6-window match, kept
      (3L, s"$leak"),                             // doc IS the leak -> empty clean
      (4L, "wholly unrelated training document")).toDF("doc_id", "text")
    val out = Dedup.decontaminateSpans(train, eval, "doc_id", "text", l = 6)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("body starts body ends", 10L, 6L)))
    assert(out(2L) == (("q1 q2 q3 q4 q5 different trailing", 7L, 0L)))
    assert(out(3L) == (("", 6L, 6L)))
    assert(out(4L) == (("wholly unrelated training document", 4L, 0L)))
    // the eval windows CROSSING into context ("intro q1 ... q5" etc.)
    // are in the set too — a train doc quoting leak+outro loses both
    val t2 = Seq((9L, s"head $leak outro more words here")).toDF("doc_id", "text")
    val o2 = Dedup.decontaminateSpans(t2, eval, "doc_id", "text", l = 6)
      .collect().head
    assert(o2.getString(1) == "head more words here")
    assert(o2.getLong(3) == 7L) // leak + outro covered
  }
}
