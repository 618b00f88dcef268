package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary-quantized index: 1 bit/dim packing, hand-computed Hamming
  * pre-screen, full-shortlist equivalence with the SQ8 kernel, recall
  * on a gaussian corpus, and the exact-kernel contract edges (nulls,
  * k>|corpus|, dim mismatch, shortlist refusal).
  */
class BqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
  }

  test("bit matrix is 1 bit/dim, cut on the dequantized mean in exact integer arithmetic") {
    val rows = randVecs(100, 70, seed = 5) // 70 dims → 2 words/row
    val cx = Similarity.collectCorpus(rows.toDF("id", "emb"), "id", "emb")
    val bq = Similarity.quantizeBq(cx)
    assert(bq.nWords == 2 && bq.words.length == cx.n * 2)
    val sq8 = bq.sq8
    // integer column totals of the codes define the threshold
    val colSum = new Array[Long](cx.dim)
    for (j <- 0 until cx.n; d <- 0 until cx.dim)
      colSum(d) += (sq8.codes(j * cx.dim + d) & 0xFF).toLong
    var d = 0
    while (d < cx.dim) {
      // stored f64 threshold is the dequantized mean of the same cut
      val expect = sq8.dimMin(d) + (colSum(d).toDouble / cx.n) * sq8.dimScale(d)
      assert(math.abs(bq.thresholds(d) - expect) < 1e-12)
      d += 1
    }
    // every corpus bit is code·n > Σcode — thresholds roundoff-free
    var j2 = 0
    while (j2 < cx.n) {
      var d2 = 0
      while (d2 < cx.dim) {
        val bit = (bq.words(j2 * 2 + (d2 >>> 6)) >>> (d2 & 63)) & 1L
        val code = (sq8.codes(j2 * cx.dim + d2) & 0xFF).toLong
        val expect = if (code * cx.n > colSum(d2)) 1L else 0L
        assert(bit == expect, s"row $j2 dim $d2")
        d2 += 1
      }
      j2 += 1
    }
  }

  test("sharded build: 1 shard equals the flat index bit-for-bit; multi-shard serves identically") {
    val cDf = randVecs(500, 40, seed = 61).toDF("id", "emb")
    val qDf = randVecs(50, 40, seed = 62).toDF("qid", "emb")
    val flat = Similarity.collectCorpusBq(cDf, "id", "emb")
    val one = Similarity.buildBqSharded(cDf, "id", "emb", numShards = 1)
    assert(one.length == 1)
    assert(one.head.ids.toSeq == flat.ids.toSeq)
    assert(one.head.words.toSeq == flat.words.toSeq)
    assert(one.head.thresholds.toSeq == flat.thresholds.toSeq)
    assert(one.head.sq8.codes.toSeq == flat.sq8.codes.toSeq)
    // 4 shards: union of rows is the corpus, global threshold shared,
    // and each row's bits match the flat index's bits for the same id
    val four = Similarity.buildBqSharded(cDf, "id", "emb", numShards = 4)
    assert(four.map(_.n).sum == flat.n)
    val flatPos = flat.ids.zipWithIndex.toMap
    four.foreach { sx =>
      assert(sx.thresholds.toSeq == flat.thresholds.toSeq)
      for (j <- 0 until sx.n) {
        val fj = flatPos(sx.ids(j))
        for (w <- 0 until sx.nWords)
          assert(sx.words(j * sx.nWords + w) == flat.words(fj * flat.nWords + w),
            s"id ${sx.ids(j)} word $w")
      }
    }
    // sharded serve == flat serve (full-corpus shortlist on both sides
    // makes the comparison exact: rerank == topkSq8 on every side)
    val viaFlat = Similarity.topkBqFlat(qDf, "emb", flat, 5, Metric.Cosine,
        shortlist = 500)
      .select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaShards = Similarity.topkBqSharded(qDf, "qid", "emb", four, 5,
        Metric.Cosine, shortlist = 500)
      .select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaFlat.map(r => (r._1, r._2, r._3)) == viaShards.map(r => (r._1, r._2, r._3)))
    viaFlat.zip(viaShards).foreach { case (a, b) =>
      assert(math.abs(a._4 - b._4) < 1e-9, s"$a vs $b")
    }
  }

  test("shortlist = corpus.n makes topkBq bit-identical to topkSq8") {
    val cDf = randVecs(400, 24, seed = 21).toDF("id", "emb")
    val qDf = randVecs(60, 24, seed = 22).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val bq = Similarity.quantizeBq(cx)
    for (m <- Seq(Metric.Cosine, Metric.Dot, Metric.Euclidean)) {
      val viaBq = Similarity.topkBqFlat(qDf, "emb", bq, 7, m, shortlist = 400)
        .select("qid", "rank", "index", "score")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val viaSq8 = Similarity.topkSq8Flat(qDf, "emb", bq.sq8, 7, m)
        .select("qid", "rank", "index", "score")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(viaBq.map(r => (r._1, r._2, r._3)) == viaSq8.map(r => (r._1, r._2, r._3)),
        s"metric $m: ids/ranks diverge")
      viaBq.zip(viaSq8).foreach { case (a, b) =>
        // sq8 scores come off an f32 GEMM tile; the bq rerank
        // accumulates the same dequantized products in f64 scalar
        // order — identical grid, different summation order
        assert(math.abs(a._4 - b._4) < 1e-4, s"metric $m: $a vs $b")
      }
    }
  }

  test("hamming pre-screen recall recovers with shortlist depth on an isotropic corpus") {
    // isotropic gaussian is BQ's WORST case (no cluster structure for
    // the sign pattern to key on) — the meaningful property is the
    // depth curve, not a high absolute floor: a 10% shortlist must
    // beat blind selection by far, and a 40% shortlist must be
    // near-exact after the SQ8 rerank
    val cDf = randVecs(2000, 64, seed = 31).toDF("id", "emb")
    val qDf = randVecs(150, 64, seed = 32).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val bq = Similarity.quantizeBq(cx)
    val exact = Similarity.topkFlat(qDf, "emb", cx, 10, Metric.Cosine)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    def recallAt(shortlist: Int): Double = {
      val got = Similarity.topkBqFlat(qDf, "emb", bq, 10, Metric.Cosine, shortlist)
        .select("qid", "index").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val r10 = recallAt(200) // measured 0.737 at these seeds
    val r40 = recallAt(800)
    assert(r10 >= 0.7, s"recall@10%=$r10")
    assert(r40 >= 0.95, s"recall@40%=$r40")
    assert(r40 > r10, s"depth must help: $r40 vs $r10")
  }

  test("driver-gate geometry: recall on the real embeddings tables holds the gate floor") {
    // the same computation as SparkEntry's ann_bq_recall gate, at both
    // verify (sf0.01) and bench (sf0.1) scale — keeps the pinned gate
    // floor and the spec measuring the same number
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if new java.io.File(dir).isDirectory) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
      val exact = Similarity.topkFlat(q, "embedding", cx, 10, Metric.Cosine)
        .select("vec_id", "index").as[(Long, Long)].collect().toSet
      val bq = Similarity.quantizeBq(cx)
      for (sl <- Seq(100, 200, 400)) {
        val got = Similarity.topkBqFlat(q, "embedding", bq,
            10, Metric.Cosine, shortlist = sl)
          .select("vec_id", "index").as[(Long, Long)].collect().toSet
        val recall = (exact & got).size.toDouble / exact.size
        info(f"$dir: bq recall@10 (shortlist=$sl) = $recall%.4f")
        // the gate's pinned geometry (measured 0.988 / 0.907)
        if (sl == 400)
          assert(recall >= 0.85, s"$dir: recall $recall under the ann_bq_recall floor")
      }
    }
  }

  test("contract edges: null query, k > corpus, empty-at-k0, dim mismatch, shortlist < k") {
    val cDf = randVecs(50, 16, seed = 41).toDF("id", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val bq = Similarity.quantizeBq(cx)
    val qDf = Seq(
      (1L, Some(Seq.fill(16)(0.5))),
      (2L, None)).toDF("qid", "emb")
    val out = Similarity.topkBq(qDf, "emb", bq, k = 60, Metric.Cosine,
      shortlist = 60).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // k > corpus clamps to |corpus|
    assert(byId(1L).getSeq[Any](byId(1L).fieldIndex("matches")).size == 50)
    // null embedding → null matches, row preserved
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("matches")))
    // k = 0 → empty arrays, not nulls
    val empt = Similarity.topkBq(qDf.filter(col("qid") === 1), "emb", bq,
      k = 0, Metric.Cosine, shortlist = 0).collect().head
    assert(empt.getSeq[Any](empt.fieldIndex("matches")).isEmpty)
    // dimension mismatch fails loudly
    val bad = Seq((9L, Seq.fill(8)(1.0))).toDF("qid", "emb")
    val e = intercept[Exception] {
      Similarity.topkBq(bad, "emb", bq, 5, Metric.Cosine, shortlist = 10).collect()
    }
    assert(e.getMessage.contains("Dimension mismatch")
      || e.getCause != null && e.getCause.getMessage.contains("Dimension mismatch"))
    // shortlist below k refuses eagerly
    intercept[IllegalArgumentException] {
      Similarity.topkBq(qDf, "emb", bq, 10, Metric.Cosine, shortlist = 5)
    }
  }

  test("deterministic across partitionings") {
    val cDf = randVecs(300, 32, seed = 51).toDF("id", "emb")
    val qDf = randVecs(40, 32, seed = 52).toDF("qid", "emb")
    val bq = Similarity.collectCorpusBq(cDf, "id", "emb")
    def run(parts: Int) =
      Similarity.topkBqFlat(qDf.repartition(parts), "emb", bq, 5,
          Metric.Cosine, shortlist = 50)
        .select("qid", "rank", "index", "score")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) == run(7))
  }

  private def flatRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
    df.select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("filtered: subset, k clamp to allowed, all-id parity, DF overload, exact vs restricted index") {
    val cDf = randVecs(400, 32, seed = 71).toDF("id", "emb")
    val qDf = randVecs(40, 32, seed = 72).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val bq = Similarity.quantizeBq(cx)
    val allowed = bq.ids.filter(_ % 3 == 0)
    val filtered = flatRows(Similarity.topkBqFilteredFlat(qDf, "emb", bq,
      allowed, 5, Metric.Cosine, shortlist = 60))
    // subset: only allowed ids are ever served
    assert(filtered.nonEmpty && filtered.forall(_._3 % 3 == 0))
    // the DataFrame-allowed overload (mask built executor-side, ids
    // never collected) returns the identical rows
    val viaDf = flatRows(Similarity.topkBqFilteredFlat(qDf, "emb", bq,
      allowed.toSeq.toDF("id"), "id", 5, Metric.Cosine, shortlist = 60))
    assert(filtered == viaDf)
    // EXACT parity with an index physically restricted to the allowed
    // rows but sharing the full corpus' SQ8 grid and bit thresholds:
    // per-row codes/bits depend only on the row and the global cut,
    // and bounded best-by-(hamming,id) selection is scan-order
    // independent, so the masked scan and the restricted scan must
    // agree bit for bit
    val keepPos = bq.ids.zipWithIndex.filter(_._1 % 3 == 0).map(_._2)
    val rIds = keepPos.map(bq.ids)
    val rCodes = keepPos.flatMap(p =>
      bq.sq8.codes.slice(p * bq.dim, (p + 1) * bq.dim))
    val rSq8 = Similarity.CorpusIndexSq8(rIds, rCodes, rIds.length, bq.dim,
      bq.sq8.dimMin, bq.sq8.dimScale,
      keepPos.map(bq.sq8.norms), keepPos.map(bq.sq8.sqNorms))
    val rWords = keepPos.flatMap(p =>
      bq.words.slice(p * bq.nWords, (p + 1) * bq.nWords))
    val restricted = Similarity.CorpusIndexBq(rIds, rWords, rIds.length,
      bq.dim, bq.nWords, bq.thresholds, bq.bitCut, rSq8)
    val viaRestricted = flatRows(Similarity.topkBqFlat(qDf, "emb",
      restricted, 5, Metric.Cosine, shortlist = 60))
    assert(filtered == viaRestricted)
    // all-id filter is bit-identical to the unfiltered serve
    val all = flatRows(Similarity.topkBqFlat(qDf, "emb", bq, 5,
      Metric.Cosine, shortlist = 60))
    val allFiltered = flatRows(Similarity.topkBqFilteredFlat(qDf, "emb",
      bq, bq.ids, 5, Metric.Cosine, shortlist = 60))
    assert(all == allFiltered)
    // k > |allowed| clamps: every allowed row comes back, none twice
    val tiny = bq.ids.filter(_ % 100 == 0) // 4 ids
    val clamped = flatRows(Similarity.topkBqFilteredFlat(qDf, "emb", bq,
      tiny, 50, Metric.Cosine, shortlist = 60))
    assert(clamped.groupBy(_._1).values.forall(_.map(_._3).toSet == tiny.toSet))
    // empty intersection → empty match arrays, not nulls
    val none = Similarity.topkBqFiltered(qDf, "emb", bq,
      Array(999999L), 5, Metric.Cosine, shortlist = 60).collect()
    assert(none.forall(r => !r.isNullAt(r.fieldIndex("matches")) &&
      r.getSeq[Any](r.fieldIndex("matches")).isEmpty))
  }

  test("sharded filtered/tombstoned: complement parity, never serves a tombstone") {
    val cDf = randVecs(500, 40, seed = 81).toDF("id", "emb")
    val qDf = randVecs(40, 40, seed = 82).toDF("qid", "emb")
    val shards = Similarity.buildBqSharded(cDf, "id", "emb", numShards = 3)
    val allIds = shards.flatMap(_.ids)
    val dead = allIds.filter(_ % 4 == 0).toArray
    val live = allIds.filter(_ % 4 != 0).toArray
    val tombstoned = flatRows(Similarity.topkBqShardedTombstoned(qDf, "qid",
      "emb", shards, dead, 5, Metric.Cosine, shortlist = 200))
    assert(tombstoned.nonEmpty && tombstoned.forall(_._3 % 4 != 0))
    // deny(dead) == allow(complement), bit for bit
    val viaAllow = flatRows(Similarity.topkBqShardedFiltered(qDf, "qid",
      "emb", shards, live, 5, Metric.Cosine, shortlist = 200))
    assert(tombstoned == viaAllow)
    // the DataFrame-allowed overload (one-pass multi-shard
    // executor-side mask build, allowed set never collected) returns
    // the identical rows
    val viaDf = flatRows(Similarity.topkBqShardedFiltered(qDf, "qid",
      "emb", shards, live.toSeq.toDF("id"), "id", 5, Metric.Cosine,
      shortlist = 200))
    assert(tombstoned == viaDf)
    // empty tombstone set serves identically to the plain sharded form
    val plain = flatRows(Similarity.topkBqSharded(qDf, "qid", "emb",
      shards, 5, Metric.Cosine, shortlist = 200))
    val noDeny = flatRows(Similarity.topkBqShardedTombstoned(qDf, "qid",
      "emb", shards, Array.empty[Long], 5, Metric.Cosine, shortlist = 200))
    assert(plain == noDeny)
  }

  test("wave serve: waveSize-1 row parity with the all-resident form, bounded peak, filtered waves") {
    val cDf = randVecs(600, 32, seed = 91).toDF("id", "emb")
    val qDf = randVecs(50, 32, seed = 92).toDF("qid", "emb")
    val shards = Similarity.buildBqSharded(cDf, "id", "emb", numShards = 4)
    val all = flatRows(Similarity.topkBqSharded(qDf, "qid", "emb", shards,
      5, Metric.Cosine, shortlist = 150))
    val meter = new Similarity.ShardedServeMeter
    val waved = flatRows(Similarity.topkBqShardedWaves(qDf, "qid", "emb",
      shards, 5, Metric.Cosine, shortlist = 150, waveSize = 1, meter = meter))
    assert(all.map(r => (r._1, r._2, r._3)) == waved.map(r => (r._1, r._2, r._3)))
    // peak live broadcast bytes = the largest single shard (< Σ shards)
    val per = shards.map(sx => org.apache.spark.util.SizeEstimator.estimate(sx))
    assert(meter.peakLiveBroadcastBytes == per.max &&
      meter.peakLiveBroadcastBytes < per.sum,
      s"peak ${meter.peakLiveBroadcastBytes} vs per-shard $per")
    assert(meter.liveBroadcastBytes == 0L)
    // filtered + tombstoned masks ride the waves: parity with the
    // all-resident filtered/tombstoned serves
    val allIds = shards.flatMap(_.ids)
    val allow = allIds.filter(_ % 2 == 0).toArray
    val deny = allIds.filter(_ % 10 == 0).toArray
    val wavedMasked = flatRows(Similarity.topkBqShardedWaves(qDf, "qid",
      "emb", shards, 5, Metric.Cosine, shortlist = 150, waveSize = 2,
      allowedIds = allow, deniedIds = deny))
    val expect = flatRows(Similarity.topkBqShardedFiltered(qDf, "qid",
      "emb", shards, allow.filter(id => !deny.contains(id)), 5,
      Metric.Cosine, shortlist = 150))
    assert(wavedMasked == expect)
    assert(wavedMasked.forall(r => r._3 % 2 == 0 && r._3 % 10 != 0))
  }
}
