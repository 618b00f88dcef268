package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** IVF+BQ contract: full-probe equivalence with the flat BQ kernel,
  * probe monotonicity, clustered-corpus recall at a probed fraction,
  * sharded build/serve parity, and the usual edges.
  */
class IvfBqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private def clustered(n: Int, dim: Int, nClusters: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian() * 3.0)
    (0L until n.toLong).map { i =>
      val c = centers((i % nClusters).toInt)
      i -> c.toSeq.map(_ + rnd.nextGaussian() * 0.3)
    }
  }

  test("probing every cell reproduces flat topkBq exactly") {
    val cDf = clustered(600, 24, 12, seed = 101).toDF("id", "emb")
    val qDf = clustered(60, 24, 12, seed = 102).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val flat = Similarity.quantizeBq(cx)
    val ivf = Similarity.quantizeIvfBq(cx, nCells = 8)
    // same bits (repacked to CSR-position order), same thresholds,
    // same envelope — the IVF payload IS the flat payload plus routing
    assert(ivf.thresholds.toSeq == flat.thresholds.toSeq)
    assert(ivf.sq8.codes.toSeq == flat.sq8.codes.toSeq)
    for (p <- 0 until ivf.n; w <- 0 until ivf.nWords)
      assert(ivf.words(p * ivf.nWords + w) ==
        flat.words(ivf.cellMembers(p) * flat.nWords + w),
        s"CSR slot $p word $w")
    val viaFlat = Similarity.topkBqFlat(qDf, "emb", flat, 5, Metric.Cosine,
        shortlist = 600)
      .select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaIvf = Similarity.topkIvfBqFlat(qDf, "emb", ivf, 5, nProbe = 8,
        shortlist = 600)
      .select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaFlat == viaIvf)
  }

  test("probe monotonicity and clustered recall at a probed fraction") {
    val cDf = clustered(2000, 32, 64, seed = 111).toDF("id", "emb")
    val qDf = clustered(150, 32, 64, seed = 112).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val ivf = Similarity.quantizeIvfBq(cx, nCells = 32)
    val exact = Similarity.topkFlat(qDf, "emb", cx, 10, Metric.Cosine)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    def recallAt(nProbe: Int): Double = {
      val got = Similarity.topkIvfBqFlat(qDf, "emb", ivf, 10, nProbe,
          shortlist = 400)
        .select("qid", "index").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val r4 = recallAt(4)
    val r32 = recallAt(32)
    info(f"recall@10 (shortlist 400): nProbe=4 $r4%.4f, nProbe=32 $r32%.4f")
    assert(r32 >= r4, s"probing more cells must not lose recall: $r32 vs $r4")
    assert(r4 >= 0.7, s"clustered recall at 4/32 cells: $r4")
    // at FULL probe + FULL shortlist the rerank covers everything —
    // near-exact (the residual gap is the SQ8 grid); at shortlist 400
    // the ceiling is the Hamming screen's coverage, measured 0.83
    val got = Similarity.topkIvfBqFlat(qDf, "emb", ivf, 10, nProbe = 32,
        shortlist = 2000)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    val rFull = (exact & got).size.toDouble / exact.size
    info(f"recall@10 (full probe, full shortlist) = $rFull%.4f")
    assert(rFull >= 0.95, s"full-probe full-shortlist recall: $rFull")
  }

  test("sharded build: bits identical to the flat build; sharded serve hits the flat recall") {
    val cDf = clustered(800, 24, 16, seed = 121).toDF("id", "emb")
    val qDf = clustered(60, 24, 16, seed = 122).toDF("qid", "emb")
    val flat = Similarity.collectCorpusBq(cDf, "id", "emb")
    val shards = Similarity.buildIvfBqSharded(cDf, "id", "emb",
      numShards = 4, nCells = 4)
    assert(shards.map(_.n).sum == flat.n)
    val flatPos = flat.ids.zipWithIndex.toMap
    shards.foreach { sx =>
      assert(sx.thresholds.toSeq == flat.thresholds.toSeq)
      // bits are CSR-position ordered within the shard; row p's bits
      // must equal the whole-corpus build's bits for the same id
      for (p <- 0 until sx.n; w <- 0 until sx.nWords)
        assert(sx.words(p * sx.nWords + w) ==
          flat.words(flatPos(sx.ids(sx.cellMembers(p))) * flat.nWords + w))
    }
    // full-probe sharded serve == flat BQ serve (both rerank the
    // whole population on the same grid)
    val viaFlat = Similarity.topkBqFlat(qDf, "emb", flat, 5, Metric.Cosine,
        shortlist = 800)
      .select("qid", "rank", "index")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaShards = Similarity.topkIvfBqSharded(qDf, "qid", "emb", shards,
        5, nProbe = 4, shortlist = 800)
      .select("qid", "rank", "index")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaFlat == viaShards)
  }

  test("driver-gate geometry: recall on the real embeddings tables holds the gate floor") {
    // the same computation as SparkEntry's ann_ivfbq_recall gate at
    // both verify and bench scale — keeps the pin and the measurement
    // in one place
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if new java.io.File(dir).isDirectory) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
      val exact = Similarity.topkFlat(q, "embedding", cx, 10, Metric.Cosine)
        .select("vec_id", "index").as[(Long, Long)].collect().toSet
      val got = Similarity.topkIvfBqFlat(q, "embedding",
          Similarity.quantizeIvfBq(cx, nCells = 32), 10, nProbe = 8,
          shortlist = 400)
        .select("vec_id", "index").as[(Long, Long)].collect().toSet
      val recall = (exact & got).size.toDouble / exact.size
      info(f"$dir: ivf+bq recall@10 (nCells=32, nProbe=8, shortlist=400) = $recall%.4f")
      assert(recall >= 0.6, s"$dir: recall $recall under the ann_ivfbq_recall floor")
    }
  }

  test("contract edges: null query, k clamp, dim mismatch, shortlist < k, bad args") {
    val cDf = clustered(80, 16, 4, seed = 131).toDF("id", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val ivf = Similarity.quantizeIvfBq(cx, nCells = 4)
    val qDf = Seq(
      (1L, Some(Seq.fill(16)(0.4))),
      (2L, None)).toDF("qid", "emb")
    val out = Similarity.topkIvfBq(qDf, "emb", ivf, k = 100, nProbe = 4,
      shortlist = 100).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getSeq[Any](byId(1L).fieldIndex("matches")).size == 80)
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("matches")))
    intercept[Exception] {
      Similarity.topkIvfBq(Seq((9L, Seq.fill(4)(1.0))).toDF("qid", "emb"),
        "emb", ivf, 5, nProbe = 2, shortlist = 10).collect()
    }
    intercept[IllegalArgumentException] {
      Similarity.topkIvfBq(qDf, "emb", ivf, 10, nProbe = 2, shortlist = 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.topkIvfBq(qDf, "emb", ivf, 5, nProbe = 0, shortlist = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.quantizeIvfBq(cx, nCells = 0)
    }
  }

  test("deterministic across partitionings") {
    val cDf = clustered(400, 24, 8, seed = 141).toDF("id", "emb")
    val qDf = clustered(40, 24, 8, seed = 142).toDF("qid", "emb")
    val ivf = Similarity.quantizeIvfBq(
      Similarity.collectCorpus(cDf, "id", "emb"), nCells = 8)
    def run(parts: Int) =
      Similarity.topkIvfBqFlat(qDf.repartition(parts), "emb", ivf, 5,
          nProbe = 3, shortlist = 60)
        .select("qid", "rank", "index", "score")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) == run(7))
  }

  private def flatRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
    df.select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("filtered: subset, full-probe parity with filtered flat BQ, all-id parity, k clamp") {
    val cDf = clustered(500, 24, 10, seed = 151).toDF("id", "emb")
    val qDf = clustered(40, 24, 10, seed = 152).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val flat = Similarity.quantizeBq(cx)
    val ivf = Similarity.quantizeIvfBq(cx, nCells = 8)
    val allowed = ivf.ids.filter(_ % 3 == 0)
    val filtered = flatRows(Similarity.topkIvfBqFilteredFlat(qDf, "emb",
      ivf, allowed, 5, nProbe = 8, shortlist = 500))
    assert(filtered.nonEmpty && filtered.forall(_._3 % 3 == 0))
    // probing EVERY cell with a full shortlist reproduces the
    // filtered flat serve exactly (same bits, same mask semantics,
    // scan-order-independent bounded selection)
    val viaFlat = flatRows(Similarity.topkBqFilteredFlat(qDf, "emb",
      flat, allowed, 5, Metric.Cosine, shortlist = 500))
    assert(filtered == viaFlat)
    // all-id filter == unfiltered, bit for bit
    val all = flatRows(Similarity.topkIvfBqFlat(qDf, "emb", ivf, 5,
      nProbe = 4, shortlist = 100))
    val allF = flatRows(Similarity.topkIvfBqFilteredFlat(qDf, "emb", ivf,
      ivf.ids, 5, nProbe = 4, shortlist = 100))
    assert(all == allF)
    // k > |allowed| clamps to the allowed population (full probe so
    // routing can't hide an allowed row)
    val tiny = ivf.ids.filter(_ % 100 == 0)
    val clamped = flatRows(Similarity.topkIvfBqFilteredFlat(qDf, "emb",
      ivf, tiny, 50, nProbe = 8, shortlist = 500))
    assert(clamped.groupBy(_._1).values.forall(_.map(_._3).toSet == tiny.toSet))
  }

  test("sharded filtered/tombstoned/waves: complement parity, bounded peak") {
    val cDf = clustered(600, 24, 12, seed = 161).toDF("id", "emb")
    val qDf = clustered(40, 24, 12, seed = 162).toDF("qid", "emb")
    val shards = Similarity.buildIvfBqSharded(cDf, "id", "emb",
      numShards = 3, nCells = 4)
    val allIds = shards.flatMap(_.ids)
    val dead = allIds.filter(_ % 4 == 0).toArray
    val live = allIds.filter(_ % 4 != 0).toArray
    val tombstoned = flatRows(Similarity.topkIvfBqShardedTombstoned(qDf,
      "qid", "emb", shards, dead, 5, nProbe = 4, shortlist = 200))
    assert(tombstoned.nonEmpty && tombstoned.forall(_._3 % 4 != 0))
    val viaAllow = flatRows(Similarity.topkIvfBqShardedFiltered(qDf,
      "qid", "emb", shards, live, 5, nProbe = 4, shortlist = 200))
    assert(tombstoned == viaAllow)
    // DataFrame-allowed overload parity (multi-shard one-pass mask)
    val viaDf = flatRows(Similarity.topkIvfBqShardedFiltered(qDf,
      "qid", "emb", shards, live.toSeq.toDF("id"), "id", 5, nProbe = 4,
      shortlist = 200))
    assert(tombstoned == viaDf)
    // wave serve: waveSize-1 parity with the all-resident sharded form
    val plain = flatRows(Similarity.topkIvfBqSharded(qDf, "qid", "emb",
      shards, 5, nProbe = 4, shortlist = 200))
    val meter = new Similarity.ShardedServeMeter
    val waved = flatRows(Similarity.topkIvfBqShardedWaves(qDf, "qid",
      "emb", shards, 5, nProbe = 4, shortlist = 200, waveSize = 1,
      meter = meter))
    assert(plain == waved)
    val per = shards.map(sx => org.apache.spark.util.SizeEstimator.estimate(sx))
    assert(meter.peakLiveBroadcastBytes == per.max &&
      meter.peakLiveBroadcastBytes < per.sum)
    assert(meter.liveBroadcastBytes == 0L)
    // tombstones ride the waves too
    val wavedDeny = flatRows(Similarity.topkIvfBqShardedWaves(qDf, "qid",
      "emb", shards, 5, nProbe = 4, shortlist = 200, waveSize = 2,
      deniedIds = dead))
    assert(wavedDeny == tombstoned)
  }
}
