package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF+PQ composite index: recall against the exact kernel, the
  * all-cells-probed ≥ few-cells-probed monotonicity, unit-norm
  * score correctness, CSR integrity, and the exact-kernel contract
  * edges (null query, k > corpus, dim mismatch, zero-norm rows).
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
  }

  private def recall(exact: Set[(Long, Long)], got: Set[(Long, Long)]): Double =
    got.intersect(exact).size.toDouble / exact.size

  test("index integrity: CSR partitions the corpus; codes are m bytes per vector") {
    val cx = Similarity.collectCorpus(randVecs(500, 32, 3).toDF("id", "emb"), "id", "emb")
    val ix = Similarity.quantizeIvfPq(cx, nCells = 8, m = 8)
    assert(ix.codes.length == 500 * 8)
    assert(ix.cellStart.head == 0 && ix.cellStart.last == 500)
    assert(ix.cellMembers.sorted.sameElements(0 until 500))
    (0 until 500).foreach { g =>
      val c = ix.cellOf(g)
      val inCell = ix.cellMembers.slice(ix.cellStart(c), ix.cellStart(c + 1))
      assert(inCell.contains(g))
    }
  }

  test("recall vs exact kernel: >= 0.5 at nProbe=4/16 ADC, rerank only improves, full probe >= pure PQ shape") {
    val cDf = randVecs(2000, 32, 11).toDF("id", "emb")
    val qDf = randVecs(100, 32, 13).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val exact = Similarity.topkFlat(qDf, "emb", cx, 10, Metric.Cosine)
      .select("qid", "index").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ix = Similarity.quantizeIvfPq(cx, nCells = 16, m = 16)
    def got(nProbe: Int, shortlist: Int) =
      Similarity.topkIvfPqFlat(qDf, "emb", ix, 10, nProbe, shortlist)
        .select("qid", "index").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc4 = recall(exact, got(4, 0))
    val rr4 = recall(exact, got(4, 50))
    val adc16 = recall(exact, got(16, 0))
    // gaussian noise is IVF's worst case (no cluster structure: the
    // true NNs spread uniformly over cells, so 4/16 probes bounds
    // recall near 0.5 regardless of PQ fidelity); the full-probe
    // floor below is the quantization-quality assertion
    assert(adc4 >= 0.4, s"ADC recall at nProbe=4: $adc4")
    assert(rr4 >= adc4 - 1e-9, s"rerank must not hurt: $rr4 < $adc4")
    assert(adc16 >= adc4 - 1e-9, s"probing all cells must not hurt: $adc16 < $adc4")
    assert(adc16 >= 0.7, s"full-probe ADC recall: $adc16")
  }

  test("scores are true cosines up to quantization error; unit-norm geometry holds") {
    val cDf = randVecs(300, 16, 17).toDF("id", "emb")
    val qDf = randVecs(20, 16, 19).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val exactTop = Similarity.topkFlat(qDf, "emb", cx, 3, Metric.Cosine)
      .select("qid", "index", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ix = Similarity.quantizeIvfPq(cx, nCells = 4, m = 8)
    val got = Similarity.topkIvfPqFlat(qDf, "emb", ix, 3, nProbe = 4, shortlist = 20)
      .select("qid", "index", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    var matched = 0
    got.foreach { case (key, s) =>
      exactTop.get(key).foreach { es => matched += 1
        assert(math.abs(s - es) <= 0.15, s"$key: ivfpq $s vs exact $es")
      }
    }
    assert(matched > 20, s"too few overlapping pairs to validate scores: $matched")
  }

  test("sharded build+search: result parity with the sequential per-shard recipe") {
    // the round-9 10M smoke built its shards in a SEQUENTIAL driver
    // loop and merged per-shard top-k driver-side (ScaleSmoke's
    // "ivfpq sharded" stage before round 10); the operator builds the
    // same shards CONCURRENTLY and merges with a distributed window.
    // Both paths must produce identical rows — shard training is
    // deterministic, so concurrency may change nothing.
    val numShards = 4
    val cDf = randVecs(2000, 32, 29).toDF("id", "emb")
    val qDf = randVecs(60, 32, 31).toDF("qid", "emb")
    val seqShards = (0 until numShards).map { b =>
      val block = cDf.filter(
        pmod(xxhash64(col("id").cast("long")), lit(numShards)) === b)
      Similarity.quantizeIvfPq(
        Similarity.collectCorpus(block, "id", "emb"), nCells = 8, m = 8)
    }
    val driverMerged = seqShards.flatMap { ix =>
      Similarity.topkIvfPqFlat(qDf, "emb", ix, 10, nProbe = 4, shortlist = 50)
        .select("qid", "index", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.groupBy(_._1).map { case (q, rs) =>
      q -> rs.sortBy(t => (-t._3, t._2)).take(10).map(t => (t._2, t._3)).toSeq
    }
    val shards = Similarity.buildIvfPqSharded(
      cDf, "id", "emb", numShards, nCells = 8, m = 8)
    assert(shards.size == numShards)
    // concurrent builds are byte-identical to the sequential recipe's
    shards.zip(seqShards).foreach { case (a, b) =>
      assert(a.ids.sameElements(b.ids) && a.codes.sameElements(b.codes))
      assert(a.centroids.sameElements(b.centroids) && a.cellOf.sameElements(b.cellOf))
      assert(a.codebooks.sameElements(b.codebooks))
    }
    // the distributed merge equals the driver-side merge, ranks included
    val got = Similarity.topkIvfPqSharded(
        qDf, "emb", "qid", shards, 10, nProbe = 4, shortlist = 50)
      .select("qid", "rank", "index", "score").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    assert(got == driverMerged)
    assert(got.values.forall(_.size == 10))
  }

  test("heap-throttled sharded build: a 1-byte in-flight budget degrades to sequential, bit-identical shards") {
    // the throttle gates concurrent collects on priced bytes (the
    // round-9 10M par=8 smoke OOMed the driver); admission order must
    // never change the arithmetic — an over-budget shard runs alone,
    // so the tightest budget serializes the build and still matches
    val cDf = randVecs(1200, 32, 59).toDF("id", "emb")
    val free = Similarity.buildIvfPqSharded(
      cDf, "id", "emb", 4, nCells = 8, m = 8)
    val throttled = Similarity.buildIvfPqSharded(
      cDf, "id", "emb", 4, nCells = 8, m = 8, maxInFlightBytes = 1L)
    free.zip(throttled).foreach { case (a, b) =>
      assert(a.ids.sameElements(b.ids) && a.codes.sameElements(b.codes))
      assert(a.centroids.sameElements(b.centroids))
      assert(a.codebooks.sameElements(b.codebooks))
      assert(a.sq8.get.codes.sameElements(b.sq8.get.codes))
    }
  }

  test("wave-served sharded search: row parity with the all-resident form; peak broadcast = one wave, not Σ shards") {
    val cDf = randVecs(2400, 32, 43).toDF("id", "emb")
    val qDf = randVecs(60, 32, 53).toDF("qid", "emb")
    val shards = Similarity.buildIvfPqSharded(
      cDf, "id", "emb", 6, nCells = 8, m = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "index", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val allResident = rows(Similarity.topkIvfPqSharded(
      qDf, "emb", "qid", shards, 10, nProbe = 4, shortlist = 50))
    Similarity.ShardedServeStats.reset()
    val waved = rows(Similarity.topkIvfPqShardedWaves(
      qDf, "emb", "qid", shards, 10, nProbe = 4, shortlist = 50, waveSize = 2))
    // lossless: per-wave top-k cuts cannot drop a global top-k row,
    // and ties pin to lowest index in both forms — identical rows,
    // rank for rank
    assert(waved == allResident)
    // bounded memory: the live-broadcast high-water mark is exactly
    // the largest single wave (2 of 6 shards), never the Σ-shards
    // ceiling the all-resident form pins
    val per = shards.map(ix => org.apache.spark.util.SizeEstimator.estimate(ix))
    val peak = Similarity.ShardedServeStats.peakLiveBroadcastBytes
    assert(peak == per.grouped(2).map(_.sum).max,
      s"peak $peak != max wave ${per.grouped(2).map(_.sum).max}")
    assert(peak < per.sum, s"peak $peak not below total ${per.sum}")
    assert(Similarity.ShardedServeStats.liveBroadcastBytes == 0L,
      "wave broadcasts not all destroyed")
    // waveSize=1: peak is the single largest shard — the ∝ max-shard
    // end of the contract
    Similarity.ShardedServeStats.reset()
    val oneAtATime = rows(Similarity.topkIvfPqShardedWaves(
      qDf, "emb", "qid", shards, 10, nProbe = 4, shortlist = 50, waveSize = 1))
    assert(oneAtATime == allResident)
    assert(Similarity.ShardedServeStats.peakLiveBroadcastBytes == per.max)
    // memoryPartials: eager localCheckpoint partials instead of
    // parquet scratch (the round-12 wave-overhead A/B's in-memory
    // path) — identical rows, same one-wave broadcast bound, and the
    // result stays readable AFTER the wave broadcasts are destroyed
    // (the lineage cut is what makes that legal)
    Similarity.ShardedServeStats.reset()
    val inMem = Similarity.topkIvfPqShardedWaves(
      qDf, "emb", "qid", shards, 10, nProbe = 4, shortlist = 50,
      waveSize = 2, memoryPartials = true)
    assert(rows(inMem) == allResident)
    assert(Similarity.ShardedServeStats.peakLiveBroadcastBytes ==
      per.grouped(2).map(_.sum).max)
    assert(Similarity.ShardedServeStats.liveBroadcastBytes == 0L)
    // a second action over the same result re-reads the checkpoints,
    // not the (destroyed) broadcasts
    assert(inMem.count() == allResident.size)
  }

  test("wave scratch policy: the driver-local temp default REFUSES off local mode") {
    // round-11 verdict #2: with the default scratch on a real cluster,
    // executors would write wave partials to THEIR local filesystems
    // and the merge would read nothing — fail fast with a named error
    val e = intercept[IllegalArgumentException] {
      Similarity.resolveWaveScratch(isLocal = false, scratchDir = "")
    }
    assert(e.getMessage.contains("shared-filesystem scratchDir"))
    // an explicit path passes through untouched regardless of master
    assert(Similarity.resolveWaveScratch(isLocal = false, "/shared/scratch")
      == "/shared/scratch")
    // local default mints a real directory (cleaned at JVM exit)
    val d = Similarity.resolveWaveScratch(isLocal = true, "")
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))
  }

  test("per-invocation ShardedServeMeter: a private meter measures its serve alone") {
    // round-11 ADVICE: the process-global singleton interleaves
    // concurrent serves; a caller-owned meter must see exactly its own
    // waves and leave the global default untouched
    val cDf = randVecs(800, 32, 89).toDF("id", "emb")
    val qDf = randVecs(20, 32, 97).toDF("qid", "emb")
    val shards = Similarity.buildIvfPqSharded(cDf, "id", "emb", 4, nCells = 4, m = 8)
    val per = shards.map(ix => org.apache.spark.util.SizeEstimator.estimate(ix))
    Similarity.ShardedServeStats.reset()
    val meter = new Similarity.ShardedServeMeter
    Similarity.topkIvfPqShardedWaves(
        qDf, "emb", "qid", shards, 5, nProbe = 4, waveSize = 1, meter = meter)
      .collect()
    assert(meter.peakLiveBroadcastBytes == per.max)
    assert(meter.liveBroadcastBytes == 0L)
    assert(Similarity.ShardedServeStats.peakLiveBroadcastBytes == 0L,
      "a private meter must not leak into the global default")
  }

  test("sharded edges: one shard degenerates to the single index; empty corpus refuses") {
    val cDf = randVecs(300, 16, 37).toDF("id", "emb")
    val qDf = randVecs(10, 16, 41).toDF("qid", "emb")
    val single = Similarity.quantizeIvfPq(
      Similarity.collectCorpus(cDf, "id", "emb"), nCells = 4, m = 8)
    val shards = Similarity.buildIvfPqSharded(cDf, "id", "emb", 1, nCells = 4, m = 8)
    assert(shards.size == 1 && shards.head.codes.sameElements(single.codes))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "index", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(Similarity.topkIvfPqSharded(qDf, "emb", "qid", shards, 5, nProbe = 4))
      == rows(Similarity.topkIvfPqFlat(qDf, "emb", single, 5, nProbe = 4)))
    val e = intercept[IllegalArgumentException] {
      Similarity.buildIvfPqSharded(
        cDf.filter(lit(false)), "id", "emb", 4, nCells = 4, m = 8)
    }
    assert(e.getMessage.contains("Empty corpus"))
  }

  test("contract edges: null query row, k > corpus, dim mismatch, zero-norm corpus row") {
    val base = randVecs(50, 16, 23)
    val withZero = base :+ (50L -> Seq.fill(16)(0.0))
    val cx = Similarity.collectCorpus(withZero.toDF("id", "emb"), "id", "emb")
    val ix = Similarity.quantizeIvfPq(cx, nCells = 4, m = 8)
    val qs = Seq(
      (1L, Some(Seq.fill(16)(1.0))),
      (2L, None)).toDF("qid", "emb")
    val out = Similarity.topkIvfPq(qs, "emb", ix, k = 60, nProbe = 4)
      .select("qid", "matches").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[org.apache.spark.sql.Row](1))).toMap
    assert(out(2L) == null)                  // null query → null matches
    assert(out(1L).size == 51)               // k clamps to corpus size
    val e = intercept[Exception] {
      Similarity.topkIvfPq(Seq((9L, Seq.fill(8)(1.0))).toDF("qid", "emb"),
        "emb", ix, 3, 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("filtered search: subset-only results; full probe finds the exact filtered set; parity on all-true mask") {
    val cDf = randVecs(800, 32, 29).toDF("id", "emb")
    val qDf = randVecs(40, 32, 31).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val ix = Similarity.quantizeIvfPq(cx, nCells = 8, m = 8)
    val allowed = (0L until 800L).filter(_ % 3 == 0).toArray
    // SUBSET + exactness of the mask at full probe: every allowed row
    // is scanned when all cells are probed, so the result set is the
    // true filtered ADC top-k — and never contains a disallowed id
    val got = Similarity.topkIvfPqFilteredFlat(qDf, "emb", ix, allowed,
        10, nProbe = 8, shortlist = 50)
      .select("qid", "index").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.forall(_._2 % 3 == 0), "mask leaked a disallowed id")
    // filtered recall vs the brute-force kernel over ONLY allowed rows
    val fcx = Similarity.collectCorpus(
      cDf.filter(col("id") % 3 === 0), "id", "emb")
    val exact = Similarity.topkFlat(qDf, "emb", fcx, 10, Metric.Cosine)
      .select("qid", "index").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recall(exact, got.toSet) >= 0.7,
      s"filtered full-probe rerank recall: ${recall(exact, got.toSet)}")
    // PARITY: all-id mask == unfiltered, scores included
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "index", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(Similarity.topkIvfPqFilteredFlat(qDf, "emb", ix,
        (0L until 800L).toArray, 5, nProbe = 4, shortlist = 20))
      == rows(Similarity.topkIvfPqFlat(qDf, "emb", ix, 5, nProbe = 4, shortlist = 20)))
  }

  test("filtered edges: k clamps to |allowed|; empty/unknown allowed sets; DataFrame overload dedups and ignores strangers") {
    val cDf = randVecs(200, 16, 37).toDF("id", "emb")
    val qDf = randVecs(5, 16, 41).toDF("qid", "emb")
    val ix = Similarity.quantizeIvfPq(
      Similarity.collectCorpus(cDf, "id", "emb"), nCells = 4, m = 8)
    // k > |allowed| returns exactly the allowed rows (full probe)
    val tiny = Array(7L, 11L, 13L)
    val out = Similarity.topkIvfPqFiltered(qDf, "emb", ix, tiny,
        k = 50, nProbe = 4)
      .select("qid", "matches").collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    out.values.foreach { ms =>
      assert(ms.map(_.getLong(0)).toSet == tiny.toSet,
        s"k>|allowed| must return every allowed row, got ${ms.map(_.getLong(0))}")
    }
    // empty intersection → empty match arrays, not nulls
    val empty = Similarity.topkIvfPqFiltered(qDf, "emb", ix,
        Array(9999L, -5L), k = 3, nProbe = 4)
      .select("matches").collect()
    assert(empty.forall(r => !r.isNullAt(0) && r.getSeq[Any](0).isEmpty))
    // DataFrame overload: duplicates and unknown ids fall out; result
    // matches the array form on the deduped intersection
    val dfAllowed = Seq(7L, 7L, 11L, 13L, 9999L).toDF("id")
    val viaDf = Similarity.topkIvfPqFiltered(qDf, "emb", ix, dfAllowed, "id",
        50, 4, 0, "matches")
      .select("qid", "matches").collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(m => (m.getLong(0), m.getDouble(1))).toSet).toMap
    val viaArr = out.map { case (q, ms) =>
      q -> ms.map(m => (m.getLong(0), m.getDouble(1))).toSet }
    assert(viaDf == viaArr)
    // the distributed mask build: an allowed DataFrame FAR larger
    // than the corpus (the shape the old driver-collect overload
    // refused) works — ids never collect; only matched positions
    // (≤ corpus n) come back. A strict superset == unfiltered.
    val spark2 = qDf.sparkSession
    val huge = spark2.range(0L, 100000L).toDF("id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "matches").collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(m => (m.getLong(0), m.getDouble(1))).toSet).toMap
    assert(rows(Similarity.topkIvfPqFiltered(qDf, "emb", ix, huge, "id",
        5, 4, 0, "matches"))
      == rows(Similarity.topkIvfPq(qDf, "emb", ix, 5, nProbe = 4)))
  }

  test("sharded filtered search: subset holds across the merge; all-id filter == plain sharded") {
    val cDf = randVecs(600, 16, 43).toDF("id", "emb")
    val qDf = randVecs(20, 16, 47).toDF("qid", "emb")
    val shards = Similarity.buildIvfPqSharded(cDf, "id", "emb",
      numShards = 3, nCells = 4, m = 8)
    val allowed = (0L until 600L).filter(_ % 2 == 0).toArray
    val got = Similarity.topkIvfPqShardedFiltered(qDf, "emb", "qid", shards,
        allowed, 8, nProbe = 4, shortlist = 30)
      .select("qid", "rank", "index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty && got.forall(_._3 % 2 == 0))
    assert(got.groupBy(_._1).values.forall(_.length <= 8))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "index", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(Similarity.topkIvfPqShardedFiltered(qDf, "emb", "qid", shards,
        (0L until 600L).toArray, 5, nProbe = 4))
      == rows(Similarity.topkIvfPqSharded(qDf, "emb", "qid", shards, 5, nProbe = 4)))
    // the DataFrame-allowed overload (one-pass multi-shard mask, ids
    // never collected) returns the identical rows as the array form
    import spark.implicits._
    assert(rows(Similarity.topkIvfPqShardedFiltered(qDf, "emb", "qid", shards,
        allowed.toSeq.toDF("id"), "id", 8, nProbe = 4, shortlist = 30))
      == rows(Similarity.topkIvfPqShardedFiltered(qDf, "emb", "qid", shards,
        allowed, 8, nProbe = 4, shortlist = 30)))
  }

  test("wave-served filtered search: row parity with the all-resident filtered form; peak stays one wave") {
    val cDf = randVecs(600, 16, 53).toDF("id", "emb")
    val qDf = randVecs(15, 16, 59).toDF("qid", "emb")
    val shards = Similarity.buildIvfPqSharded(cDf, "id", "emb",
      numShards = 4, nCells = 4, m = 8)
    val allowed = (0L until 600L).filter(_ % 3 == 0).toArray
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "index", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val meter = new Similarity.ShardedServeMeter
    val waved = rows(Similarity.topkIvfPqShardedWaves(qDf, "emb", "qid", shards,
      6, nProbe = 4, shortlist = 20, waveSize = 2, meter = meter,
      allowedIds = allowed))
    assert(waved == rows(Similarity.topkIvfPqShardedFiltered(qDf, "emb", "qid",
      shards, allowed, 6, nProbe = 4, shortlist = 20)))
    assert(waved.nonEmpty && waved.forall(_._3 % 3 == 0))
    val perShard = shards.map(ix => org.apache.spark.util.SizeEstimator.estimate(ix))
    assert(meter.peakLiveBroadcastBytes <= perShard.grouped(2).map(_.sum).max,
      "filtered wave serve exceeded the one-wave peak bound")
    assert(meter.liveBroadcastBytes == 0L)
  }
}
