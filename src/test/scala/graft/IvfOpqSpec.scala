package graft

import graft.operators.{Metric, Similarity}
import graft.sources.{Sink, Source}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF+OPQ — the learned rotation composed with the routed
  * residual-PQ family: serve equivalence with pre-rotated queries,
  * correlated-corpus ADC gain through the router, collect-vs-
  * distributed build parity (bit-identical rotation AND index),
  * persist round-trip with both reader refusals, and the lifecycle
  * (append/delete/compact) carrying the rotation forward.
  */
class IvfOpqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  /** Correlated rows: per-dim decay then a fixed mixing rotation —
    * the geometry where OPQ's rotation pays (dim 32, m 8).
    */
  private def correlated(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    val mix = Similarity.polarRotationMax(
      Array.tabulate(dim, dim)((_, _) => rnd.nextGaussian()))
    (0L until n.toLong).map { i =>
      val latent = Array.tabulate(dim)(d => rnd.nextGaussian() * math.pow(0.88, d))
      val out = new Array[Double](dim)
      Similarity.rotateRow(mix, latent, 0, dim, out, 0)
      i -> out.toSeq
    }
  }

  test("serve ≡ pre-rotated queries against the inner IVF+PQ index") {
    val rows = correlated(400, 32, seed = 211)
    val cDf = rows.toDF("id", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val ox = Similarity.quantizeIvfOpq(cx, nCells = 8, m = 8)
    // rotating queries up front and serving the inner index must give
    // the same ids/ranks (scores agree up to the raw-vs-rotated qSq
    // FP difference, which R-orthogonality bounds at ~1e-12)
    val qDf = correlated(50, 32, seed = 212).toDF("qid", "emb")
    val qRot = correlated(50, 32, seed = 212).map { case (id, v) =>
      val out = new Array[Double](32)
      Similarity.rotateRow(ox.rot, v.toArray, 0, 32, out, 0)
      (id, out.toSeq)
    }.toDF("qid", "emb")
    val viaOpq = Similarity.topkIvfOpqFlat(qDf, "emb", ox, 5, nProbe = 8,
        shortlist = 50)
      .select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val viaInner = Similarity.topkIvfPqFlat(qRot, "emb", ox.ivf, 5,
        nProbe = 8, shortlist = 50)
      .select("qid", "rank", "index", "score")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaOpq.map(r => (r._1, r._2, r._3)) == viaInner.map(r => (r._1, r._2, r._3)))
    viaOpq.zip(viaInner).foreach { case (a, b) =>
      assert(math.abs(a._4 - b._4) < 1e-9, s"$a vs $b")
    }
    // the inner index IS quantizeIvfPq of the rotated pack
    val direct = Similarity.quantizeIvfPq(
      Similarity.rotateIndex(cx, ox.rot), nCells = 8, m = 8)
    assert(ox.ivf.codes.sameElements(direct.codes))
    assert(ox.ivf.centroids.sameElements(direct.centroids))
    assert(ox.ivf.cellOf.sameElements(direct.cellOf))
  }

  test("correlated-corpus ADC gain through the router at identical bits") {
    val rows = correlated(1500, 32, seed = 221)
    val cDf = rows.toDF("id", "emb")
    val qDf = correlated(120, 32, seed = 222).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val exact = Similarity.topkFlat(qDf, "emb", cx, 10, Metric.Cosine)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("qid", "index").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val rPq = recall(Similarity.topkIvfPqFlat(qDf, "emb",
      Similarity.quantizeIvfPq(cx, nCells = 8, m = 8, withRerank = false),
      10, nProbe = 4))
    val rOpq = recall(Similarity.topkIvfOpqFlat(qDf, "emb",
      Similarity.quantizeIvfOpq(cx, nCells = 8, m = 8, withRerank = false),
      10, nProbe = 4))
    info(f"ADC-only recall@10: ivfpq=$rPq%.4f ivfopq=$rOpq%.4f")
    assert(rOpq >= rPq, s"rotation must not lose recall: $rOpq vs $rPq")
  }

  test("sharded build: one corpus-wide rotation, merged serve, rotation identity") {
    val rows = correlated(800, 32, seed = 231)
    val cDf = rows.toDF("id", "emb")
    val qDf = correlated(50, 32, seed = 232).toDF("qid", "emb")
    val b = Similarity.buildIvfOpqShardedWithLayout(cDf, "id", "emb",
      numShards = 3, nCells = 4, m = 8)
    assert(b.shards.map(_.n).sum == 800)
    // merged serve returns k rows per query with sane recall
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val exact = Similarity.topkFlat(qDf, "emb", cx, 10, Metric.Cosine)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    val got = Similarity.topkIvfOpqSharded(qDf, "emb", "qid", b.rot,
        b.shards, 10, nProbe = 4, shortlist = 100)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"sharded IVF+OPQ recall@10 = $recall%.4f")
    assert(recall >= 0.6, s"recall $recall")
    // rotation is orthogonal by construction
    val d = 32
    for (i <- 0 until d; j <- i until d) {
      var acc = 0.0
      for (k2 <- 0 until d) acc += b.rot(i * d + k2) * b.rot(j * d + k2)
      assert(math.abs(acc - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RRᵀ($i,$j)=$acc")
    }
  }

  test("distributed build is bit-identical to the collect build; persist round-trips; readers refuse crosswise") {
    val rows = correlated(600, 32, seed = 241)
    val cDf = rows.toDF("id", "emb")
    val base = java.nio.file.Files.createTempDirectory("ivfopq").toString
    Sink.writeIvfOpqShardedIndexDistributed(spark, cDf, "id", "emb",
      numShards = 3, nCells = 4, m = 8, path = s"$base/dist")
    val (rotD, shardsD) = Source.readIvfOpqShardedIndex(spark, s"$base/dist")
    val b = Similarity.buildIvfOpqShardedWithLayout(cDf, "id", "emb",
      numShards = 3, nCells = 4, m = 8)
    // same hash-sampled rotation training -> bit-identical R
    assert(rotD.sameElements(b.rot))
    // and therefore bit-identical shards end to end
    assert(shardsD.size == b.shards.size)
    shardsD.zip(b.shards).foreach { case (l, r) =>
      assert(l.ids.sameElements(r.ids))
      assert(l.codes.sameElements(r.codes))
      assert(l.centroids.sameElements(r.centroids))
      assert(l.codebooks.sameElements(r.codebooks))
      assert(l.cellOf.sameElements(r.cellOf))
      assert(l.sq8.get.codes.sameElements(r.sq8.get.codes))
      assert(l.sq8.get.norms.sameElements(r.sq8.get.norms))
    }
    // collect-build persist round-trips byte-identically too
    Sink.writeIvfOpqShardedIndex(spark, b, s"$base/collect")
    val (rotC, shardsC) = Source.readIvfOpqShardedIndex(spark, s"$base/collect")
    assert(rotC.sameElements(b.rot))
    assert(shardsC.zip(b.shards).forall { case (l, r) =>
      l.ids.sameElements(r.ids) && l.codes.sameElements(r.codes) &&
        l.centroids.sameElements(r.centroids)
    })
    // the plain reader refuses a rotated index by name...
    assert(intercept[IllegalArgumentException] {
      Source.readIvfPqShardedIndex(spark, s"$base/dist")
    }.getMessage.contains("OPQ rotation"))
    // ...and the OPQ reader refuses a plain index
    Sink.writeIvfPqShardedIndex(spark,
      Similarity.buildIvfPqShardedWithLayout(cDf, "id", "emb",
        numShards = 3, nCells = 4, m = 8), s"$base/plain", overwrite = false)
    assert(intercept[IllegalArgumentException] {
      Source.readIvfOpqShardedIndex(spark, s"$base/plain")
    }.getMessage.contains("no rot/"))
  }

  test("wave serve + streaming serve auto-apply the rotation") {
    import graft.operators.Similarity
    val rows = correlated(600, 32, seed = 261)
    val cDf = rows.toDF("id", "emb")
    val qDf = correlated(40, 32, seed = 262).toDF("qid", "emb")
    val b = Similarity.buildIvfOpqShardedWithLayout(cDf, "id", "emb",
      numShards = 3, nCells = 4, m = 8)
    // wave serve == all-resident OPQ sharded serve, bounded peak
    val expected = Similarity.topkIvfOpqSharded(qDf, "emb", "qid", b.rot,
        b.shards, 5, nProbe = 4, shortlist = 60)
      .select("qid", "rank", "index")
      .as[(Long, Int, Long)].collect().toSet
    val meter = new Similarity.ShardedServeMeter
    val waved = Similarity.topkIvfOpqShardedWaves(qDf, "emb", "qid", b.rot,
        b.shards, 5, nProbe = 4, shortlist = 60, waveSize = 1, meter = meter)
      .select("qid", "rank", "index")
      .as[(Long, Int, Long)].collect().toSet
    assert(waved == expected)
    val per = b.shards.map(ix => org.apache.spark.util.SizeEstimator.estimate(ix))
    assert(meter.peakLiveBroadcastBytes == per.max &&
      meter.peakLiveBroadcastBytes < per.sum)
    assert(meter.liveBroadcastBytes == 0L)
    // the STREAMING persisted-index serve reads shard dirs directly,
    // bypassing the reader's rotation refusal — it must auto-apply
    // the stored rotation, or serving is silently wrong
    val base = java.nio.file.Files.createTempDirectory("ivfopq-stream").toString
    graft.sources.Sink.writeIvfOpqShardedIndex(spark, b, s"$base/ix")
    // stream the queries through a memory-free file replay: write the
    // query table as parquet and readStream it
    qDf.write.parquet(s"$base/q")
    val qSchema = spark.read.parquet(s"$base/q").schema
    val results = scala.collection.mutable.Set.empty[(Long, Int, Long)]
    val writer = graft.streaming.EventStream.topkServeIvfPqShardedWaves(
      spark.readStream.schema(qSchema).parquet(s"$base/q"),
      "emb", "qid", s"$base/ix",
      k = 5, nProbe = 4, shortlist = 60, waveSize = 2) { (out, _) =>
      val batchRows = out.select("qid", "rank", "index").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      results.synchronized { results ++= batchRows }
      ()
    }
    val sq = writer.start()
    try sq.processAllAvailable() finally sq.stop()
    assert(results.toSet == expected,
      "streaming serve over an OPQ index diverged from the rotated batch serve")
    assert(results.nonEmpty)
  }

  test("lifecycle with a rotation: append rotates new rows and carries rot; delete/compact carry rot") {
    val rows = correlated(500, 32, seed = 251)
    val evens = rows.filter(_._1 % 2 == 0)
    val odds = rows.filter(_._1 % 2 != 0)
    val base = java.nio.file.Files.createTempDirectory("ivfopq-life").toString
    Sink.writeIvfOpqShardedIndexDistributed(spark, evens.toDF("id", "emb"),
      "id", "emb", numShards = 2, nCells = 4, m = 8, path = s"$base/ix")
    // append: new rows must rotate with the STORED R before encoding
    Sink.appendIvfPqShardedIndex(spark, odds.toDF("id", "emb"), "id", "emb",
      s"$base/ix", s"$base/grown")
    val (rotG, shardsG) = Source.readIvfOpqShardedIndex(spark, s"$base/grown")
    val (rotI, _) = Source.readIvfOpqShardedIndex(spark, s"$base/ix")
    assert(rotG.sameElements(rotI))
    assert(shardsG.map(_.n).sum == 500)
    // the grown index serves both halves: full-probe serve of an odd
    // query's own id must surface it at rank 1
    val qOdd = odds.take(10).toDF("qid", "emb")
    val top1 = Similarity.topkIvfOpqSharded(qOdd, "emb", "qid", rotG,
        shardsG, 1, nProbe = 4, shortlist = 50)
      .select("qid", "index").as[(Long, Long)].collect().toMap
    assert(top1.forall { case (q, ix) => q == ix }, s"self-hit failed: $top1")
    // delete + compact carry the rotation
    Sink.deleteFromIvfPqShardedIndex(spark,
      Seq(1L, 3L, 5L).toDF("id"), "id", s"$base/grown", s"$base/del")
    val p = new org.apache.hadoop.fs.Path(s"$base/del/rot")
    assert(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
    // the tombstoned-OPQ reader restores rot + shards + tombstones;
    // the rotation-unaware tombstone reader refuses by name, and the
    // deny-masked rotated serve never returns a deleted id
    assert(intercept[IllegalArgumentException] {
      Source.readIvfPqShardedIndexWithTombstones(spark, s"$base/del")
    }.getMessage.contains("OPQ rotation"))
    val (rotD2, shardsD2, tsD2) =
      Source.readIvfOpqShardedIndexWithTombstones(spark, s"$base/del")
    assert(rotD2.sameElements(rotG) && tsD2.sorted.toSeq == Seq(1L, 3L, 5L))
    val denied = Similarity.topkIvfOpqShardedWaves(
        odds.take(10).toDF("qid", "emb"), "emb", "qid", rotD2, shardsD2,
        3, nProbe = 4, shortlist = 50, deniedIds = tsD2)
      .select("qid", "index").as[(Long, Long)].collect()
    assert(denied.nonEmpty && denied.forall(r => !Seq(1L, 3L, 5L).contains(r._2)))
    Sink.compactIvfPqShardedIndex(spark, s"$base/del", s"$base/comp")
    val (rotCp, shardsCp) = Source.readIvfOpqShardedIndex(spark, s"$base/comp")
    assert(rotCp.sameElements(rotG))
    assert(shardsCp.map(_.n).sum == 497)
  }
}
