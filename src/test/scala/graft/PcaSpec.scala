package graft

import graft.operators.{Ann, Metric, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA pretransform: hand-checked principal axis, orthonormal basis,
  * variance accounting, projection/reconstruction math, neighbor
  * preservation, and the contract edges (nulls, ragged dims, the
  * O(dim²) guard).
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
  }

  test("hand case: first PC of a correlated 2-d cloud lies on the correlation axis") {
    // points along y = x with small orthogonal noise: PC1 ∝ (1,1)/√2
    val rnd = new scala.util.Random(5)
    val pts = (0L until 500L).map { i =>
      val t = rnd.nextGaussian() * 3.0
      val e = rnd.nextGaussian() * 0.1
      i -> Seq(t + e, t - e)
    }
    val m = Ann.pcaTrain(pts.toDF("id", "emb"), "emb", 1)
    val (b0, b1) = (m.basis(0), m.basis(1))
    assert(math.abs(math.abs(b0) - math.sqrt(0.5)) < 0.02, s"PC1=($b0,$b1)")
    assert(math.abs(b0 - b1) < 0.05, s"PC1 not on the diagonal: ($b0,$b1)")
    // sign convention: largest-|.| entry positive
    assert(math.max(math.abs(b0), math.abs(b1)) > 0 && (if (math.abs(b0) >= math.abs(b1)) b0 else b1) > 0)
    assert(m.varianceCaptured > 0.99, s"diagonal cloud variance: ${m.varianceCaptured}")
    assert(m.n == 500L)
  }

  test("basis is orthonormal; eigenvalues descend; variance accounting sums to 1 at k=dim") {
    val df = randVecs(800, 12, 7).toDF("id", "emb")
    val m = Ann.pcaTrain(df, "emb", 12)
    // rows orthonormal
    for (i <- 0 until 12; j <- i until 12) {
      var dot = 0.0
      var d = 0
      while (d < 12) { dot += m.basis(i * 12 + d) * m.basis(j * 12 + d); d += 1 }
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"basis row $i · row $j = $dot")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(math.abs(m.varianceCaptured - 1.0) < 1e-12)
    // gaussian iid: top-3 of 12 captures ≈ 3/12, nowhere near 1
    val m3 = Ann.pcaTrain(df, "emb", 3)
    assert(m3.varianceCaptured > 0.15 && m3.varianceCaptured < 0.45,
      s"iid gaussian k=3/12 variance: ${m3.varianceCaptured}")
  }

  test("projection matches the driver-side matrix math; k=dim reconstructs exactly") {
    val data = randVecs(60, 8, 11)
    val df = data.toDF("id", "emb")
    val m = Ann.pcaTrain(df, "emb", 8)
    val proj = Ann.pcaProject(df, "emb", m)
      .select(col("id"), col("pca")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    data.foreach { case (id, v) =>
      // expected projection
      val exp = (0 until 8).map { j =>
        (0 until 8).map(d => (v(d) - m.mean(d)) * m.basis(j * 8 + d)).sum
      }
      exp.zip(proj(id)).foreach { case (e, g) => assert(math.abs(e - g) < 1e-9) }
      // reconstruction at k=dim: x = μ + Bᵀ y exactly (orthonormal full basis)
      val rec = (0 until 8).map(d =>
        m.mean(d) + (0 until 8).map(j => proj(id)(j) * m.basis(j * 8 + d)).sum)
      rec.zip(v).foreach { case (r2, x) => assert(math.abs(r2 - x) < 1e-8) }
    }
  }

  test("neighbor preservation: euclidean top-k survives 32->8 projection on near-low-rank data") {
    // PCA preserves neighbors exactly when the data has the low rank
    // the projection keeps — the regime the pretransform is FOR.
    // Points live on a random 8-dim subspace of R^32 plus 1% noise:
    // variance(8) ≈ 1 and top-k must survive nearly intact. (On
    // ISOTROPIC within-cluster noise the fine ordering does NOT
    // survive — measured 0.28 recall on 10 clusters with 0.3σ noise —
    // which is why the gate's floor is measured on the driver corpus,
    // not assumed.)
    val rnd = new scala.util.Random(13)
    val a = Array.fill(8, 32)(rnd.nextGaussian())
    val data = (0L until 800L).map { i =>
      val y = Array.fill(8)(rnd.nextGaussian())
      val x = (0 until 32).map(d =>
        (0 until 8).map(j => y(j) * a(j)(d)).sum + rnd.nextGaussian() * 0.02)
      i -> x
    }
    val df = data.toDF("id", "emb")
    val m = Ann.pcaTrain(df, "emb", 8)
    assert(m.varianceCaptured > 0.99, s"low-rank variance at 8/32: ${m.varianceCaptured}")
    val projected = Ann.pcaProject(df, "emb", m)
      .select(col("id"), col("pca").as("emb"))
    def top(dfx: org.apache.spark.sql.DataFrame) = {
      val cx = Similarity.collectCorpus(dfx, "id", "emb")
      Similarity.topkFlat(dfx.withColumnRenamed("id", "qid"), "emb", cx, 11, Metric.Euclidean)
        .filter(col("qid") =!= col("index"))
        .select("qid", "index").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val full = top(df.select(col("id"), col("emb")))
    val red = top(projected)
    val recall = full.intersect(red).size.toDouble / full.size
    assert(recall >= 0.95, s"euclidean recall after 4x reduction: $recall")
  }

  test("contract edges: null row stays null, ragged dim and oversize k/dim refuse, n>=2") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0, 3.0))),
      (2L, Some(Seq(2.0, 3.0, 4.0))),
      (3L, None)).toDF("id", "emb")
    val m = Ann.pcaTrain(df, "emb", 2)
    assert(m.n == 2L) // null row never trains
    val out = Ann.pcaProject(df, "emb", m).select("id", "pca").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(out(3L) == null && out(1L) != null)
    intercept[IllegalArgumentException] { Ann.pcaTrain(df, "emb", 4) }
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0))).toDF("id", "emb")
    val e = intercept[Exception] { Ann.pcaTrain(ragged, "emb", 1) }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      Ann.pcaTrain(Seq((1L, Seq(1.0))).toDF("id", "emb"), "emb", 1)
    }
  }

  test("truncate: the nested model matches a direct smaller train (to the train pass's FP reduction order)") {
    val df = randVecs(400, 10, 17).toDF("id", "emb")
    val m10 = Ann.pcaTrain(df, "emb", 10)
    val m3direct = Ann.pcaTrain(df, "emb", 3)
    val m3 = m10.truncate(3)
    // two TRAIN passes reduce partition moments in task-arrival order,
    // so they agree only to accumulation error (measured ~8e-15);
    // truncate itself is an exact slice of one trained model
    val bdiff = m3.basis.zip(m3direct.basis).map(p => math.abs(p._1 - p._2)).max
    val ediff = m3.eigenvalues.zip(m3direct.eigenvalues).map(p => math.abs(p._1 - p._2)).max
    assert(bdiff < 1e-10, s"basis diff $bdiff")
    assert(ediff < 1e-10, s"eig diff $ediff")
    assert(m3.basis.sameElements(m10.basis.take(3 * 10)), "truncate must be an exact slice")
    assert(math.abs(m3.varianceCaptured - m3direct.varianceCaptured) < 1e-12)
    assert(m3.k == 3 && m3.dim == 10)
    intercept[IllegalArgumentException] { m10.truncate(11) }
    intercept[IllegalArgumentException] { m10.truncate(0) }
  }

  test("whitened projection: each retained component has ~unit variance on the training corpus") {
    // anisotropic data: dim 0 scaled 10x, dim 3 scaled 0.2x
    val rnd = new scala.util.Random(41)
    val data = (0L until 2000L).map { i =>
      i -> Seq.tabulate(6)(d =>
        rnd.nextGaussian() * (if (d == 0) 10.0 else if (d == 3) 0.2 else 1.0))
    }
    val df = data.toDF("id", "emb")
    val m = Ann.pcaTrain(df, "emb", 6)
    val white = Ann.pcaProject(df, "emb", m, "w", whiten = true)
      .select(col("w")).collect().map(_.getSeq[Double](0).toArray)
    (0 until 6).foreach { j =>
      val xs = white.map(_(j))
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(va - 1.0) < 0.05, s"whitened component $j variance $va")
    }
    // unwhitened leading component carries the 10x direction's variance
    val raw = Ann.pcaProject(df, "emb", m).select(col("pca")).collect()
      .map(_.getSeq[Double](0).toArray)
    val v0 = { val xs = raw.map(_(0)); val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length }
    assert(v0 > 50.0, s"unwhitened PC1 variance should be ~100, got $v0")
  }

  test("random projection: distortion concentrates with k; seeded determinism; nulls pass through") {
    val data = randVecs(300, 64, 23)
    val df = data.toDF("id", "emb")
    def meanDistortion(k: Int): Double = {
      val proj = Ann.randomProject(df, "emb", k, seed = 7L)
        .select(col("id"), col("emb"), col("rp")).collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray))
      val rnd = new scala.util.Random(1)
      val pairs = Array.fill(400)((rnd.nextInt(300), rnd.nextInt(300))).filter(p => p._1 != p._2)
      pairs.map { case (i, j) =>
        val de = proj(i)._1.zip(proj(j)._1).map(p => (p._1 - p._2) * (p._1 - p._2)).sum
        val dp = proj(i)._2.zip(proj(j)._2).map(p => (p._1 - p._2) * (p._1 - p._2)).sum
        math.abs(dp / de - 1.0)
      }.sum / pairs.length
    }
    val d8 = meanDistortion(8)
    val d48 = meanDistortion(48)
    assert(d48 < d8, s"distortion must concentrate with k: k=8 $d8 vs k=48 $d48")
    assert(d48 < 0.2, s"k=48/64 mean distortion: $d48")
    // determinism: same seed → identical columns; different seed differs
    val a = Ann.randomProject(df, "emb", 16, seed = 7L).select("rp").collect()
      .map(_.getSeq[Double](0))
    val b = Ann.randomProject(df, "emb", 16, seed = 7L).select("rp").collect()
      .map(_.getSeq[Double](0))
    val c = Ann.randomProject(df, "emb", 16, seed = 8L).select("rp").collect()
      .map(_.getSeq[Double](0))
    assert(a.zip(b).forall(p => p._1 == p._2))
    assert(a.zip(c).exists(p => p._1 != p._2))
    // nulls stay null; k > dim refuses
    val withNull = Seq((1L, Some(Seq.fill(4)(1.0))), (2L, None)).toDF("id", "emb")
    val out = Ann.randomProject(withNull, "emb", 2).select("id", "rp").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L))
    intercept[IllegalArgumentException] { Ann.randomProject(withNull, "emb", 5) }
  }

  test("compressed pipeline full-dim rerank: recovers reduced-dim recall; full-probe full-shortlist == SQ8 exactness; contracts refuse") {
    // aggressive JL 32→8 on a CLUSTERED corpus (the corpus shape
    // where near-neighbor structure exists to recover — iid gaussian
    // has none): reduced-dim ADC alone loses fine ordering, the
    // full-dim SQ8 rerank of a 100-candidate shortlist buys it back
    val rnd = new scala.util.Random(61)
    val centers = Array.fill(40, 32)(rnd.nextGaussian())
    def member(c: Int): Seq[Double] =
      centers(c).toSeq.map(_ + rnd.nextGaussian() * 0.3)
    val cDf = (0L until 400L).map(i => i -> member((i % 40).toInt))
      .toDF("id", "emb")
    val qDf = (0L until 30L).map(i => i -> member((i % 40).toInt))
      .toDF("qid", "emb")
    val cxFull = Similarity.collectCorpus(cDf, "id", "emb")
    val full = Similarity.quantizeSq8(cxFull)
    val ixRp = Similarity.quantizeIvfPq(
      Similarity.collectCorpus(
        Ann.randomProject(cDf, "emb", 8, seed = 7L).select(col("id"), col("rp")),
        "id", "rp"),
      nCells = 8, m = 4)
    val qProj = Ann.randomProject(qDf, "emb", 8, seed = 7L)
    def recallVsExact(hits: Set[(Long, Long)]): Double = {
      val exact = Similarity.topkFlat(qDf, "emb", cxFull, 10, Metric.Cosine)
        .select("qid", "index").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(hits).size.toDouble / exact.size
    }
    def hitsOf(df: org.apache.spark.sql.DataFrame, qid: String) =
      df.select(col(qid), col("index")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcOnly = recallVsExact(hitsOf(Similarity.topkIvfPqFlat(
      qProj.select(col("qid"), col("rp")), "rp", ixRp, 10, nProbe = 4), "qid"))
    val reranked = recallVsExact(hitsOf(Ann.topkIvfPqRerankFull(
      qProj, "qid", "emb", "rp", ixRp, full, 10, nProbe = 4, shortlist = 100), "qid"))
    assert(reranked > adcOnly,
      s"full-dim rerank did not improve reduced-dim recall: $reranked vs $adcOnly")
    assert(reranked >= 0.8, s"reranked recall floor: $reranked (adc-only $adcOnly)")
    // full probe + corpus-wide shortlist: proposals are ALL rows, so
    // the result is the global SQ8 top-k — only the 8-bit grid error
    // separates it from the f64 exact kernel (the ann_sq8_recall bound)
    val sq8Exact = recallVsExact(hitsOf(Ann.topkIvfPqRerankFull(
      qProj, "qid", "emb", "rp", ixRp, full, 10, nProbe = 8, shortlist = 400), "qid"))
    assert(sq8Exact >= 0.95, s"full-probe full-shortlist recall: $sq8Exact")
    // contracts: shortlist < k refuses; mismatched corpora refuse
    intercept[IllegalArgumentException] {
      Ann.topkIvfPqRerankFull(qProj, "qid", "emb", "rp", ixRp, full, 10, 4, 5)
    }
    val otherSq8 = Similarity.quantizeSq8(
      Similarity.collectCorpus(randVecs(100, 32, 71).toDF("id", "emb"), "id", "emb"))
    intercept[IllegalArgumentException] {
      Ann.topkIvfPqRerankFull(qProj, "qid", "emb", "rp", ixRp, otherSq8, 10, 4, 100)
    }
    // SHARDED envelopes (buildSq8Sharded) rerank identically to the
    // single whole-corpus envelope — coalesce picks each id's holder
    val proposals = Similarity.topkIvfPqFlat(
      qProj.select(col("qid"), col("rp")), "rp", ixRp, 100, nProbe = 4)
    val single = Ann.rerankFullDim(proposals, qProj, "qid", "emb", full, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val shardedEnv = Similarity.buildSq8Sharded(cDf, "id", "emb", numShards = 3)
    assert(shardedEnv.size == 3 && shardedEnv.map(_.n).sum == 400)
    val viaSharded = Ann.rerankFullDim(proposals, qProj, "qid", "emb", shardedEnv, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaSharded == single,
      "sharded SQ8 envelopes diverge from the whole-corpus envelope")
    // EXACT rerank (distributed f64 corpus join — no envelope, no
    // collect): with corpus-wide proposals the result IS the exact
    // top-k, so recall vs the f64 kernel must be ~1 (no 8-bit grid
    // between them), and at the same 100-candidate shortlist it must
    // do at least as well as the SQ8 envelope
    val allProps = Similarity.topkIvfPqFlat(
      qProj.select(col("qid"), col("rp")), "rp", ixRp, 400, nProbe = 8)
    val exactAll = recallVsExact(hitsOf(
      Ann.rerankExact(allProps, qProj, "qid", "emb", cDf, "id", "emb", 10), "qid"))
    assert(exactAll >= 0.98, s"corpus-wide exact rerank recall: $exactAll")
    val exact100 = recallVsExact(hitsOf(
      Ann.rerankExact(proposals, qProj, "qid", "emb", cDf, "id", "emb", 10), "qid"))
    assert(exact100 >= reranked - 1e-9,
      s"exact rerank under SQ8 rerank at the same shortlist: $exact100 vs $reranked")
  }

  test("jacobi solver: recovers a planted spectrum") {
    // A = Q diag(5,2,1) Qᵀ for a fixed rotation Q
    val q = Ann.jacobiEigSym(Array(
      Array(2.0, 1.0, 0.5), Array(1.0, 3.0, 0.2), Array(0.5, 0.2, 1.5)))
    val vals = q._1.sorted
    // eigenvalues of that fixed symmetric matrix (precomputed): verify
    // Σλ = trace and Πλ = det instead of pinning decimals
    assert(math.abs(vals.sum - 6.5) < 1e-9)
    val det = 2.0 * (3.0 * 1.5 - 0.2 * 0.2) - 1.0 * (1.0 * 1.5 - 0.2 * 0.5) +
      0.5 * (1.0 * 0.2 - 3.0 * 0.5)
    assert(math.abs(vals.product - det) < 1e-9)
  }
}
