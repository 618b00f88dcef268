package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** OPQ contract: the trained rotation is exactly orthogonal (dots
  * preserved), ADC recall beats plain PQ at the same bits on a
  * correlated corpus (the operator's reason to exist), rerank restores
  * near-exact recall, and determinism/edge contracts carry over from
  * the PQ kernel it wraps.
  */
class OpqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  /** Latent axis-aligned decaying variances pushed through a fixed
    * dense rotation — every observed dimension then carries a
    * correlated mix, the regime where dim-slice PQ wastes its code
    * budget and OPQ recovers the alignment.
    */
  private def correlated(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    val g = Array.tabulate(dim, dim)((_, _) => rnd.nextGaussian())
    val q = Similarity.polarRotationMax(g)
    (0L until n.toLong).map { i =>
      val z = Array.tabulate(dim)(d => rnd.nextGaussian() * math.pow(0.90, d))
      val x = Array.tabulate(dim) { r =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += q(r * dim + j) * z(j); j += 1 }
        acc
      }
      i -> x.toSeq
    }
  }

  test("trained rotation is orthogonal and preserves pairwise dots") {
    val cDf = correlated(600, 24, seed = 71).toDF("id", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val opq = Similarity.quantizeOpq(cx, m = 6, opqIters = 4)
    val d = cx.dim
    // R Rᵀ = I
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0; var c = 0
      while (c < d) { acc += opq.rot(i * d + c) * opq.rot(j * d + c); c += 1 }
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(acc - expect) < 1e-9, s"RRᵀ[$i][$j] = $acc")
    }
    // rotated pack preserves dots between rows
    val rotated = Similarity.rotateIndex(cx, opq.rot)
    def dot(data: Array[Double], a: Int, b: Int): Double = {
      var acc = 0.0; var c = 0
      while (c < d) { acc += data(a * d + c) * data(b * d + c); c += 1 }
      acc
    }
    for (p <- Seq((0, 1), (2, 3), (10, 500), (123, 321)))
      assert(math.abs(dot(rotated.data, p._1, p._2) - dot(cx.data, p._1, p._2)) < 1e-9)
  }

  test("OPQ ADC recall beats plain PQ at the same bits on a correlated corpus") {
    val cDf = correlated(2000, 32, seed = 81).toDF("id", "emb")
    val qDf = correlated(200, 32, seed = 82).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val exact = Similarity.topkFlat(qDf, "emb", cx, 10, Metric.Cosine)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("qid", "index").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val m = 8 // 4-dim subspaces
    val pq = recallOf(Similarity.topkPqFlat(qDf, "emb",
      Similarity.quantizePq(cx, m, withRerank = false), 10, Metric.Cosine))
    val opq = recallOf(Similarity.topkOpqFlat(qDf, "emb",
      Similarity.quantizeOpq(cx, m, withRerank = false), 10, Metric.Cosine))
    info(f"ADC-only recall@10: pq=$pq%.4f opq=$opq%.4f")
    assert(opq > pq, f"OPQ must beat PQ on correlated data: $opq%.4f vs $pq%.4f")
    assert(opq - pq >= 0.05, f"expected a clear alignment win, got $opq%.4f vs $pq%.4f")
  }

  test("rerank path restores near-exact recall; scores live on the rotated SQ8 grid") {
    val cDf = correlated(1500, 32, seed = 91).toDF("id", "emb")
    val qDf = correlated(150, 32, seed = 92).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val opq = Similarity.quantizeOpq(cx, m = 8)
    val exact = Similarity.topkFlat(qDf, "emb", cx, 10, Metric.Cosine)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    val rr = Similarity.topkOpqFlat(qDf, "emb", opq, 10, Metric.Cosine,
        shortlist = 200)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    val recall = (exact & rr).size.toDouble / exact.size
    info(f"rerank recall@10 (shortlist 200/1500) = $recall%.4f")
    assert(recall >= 0.9, f"rerank recall $recall%.4f")
    // rerank scores approximate the exact cosine within the SQ8 grid
    val exactTop = Similarity.topkFlat(qDf, "emb", cx, 1, Metric.Cosine)
      .select("qid", "score").as[(Long, Double)].collect().toMap
    Similarity.topkOpqFlat(qDf, "emb", opq, 1, Metric.Cosine, shortlist = 200)
      .select("qid", "score").as[(Long, Double)].collect().foreach {
        case (q, s) => assert(math.abs(s - exactTop(q)) < 0.05, s"q$q: $s vs ${exactTop(q)}")
      }
  }

  test("driver-gate geometry: measured pq/opq band on the real embeddings tables") {
    // the same correlated-view construction as SparkEntry's
    // ann_opq_recall gate (0.92^d stretch + fixed seeded rotation) —
    // prints the actual recalls behind the gate's pinned booleans
    import org.apache.spark.sql.functions.col
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if new java.io.File(dir).isDirectory) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
      val d = cx.dim
      val rnd = new scala.util.Random(1234L)
      val g = Array.tabulate(d, d)((_, _) => rnd.nextGaussian())
      val q = Similarity.polarRotationMax(g)
      val stretched = new Array[Double](cx.n * d)
      val norms = new Array[Double](cx.n)
      val sqNorms = new Array[Double](cx.n)
      for (i <- 0 until cx.n) {
        var sq = 0.0
        for (dd <- 0 until d) {
          val v = cx.data(i * d + dd) * math.pow(0.92, dd)
          stretched(i * d + dd) = v; sq += v * v
        }
        sqNorms(i) = sq; norms(i) = math.sqrt(sq)
      }
      val cx2 = Similarity.rotateIndex(
        graft.operators.CorpusIndex(cx.ids, stretched, null, cx.n, d, norms, sqNorms), q)
      val qDf = (0 until cx2.n).map(j =>
          (cx2.ids(j), (0 until d).map(dd => cx2.data(j * d + dd))))
        .toDF("vec_id", "embedding")
      val exact = Similarity.topkFlat(qDf, "embedding", cx2, 10, Metric.Cosine)
        .select("vec_id", "index").as[(Long, Long)].collect().toSet
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select(col("vec_id"), col("index")).as[(Long, Long)].collect().toSet
        (exact & got).size.toDouble / exact.size
      }
      val pq = recallOf(Similarity.topkPqFlat(qDf, "embedding",
        Similarity.quantizePq(cx2, 16, withRerank = false), 10, Metric.Cosine))
      val opq = recallOf(Similarity.topkOpqFlat(qDf, "embedding",
        Similarity.quantizeOpq(cx2, 16, withRerank = false), 10, Metric.Cosine))
      info(f"$dir: ADC-only recall@10 pq=$pq%.4f opq=$opq%.4f (gate pins opq >= pq+0.02, opq >= 0.5)")
      assert(opq >= pq + 0.02 && opq >= 0.5, s"$dir: gate pins violated: pq=$pq opq=$opq")
    }
  }

  test("contract edges and partitioning determinism") {
    val cDf = correlated(100, 16, seed = 95).toDF("id", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val opq = Similarity.quantizeOpq(cx, m = 4, opqIters = 2)
    val qDf = Seq(
      (1L, Some(Seq.fill(16)(0.3))),
      (2L, None)).toDF("qid", "emb")
    val out = Similarity.topkOpq(qDf, "emb", opq, k = 150, Metric.Cosine).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getSeq[Any](byId(1L).fieldIndex("matches")).size == 100) // clamp
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("matches"))) // null passthrough
    intercept[Exception] { // dim mismatch
      Similarity.topkOpq(Seq((9L, Seq.fill(4)(1.0))).toDF("qid", "emb"),
        "emb", opq, 5, Metric.Cosine).collect()
    }
    intercept[IllegalArgumentException] { // m must divide dim
      Similarity.quantizeOpq(cx, m = 5)
    }
    val qs = correlated(30, 16, seed = 96).toDF("qid", "emb")
    def run(parts: Int) =
      Similarity.topkOpqFlat(qs.repartition(parts), "emb", opq, 5, Metric.Cosine)
        .select("qid", "rank", "index", "score")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(1) == run(5))
  }
}
