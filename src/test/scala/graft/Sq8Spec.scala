package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar-quantized index: compression ratio, quantization error
  * envelope, top-k agreement with the exact kernel, determinism, and
  * the exact-kernel contract edges (ties, k>|corpus|, nulls).
  */
class Sq8Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
  }

  test("codes are 1 byte/element and dequantization error is within half a step") {
    val rows = randVecs(200, 16, seed = 7)
    val cx = Similarity.collectCorpus(rows.toDF("id", "emb"), "id", "emb")
    val q8 = Similarity.quantizeSq8(cx)
    assert(q8.codes.length == cx.n * cx.dim) // vs 8 bytes/element for f64
    var j = 0
    while (j < cx.n * cx.dim) {
      val d = j % cx.dim
      val dq = q8.dimMin(d) + (q8.codes(j) & 0xFF) * q8.dimScale(d).toDouble
      val step = q8.dimScale(d).toDouble
      assert(math.abs(dq - cx.data(j)) <= step / 2 + 1e-6,
        s"element $j: dequant $dq vs ${cx.data(j)}, step $step")
      j += 1
    }
  }

  test("sq8 topk recall@10 vs exact kernel >= 0.95 on gaussian corpus, all metrics") {
    val corpusRows = randVecs(2000, 32, seed = 11)
    val queryRows = randVecs(200, 32, seed = 13)
    val cDf = corpusRows.toDF("id", "emb")
    val qDf = queryRows.toDF("qid", "emb")
    val cx = Similarity.collectCorpus(cDf, "id", "emb")
    val q8 = Similarity.quantizeSq8(cx)
    for (m <- Seq(Metric.Cosine, Metric.Dot, Metric.Euclidean)) {
      val exact = Similarity.topkFlat(qDf, "emb", cx, 10, m)
        .select("qid", "index").as[(Long, Long)].collect().toSet
      val sq8 = Similarity.topkSq8Flat(qDf, "emb", q8, 10, m)
        .select("qid", "index").as[(Long, Long)].collect().toSet
      val recall = (exact & sq8).size.toDouble / exact.size
      assert(recall >= 0.95, s"metric $m: recall $recall")
    }
  }

  test("sq8 scores equal exact-kernel scores of the dequantized corpus") {
    // quantize, then build an EXACT index from the dequantized values:
    // the sq8 kernel must reproduce those scores bit-for-bit modulo
    // the f32 GEMM accumulation (tolerance), proving scoring is a pure
    // function of the codes (no partition-dependent drift)
    val corpusRows = randVecs(300, 8, seed = 3)
    val qDf = randVecs(50, 8, seed = 4).toDF("qid", "emb")
    val cx = Similarity.collectCorpus(corpusRows.toDF("id", "emb"), "id", "emb")
    val q8 = Similarity.quantizeSq8(cx)
    val dequantRows = (0 until q8.n).map { j =>
      q8.ids(j) -> (0 until q8.dim).map(d =>
        q8.dimMin(d) + (q8.codes(j * q8.dim + d) & 0xFF) * q8.dimScale(d).toDouble)
    }
    val dqCx = Similarity.collectCorpus(dequantRows.toDF("id", "emb"), "id", "emb")
    val viaSq8 = Similarity.topkSq8Flat(qDf, "emb", q8, 5, Metric.Cosine)
      .select("qid", "rank", "index", "score").as[(Long, Int, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val viaExact = Similarity.topkFlat(qDf, "emb", dqCx, 5, Metric.Cosine)
      .select("qid", "rank", "index", "score").as[(Long, Int, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(viaSq8.length == viaExact.length)
    viaSq8.zip(viaExact).foreach { case ((q1, r1, i1, s1), (q2, r2, i2, s2)) =>
      assert(q1 == q2 && r1 == r2)
      // f32 GEMM vs f64 GEMM over the same dequantized values
      assert(math.abs(s1 - s2) < 1e-4, s"query $q1 rank $r1: $s1 vs $s2 (idx $i1/$i2)")
    }
  }

  test("tiling is invisible: tileRows smaller than corpus gives identical output") {
    val corpusRows = randVecs(500, 16, seed = 21)
    val qDf = randVecs(40, 16, seed = 22).toDF("qid", "emb")
    val q8 = Similarity.collectCorpusSq8(corpusRows.toDF("id", "emb"), "id", "emb")
    val whole = Similarity.topkSq8(qDf, "emb", q8, 7, Metric.Cosine, "m", tileRows = 100000)
    val tiled = Similarity.topkSq8(qDf, "emb", q8, 7, Metric.Cosine, "m", tileRows = 64)
    val a = whole.select($"qid", to_json($"m").as("j")).as[(Long, String)].collect().toMap
    val b = tiled.select($"qid", to_json($"m").as("j")).as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("contract edges: k > corpus returns all, k <= 0 empty, null query emits null") {
    val q8 = Similarity.collectCorpusSq8(
      Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("id", "emb"), "id", "emb")
    val qDf = Seq((0L, Some(Seq(1.0, 0.0))), (1L, None))
      .toDF("qid", "emb")
    val out = Similarity.topkSq8(qDf, "emb", q8, 10, Metric.Cosine)
      .select($"qid", coalesce(size($"matches"), lit(-1)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(0L) == 2)
    assert(out(1L) == -1) // null matches propagated for the null query
    val empty = Similarity.topkSq8(qDf.filter($"emb".isNotNull), "emb", q8, 0, Metric.Cosine)
      .select(size($"matches")).as[Int].collect()
    assert(empty.forall(_ == 0))
  }

  test("quantized topkBlocked: recall@10 >= 0.95 vs the exact single-broadcast kernel") {
    val corpusRows = randVecs(3000, 24, seed = 31)
    val qDf = randVecs(150, 24, seed = 32).toDF("qid", "emb")
    val cDf = corpusRows.toDF("id", "emb")
    val exact = Similarity.topkFlat(qDf, "emb",
        Similarity.collectCorpus(cDf, "id", "emb"), 10, Metric.Cosine)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    val blocked = Similarity.topkBlocked(qDf, "emb", "qid", cDf, "id", "emb",
        k = 10, Metric.Cosine, numBlocks = 4, quantized = true)
      .select("qid", "index").as[(Long, Long)].collect().toSet
    assert(blocked.size == exact.size) // k rows per query either way
    val recall = (exact & blocked).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall")
  }

  test("f32 query column works against the sq8 index") {
    val q8 = Similarity.collectCorpusSq8(
      Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("id", "emb"), "id", "emb")
    val qDf = Seq((7L, Seq(1.0f, 0.1f))).toDF("qid", "emb")
    val top = Similarity.topkSq8Flat(qDf, "emb", q8, 1, Metric.Cosine).collect().head
    assert(top.getAs[Long]("index") == 0L)
  }
}
