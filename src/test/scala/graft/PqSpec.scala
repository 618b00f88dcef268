package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization contract: deterministic codebooks/codes, the
  * ADC ranking approximates the exact kernel, the SQ8-sidecar rerank
  * restores near-exact recall, and the kernel edge rules (null
  * propagation, k clamp, dim mismatch) carry over.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val q = emb.select(col("vec_id"),
    col("embedding").cast("array<double>").as("embedding"))
  private lazy val cx = Similarity.collectCorpus(q, "vec_id", "embedding")

  private def recall(hits: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
    hits.intersect(exact).size.toDouble / exact.size

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"vec_id", $"index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("quantizePq: deterministic (same input -> identical codes and codebooks)") {
    val a = Similarity.quantizePq(cx, m = 16)
    val b = Similarity.quantizePq(cx, m = 16)
    assert(java.util.Arrays.equals(a.codes, b.codes))
    assert(java.util.Arrays.equals(a.codebooks, b.codebooks))
    assert(a.codes.length == cx.n * 16, "16 bytes per vector")
  }

  test("topkPq: ADC recall and SQ8-rerank recall vs the exact kernel (floors of the driver gate)") {
    val exact = pairs(Similarity.topkFlat(q, "embedding", cx, 10, Metric.Cosine))
    val pq = Similarity.quantizePq(cx, m = 16)
    val adc = pairs(Similarity.topkPqFlat(q, "embedding", pq, 10, Metric.Cosine))
    val rr = pairs(Similarity.topkPqFlat(q, "embedding", pq, 10, Metric.Cosine,
      shortlist = 100))
    val (ra, rb) = (recall(adc, exact), recall(rr, exact))
    info(f"PQ m=16 on ${cx.n} x ${cx.dim}: ADC recall@10 = $ra%.4f, " +
      f"shortlist-100 rerank recall@10 = $rb%.4f")
    assert(ra >= 0.6, f"ADC recall $ra%.4f under the 0.6 gate floor")
    assert(rb >= 0.9, f"rerank recall $rb%.4f under the 0.9 gate floor")
    assert(rb > ra, "rerank must improve on raw ADC")
  }

  test("topkPq: degenerate m=dim (1-d subquantizers) tracks SQ8-grade accuracy") {
    val pq = Similarity.quantizePq(cx, m = cx.dim)
    val exact = pairs(Similarity.topkFlat(q, "embedding", cx, 10, Metric.Cosine))
    val adc = pairs(Similarity.topkPqFlat(q, "embedding", pq, 10, Metric.Cosine))
    assert(recall(adc, exact) >= 0.9,
      "256 centroids per single dimension should rank near-exactly")
  }

  test("topkPq: euclidean and dot metrics, k clamp, null and mismatch rules") {
    val pq = Similarity.quantizePq(cx, m = 16)
    // k > n clamps to n
    val all = Similarity.topkPqFlat(q.limit(3), "embedding", pq, cx.n + 50, Metric.Dot)
    assert(all.groupBy("vec_id").count().collect().forall(_.getLong(1) == cx.n))
    // euclidean: lower is better, self should be rank-1 for most
    // vectors under rerank (quantized dot only approximates; rerank
    // makes self-retrieval reliable)
    val eu = Similarity.topkPqFlat(q, "embedding", pq, 1, Metric.Euclidean,
        shortlist = 64)
      .select($"vec_id", $"index").collect()
    val selfTop = eu.count(r => r.getLong(0) == r.getLong(1))
    assert(selfTop >= (cx.n * 0.95).toInt,
      s"self-retrieval under euclidean+rerank: $selfTop of ${cx.n}")
    // null embedding propagates null matches row (flat: row disappears)
    val withNull = Seq((9990L, null.asInstanceOf[Array[Double]]))
      .toDF("vec_id", "embedding")
    val nOut = Similarity.topkPqFlat(withNull, "embedding", pq, 5, Metric.Cosine).count()
    assert(nOut == 0, "null embedding must produce no flat rows")
    // dimension mismatch throws
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.topkPqFlat(bad, "embedding", pq, 5, Metric.Cosine).count()
    }
    assert(e.getMessage != null)
  }
}
