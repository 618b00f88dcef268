package graft

import graft.operators.{Ann, Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  val dir = "/root/testdata/sf0.001"

  test("LSH topk recall ≥ 0.8 vs brute force at k=10 (multi-probe defaults)") {
    val emb = Tables.embeddings(spark, dir)
    val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
    val exact = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 10, Metric.Cosine)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshCosineTopK(emb, "vec_id", emb, "vec_id", "embedding", k = 10, dim = 64)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    // every query must at least find itself (cosine 1.0 in its own bucket)
    val self = exact.filter { case (q, i) => q == i }
    assert(self.subsetOf(approx))
  }

  test("LSH multi-probe recall strictly improves on single-probe") {
    val emb = Tables.embeddings(spark, dir)
    val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
    val exact = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 10, Metric.Cosine)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(probes: Int): Double = {
      val approx = Ann.lshCosineTopK(emb, "vec_id", emb, "vec_id", "embedding",
          k = 10, probes = probes, dim = 64)
        .select("vec_id", "index").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (approx & exact).size.toDouble / exact.size
    }
    assert(recallAt(8) > recallAt(1))
  }

  test("LSH is deterministic across runs (seeded hyperplanes)") {
    val emb = Tables.embeddings(spark, dir).limit(100)
    def run() = Ann.lshCosineTopK(emb, "vec_id", emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("IVF topk recall ≥ 0.5 vs brute force at k=10; every query finds itself") {
    val emb = Tables.embeddings(spark, dir)
    val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
    val exact = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 10, Metric.Cosine)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.ivfCosineTopK(emb, "vec_id", emb, "vec_id", "embedding", k = 10)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // a query's own cell is always its first probe → it finds itself
    val self = exact.filter { case (q, i) => q == i }
    assert(self.subsetOf(approx))
  }

  test("IVF is deterministic across runs (seeded sample + training)") {
    val emb = Tables.embeddings(spark, dir).limit(200)
    def run() = Ann.ivfCosineTopK(emb, "vec_id", emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }
}
