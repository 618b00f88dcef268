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

  test("IVF topk recall vs brute force at k=10: ≥ 0.5 at defaults, ≥ 0.8 at nProbe=8") {
    val emb = Tables.embeddings(spark, dir)
    val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
    val exact = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 10, Metric.Cosine)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): (Double, Set[(Long, Long)]) = {
      val approx = Ann.ivfCosineTopK(emb, "vec_id", emb, "vec_id", "embedding",
          k = 10, nProbe = nProbe)
        .select("vec_id", "index").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ((approx & exact).size.toDouble / exact.size, approx)
    }
    // the recall/probes curve on the worst-case (unclustered gaussian)
    // corpus: defaults probe 4/16 cells, ≥0.6 measured; 8/16 reaches
    // ≥0.83 — on clustered real-world embeddings the same recall needs
    // a far smaller nProbe fraction
    val (rDefault, approxDefault) = recallAt(4)
    assert(rDefault >= 0.5, s"default recall $rDefault")
    val (rHigh, _) = recallAt(8)
    assert(rHigh >= 0.8, s"nProbe=8 recall $rHigh")
    assert(rHigh > rDefault)
    // a query's own cell is always its first probe → it finds itself
    val self = exact.filter { case (q, i) => q == i }
    assert(self.subsetOf(approxDefault))
  }

  test("IVF is deterministic across runs (seeded sample + training)") {
    val emb = Tables.embeddings(spark, dir).limit(200)
    def run() = Ann.ivfCosineTopK(emb, "vec_id", emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("IVF+SQ8 rerank: candidate sets match IVF-Flat, scores within the SQ8 grid, no f64 corpus table") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val flat = Ann.ivfCosineTopK(emb, "vec_id", emb, "vec_id", "embedding",
        k = 10, nProbe = 8)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Ann.ivfSq8CosineTopK(emb, "vec_id", emb, "vec_id", "embedding",
        k = 10, nProbe = 8)
    val sq8Set = sq8.select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same cells, same candidates — only the rerank scores differ by
    // quantization error, so the selected sets agree near-completely
    val agree = (flat & sq8Set).size.toDouble / flat.size
    assert(agree >= 0.95, f"IVF-SQ8 diverged from IVF-Flat: agreement $agree%.3f")
    // quantized scores stay within the SQ8 grid error of the exact
    // cosine on a sample pair
    val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")
    val exact = Similarity.topkFlat(emb.limit(20), "embedding", cx, 10, Metric.Cosine)
      .select("vec_id", "index", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val qScores = sq8.select("vec_id", "index", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = exact.keySet & qScores.keySet
    assert(shared.nonEmpty)
    shared.foreach { k0 =>
      assert(math.abs(exact(k0) - qScores(k0)) < 0.02,
        s"quantized score off-grid at $k0: ${exact(k0)} vs ${qScores(k0)}")
    }
    // determinism
    val again = Ann.ivfSq8CosineTopK(emb, "vec_id", emb, "vec_id", "embedding",
        k = 10, nProbe = 8)
      .select("vec_id", "index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == sq8Set)
  }

  test("Sq8CosineAt generates COMPILABLE code — no silent interpreted fallback") {
    // calling the code generator directly throws on a janino compile
    // error (the query path would silently fall back instead — which
    // is exactly the regression this pins: the object-nested helper
    // must be referenced by its Similarity$-form binary name)
    import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val emb = Tables.embeddings(spark, dir).limit(10)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val bc = spark.sparkContext.broadcast(
      Similarity.collectCorpusSq8(emb, "vec_id", "embedding"))
    val expr = Similarity.Sq8CosineAt(
      BoundReference(0, LongType, nullable = false),
      BoundReference(1, ArrayType(DoubleType), nullable = true), bc)
    val proj = GenerateUnsafeProjection.generate(Seq(Alias(expr, "s")()))
    assert(proj != null)
  }

  test("kmeans: deterministic across partitionings; every cluster id in range; self-consistent") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val k = 8
    val cx = Ann.trainKMeans(emb, "vec_id", "embedding", k)
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.kmeansAssign(df, "vec_id", "embedding", cx)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val a = run(emb)
    val b = run(emb.repartition(7))
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.values.forall { case (c, _) => c >= 0 && c < k })
    // the trainer is deterministic too: retraining gives the same index
    val cx2 = Ann.trainKMeans(emb, "vec_id", "embedding", k)
    assert(cx.data.sameElements(cx2.data))
    // more than one cluster is actually used on a gaussian corpus
    assert(a.values.map(_._1).toSet.size > 1)
  }
}
