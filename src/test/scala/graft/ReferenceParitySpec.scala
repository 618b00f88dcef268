package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 parity map over EVERY test in the reference suite
  * (/root/reference/tests/test_polars_matmul.py — 37 tests). Each
  * test here is named `ref:<reference test name>` and asserts the
  * same behavior through the Spark surface; SURVEY §2.1 carries the
  * full checklist table (round-12 verdict #1). Where the reference
  * asserts a polars-specific mechanic, the Spark-native analogue is
  * documented inline:
  *
  *   - polars LazyFrame tests → Spark plans are ALWAYS lazy; the
  *     analogue composes the same filter/select/limit/sort/join/
  *     groupBy around the kernel inside one DataFrame plan.
  *   - `corpus must be a Polars Series` (a host-language TypeError) →
  *     graft's corpus is a typed [[Similarity.CorpusIndex]]; the
  *     reachable misuse is a non-vector column, which collectCorpus
  *     refuses with a named error.
  *   - List vs fixed-size Array input dtypes → Spark has one
  *     ArrayType; both reference dtypes land on the same column shape
  *     (asserted for f64 and f32 element types).
  */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private def qDf(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("query_id", "embedding")
  private def corpusOf(rows: Seq[Seq[Double]]): graft.operators.CorpusIndex =
    Similarity.collectCorpus(
      rows.zipWithIndex.map { case (e, i) => (i.toLong, e) }.toDF("cid", "embedding"),
      "cid", "embedding")
  private def corpusOfF32(rows: Seq[Seq[Float]]): graft.operators.CorpusIndex =
    Similarity.collectCorpus(
      rows.zipWithIndex.map { case (e, i) => (i.toLong, e) }.toDF("cid", "embedding"),
      "cid", "embedding")

  // ===== class TestTopk =====

  test("ref:test_basic_cosine — exact matches rank first, schema is array<struct<index,score>>") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0))))
    val c = corpusOf(Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0)))
    val out = Similarity.topk(q, "embedding", c, 2, Metric.Cosine)
    assert(out.count() == 2)
    // reference: List(Struct{index: UInt32, score: Float64}); Spark
    // indices are long (no unsigned ints), scores f64
    out.schema("matches").dataType match {
      case ArrayType(StructType(fields), _) =>
        assert(fields.map(f => (f.name, f.dataType)).toSeq ==
          Seq(("index", LongType), ("score", DoubleType)))
      case other => fail(s"matches dtype $other")
    }
    val byQ = out.select($"query_id", $"matches").collect()
      .map(r => r.getLong(0) -> r.getSeq[Row](1)).toMap
    assert(byQ(0L).head.getLong(0) == 0L && math.abs(byQ(0L).head.getDouble(1) - 1.0) < 1e-6)
    assert(byQ(1L).head.getLong(0) == 1L && math.abs(byQ(1L).head.getDouble(1) - 1.0) < 1e-6)
  }

  test("ref:test_explode_unnest_pattern — flattened form has index/score columns, |Q|*k rows") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))))
    val c = corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.5, 0.5)))
    val flat = Similarity.topkFlat(q, "embedding", c, 2, Metric.Cosine)
    assert(flat.count() == 4)
    assert(flat.columns.contains("index") && flat.columns.contains("score"))
  }

  test("ref:test_dot_product — top dot match is the largest dot product") {
    val q = qDf(Seq((0L, Seq(2.0, 0.0))))
    val c = corpusOf(Seq(Seq(1.0, 0.0), Seq(3.0, 0.0)))
    val top = Similarity.topkFlat(q, "embedding", c, 2, Metric.Dot)
      .orderBy(desc("score")).head
    assert(top.getAs[Long]("index") == 1L)
    assert(math.abs(top.getAs[Double]("score") - 6.0) < 1e-6)
  }

  test("ref:test_euclidean — lower distance is better") {
    val q = qDf(Seq((0L, Seq(0.0, 0.0))))
    val c = corpusOf(Seq(Seq(3.0, 4.0), Seq(1.0, 0.0)))
    val top = Similarity.topkFlat(q, "embedding", c, 2, Metric.Euclidean)
      .orderBy("score").head
    assert(top.getAs[Long]("index") == 1L)
    assert(math.abs(top.getAs[Double]("score") - 1.0) < 1e-6)
  }

  test("ref:test_k_larger_than_corpus — returns all corpus items") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0))))
    val c = corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    assert(Similarity.topkFlat(q, "embedding", c, 10, Metric.Cosine).count() == 2)
  }

  test("ref:test_join_with_corpus_metadata — topk -> explode -> join keeps label/corpus_id/score") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0, 0.0))))
    val corpusDf = Seq(
      (0L, Seq(1.0, 0.0, 0.0), "a"), (1L, Seq(0.0, 1.0, 0.0), "b"),
      (2L, Seq(0.0, 0.0, 1.0), "c")).toDF("corpus_id", "embedding", "label")
    val c = Similarity.collectCorpus(corpusDf, "corpus_id", "embedding")
    val joined = Similarity.topkFlat(q, "embedding", c, 2, Metric.Cosine)
      .join(broadcast(corpusDf.select($"corpus_id".as("index"), $"label")), Seq("index"))
    val cols = joined.columns.toSet
    assert(Set("label", "score", "index").subsetOf(cols))
    assert(joined.count() == 2)
  }

  // ===== class TestMatmul =====

  test("ref:test_basic — matmul values against identity-ish corpus") {
    val q = qDf(Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0))))
    val c = corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val got = Similarity.matmul(q, "embedding", c).select($"query_id", $"scores")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(0L) == Seq(1.0, 2.0))
    assert(got(1L) == Seq(3.0, 4.0))
  }

  test("ref:test_against_numpy — 10x32 @ 20x32^T matches a naive dot (rtol 1e-5)") {
    val rnd = new scala.util.Random(42)
    val left = (0L until 10L).map(i => (i, Seq.fill(32)(rnd.nextGaussian())))
    val right = (0 until 20).map(_ => Seq.fill(32)(rnd.nextGaussian()))
    val got = Similarity.matmul(qDf(left), "embedding", corpusOf(right))
      .select($"query_id", $"scores").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((qid, emb) <- left; j <- right.indices) {
      val expected = emb.zip(right(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(got(qid)(j) - expected) <= 1e-5 * math.max(1.0, math.abs(expected)),
        s"q=$qid j=$j")
    }
  }

  test("ref:test_flatten_mode — flatten=True buffer: n_q*n_c f64 values, row-major") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 1.0))))
    val c = corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val row = Similarity.matmulScores(q, "query_id", "embedding", c).head
    val buf = row.getSeq[Double](2)
    assert(buf.length == 6, "3 queries * 2 corpus = 6 values")
    assert(buf == Seq(1.0, 0.0, 0.0, 1.0, 1.0, 1.0), s"row-major order: $buf")
  }

  test("ref:test_list_input_type — plain Seq (polars List dtype) input works") {
    val q = qDf(Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0))))
    assert(q.schema("embedding").dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })
    val got = Similarity.matmul(q, "embedding", corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))))
      .select($"scores").collect().map(_.getSeq[Double](0))
    assert(got.toSet == Set(Seq(1.0, 2.0), Seq(3.0, 4.0)))
  }

  test("ref:test_array_input_type — fixed-width Array dtype lands on the same column shape") {
    // Spark has one ArrayType (no fixed-size variant); Array[Double]
    // input is the polars Array(f64, dim) analogue
    val q = Seq((0L, Array(1.0, 2.0, 3.0, 4.0)), (1L, Array(5.0, 6.0, 7.0, 8.0)))
      .toDF("query_id", "embedding")
    val c = corpusOf(Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0)))
    val got = Similarity.matmul(q, "embedding", c)
      .select($"query_id", $"scores").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(0L) == Seq(1.0, 2.0) && got(1L) == Seq(5.0, 6.0))
  }

  // ===== class TestNumpyEquivalence =====

  test("ref:test_cosine_similarity_matches_numpy — k=|corpus| scores equal naive cosine (rtol 1e-5)") {
    val rnd = new scala.util.Random(42)
    val qs = (0L until 5L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val cs = (0 until 20).map(_ => Seq.fill(16)(rnd.nextGaussian()))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = Similarity.topkFlat(qDf(qs), "embedding", corpusOf(cs), 20, Metric.Cosine)
      .select($"query_id", $"index", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((qid, emb) <- qs; j <- cs.indices) {
      val expected = cos(emb, cs(j))
      assert(math.abs(got((qid, j.toLong)) - expected) <= 1e-5 * math.max(1.0, math.abs(expected)),
        s"q=$qid j=$j")
    }
  }

  // ===== class TestErrorHandling =====

  test("ref:test_invalid_metric — unknown metric name raises a clear error") {
    val ex = intercept[IllegalArgumentException](Metric.fromString("invalid_metric"))
    assert(ex.getMessage.contains("Unknown metric"))
  }

  test("ref:test_corpus_expression_raises_error — non-vector corpus column refused by type") {
    // polars raises TypeError when corpus is an expression rather than
    // a Series; graft's corpus is a typed CorpusIndex, so the
    // reachable misuse is a non-vector column — refused with a named
    // error at collect time
    val bad = Seq((0L, "not a vector")).toDF("cid", "embedding")
    val ex = intercept[IllegalArgumentException](
      Similarity.collectCorpus(bad, "cid", "embedding"))
    assert(ex.getMessage.contains("must be array<float>/array<double>"))
  }

  test("ref:test_empty_query — empty query frame returns empty result, not an error") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("query_id", LongType),
        StructField("embedding", ArrayType(DoubleType)))))
    val out = Similarity.topk(empty, "embedding", corpusOf(Seq(Seq(1.0, 0.0))), 1, Metric.Cosine)
    assert(out.count() == 0)
    assert(out.columns.contains("matches"))
  }

  test("ref:test_empty_corpus — empty corpus raises 'Empty'") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("cid", LongType),
        StructField("embedding", ArrayType(DoubleType)))))
    val ex = intercept[IllegalArgumentException](
      Similarity.collectCorpus(empty, "cid", "embedding"))
    assert(ex.getMessage.contains("Empty"))
  }

  test("ref:test_matmul_dimension_mismatch — 2d query vs 3d corpus raises 'Dimension mismatch'") {
    val q = qDf(Seq((0L, Seq(1.0, 2.0))))
    val c = corpusOf(Seq(Seq(1.0, 2.0, 3.0)))
    val ex = intercept[Exception](Similarity.matmul(q, "embedding", c).collect())
    assert(ex.getMessage.contains("Dimension mismatch"))
  }

  test("ref:test_topk_dimension_mismatch — 2d query vs 3d corpus raises 'Dimension mismatch'") {
    val q = qDf(Seq((0L, Seq(1.0, 2.0))))
    val c = corpusOf(Seq(Seq(1.0, 2.0, 3.0)))
    val ex = intercept[Exception](
      Similarity.topk(q, "embedding", c, 1, Metric.Cosine).collect())
    assert(ex.getMessage.contains("Dimension mismatch"))
  }

  // ===== class TestFloat32Support =====

  test("ref:test_matmul_f32 — both-f32 inputs return f32 scores with correct values") {
    val q = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 4.0f))).toDF("query_id", "embedding")
    val c = corpusOfF32(Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
    val out = Similarity.matmul(q, "embedding", c)
    assert(out.schema("scores").dataType == ArrayType(FloatType, containsNull = false))
    val got = out.select($"query_id", $"scores").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(0L) == Seq(1.0f, 2.0f) && got(1L) == Seq(3.0f, 4.0f))
  }

  test("ref:test_matmul_f64 — f64 inputs return f64 scores") {
    val q = qDf(Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0))))
    val out = Similarity.matmul(q, "embedding", corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))))
    assert(out.schema("scores").dataType == ArrayType(DoubleType, containsNull = false))
  }

  test("ref:test_topk_f32 — f32 topk returns |Q|*k rows with cosine in [-1.01, 1.01]") {
    val rnd = new scala.util.Random(42)
    val q = (0L until 2L).map(i => (i, Seq.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("query_id", "embedding")
    val c = corpusOfF32((0 until 10).map(_ => Seq.fill(32)(rnd.nextGaussian().toFloat)))
    val flat = Similarity.topkFlat(q, "embedding", c, 2, Metric.Cosine)
    val scores = flat.select($"score").collect().map(_.getDouble(0))
    assert(scores.length == 4)
    assert(scores.forall(s => s >= -1.01 && s <= 1.01))
  }

  test("ref:test_mixed_f32_f64_uses_f64 — f32 query with f64 corpus falls back to f64") {
    val q = Seq((0L, Seq(1.0f, 2.0f))).toDF("query_id", "embedding")
    val c = corpusOf(Seq(Seq(1.0, 0.0)))
    assert(!c.isF32)
    val out = Similarity.matmul(q, "embedding", c)
    assert(out.schema("scores").dataType == ArrayType(DoubleType, containsNull = false))
  }

  test("ref:test_f32_array_type — Array[Float] (fixed-width f32 dtype) input, f32 output") {
    val dim = 8
    val q = Seq((0L, Array.fill(dim)(1.0f)), (1L, Array.fill(dim)(2.0f)))
      .toDF("query_id", "embedding")
    val c = corpusOfF32(Seq(Seq.fill(dim)(1.0f), Seq.fill(dim)(0.5f)))
    val out = Similarity.matmul(q, "embedding", c)
    assert(out.schema("scores").dataType == ArrayType(FloatType, containsNull = false))
    assert(out.count() == 2)
  }

  // ===== class TestLazyFrameEdgeCases =====
  // Spark DataFrames are lazy plans by construction; each test
  // composes the reference's surrounding operation into ONE plan
  // around the kernel and asserts the collected result.

  test("ref:test_lazy_basic_topk — kernel inside an unmaterialized plan") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(0.5, 0.5))))
    val out = Similarity.topk(q, "embedding", corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))),
      2, Metric.Cosine)
    assert(out.count() == 3 && out.columns.contains("matches"))
  }

  test("ref:test_lazy_with_filter_before — filter feeds the kernel only surviving rows") {
    val q = Seq(
      (0L, Seq(1.0, 0.0), true), (1L, Seq(0.0, 1.0), false),
      (2L, Seq(0.5, 0.5), true), (3L, Seq(1.0, 1.0), true))
      .toDF("query_id", "embedding", "active")
    val out = Similarity.topk(q.filter($"active"), "embedding",
      corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))), 1, Metric.Cosine)
    val ids = out.select($"query_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 2L, 3L))
  }

  test("ref:test_lazy_with_filter_after — filter on query_id after the kernel") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(0.5, 0.5))))
    val out = Similarity.topk(q, "embedding", corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))),
      2, Metric.Cosine).filter($"query_id" > 0)
    val ids = out.select($"query_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("ref:test_lazy_with_select — projection keeps only requested columns") {
    val q = Seq((0L, Seq(1.0, 0.0), "a"), (1L, Seq(0.0, 1.0), "b"))
      .toDF("query_id", "embedding", "metadata")
    val out = Similarity.topk(q, "embedding", corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))),
      1, Metric.Cosine, "top_match").select("query_id", "top_match")
    assert(out.columns.toSeq == Seq("query_id", "top_match"))
    assert(out.count() == 2)
  }

  test("ref:test_lazy_multiple_pmm_operations — two kernels against two corpora in one plan") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))))
    val c1 = corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val c2 = corpusOf(Seq(Seq(0.5, 0.5), Seq(1.0, 1.0)))
    val out = Similarity.topk(
      Similarity.topk(q, "embedding", c1, 1, Metric.Cosine, "matches_corpus1"),
      "embedding", c2, 1, Metric.Cosine, "matches_corpus2")
    assert(out.columns.contains("matches_corpus1") && out.columns.contains("matches_corpus2"))
    assert(out.count() == 2)
  }

  test("ref:test_lazy_explode_unnest_chain — lazy explode+unnest yields |Q|*k index/score rows") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))))
    val c = corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.5, 0.5)))
    val flat = Similarity.topkFlat(q, "embedding", c, 2, Metric.Cosine)
    assert(flat.count() == 4)
    assert(flat.columns.contains("index") && flat.columns.contains("score"))
  }

  test("ref:test_lazy_with_join_after — left join of corpus labels after the kernel") {
    val q = qDf(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))))
    val corpusDf = Seq((0L, Seq(1.0, 0.0), "cat"), (1L, Seq(0.0, 1.0), "dog"),
      (2L, Seq(0.5, 0.5), "bird")).toDF("corpus_id", "embedding", "label")
    val c = Similarity.collectCorpus(corpusDf, "corpus_id", "embedding")
    val meta = corpusDf.select($"corpus_id".as("index"), $"label")
    val out = Similarity.topkFlat(q, "embedding", c, 1, Metric.Cosine)
      .join(broadcast(meta), Seq("index"), "left")
    assert(out.columns.contains("label"))
    assert(out.count() == 2)
  }

  test("ref:test_lazy_with_group_by_after — group-by aggregation over kernel output") {
    val q = Seq(("A", Seq(1.0, 0.0)), ("A", Seq(0.9, 0.1)), ("B", Seq(0.0, 1.0)))
      .toDF("category", "embedding")
    val c = corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val out = Similarity.topkFlat(q, "embedding", c, 1, Metric.Cosine)
      .groupBy("category")
      .agg(avg($"score").as("avg_score"), countDistinct($"index").as("unique_matches"))
    assert(out.count() == 2)
    assert(out.columns.contains("avg_score"))
  }

  test("ref:test_lazy_matmul_basic — matmul inside a lazy plan") {
    val q = qDf(Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0))))
    val out = Similarity.matmul(q, "embedding", corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))))
    assert(out.columns.contains("scores"))
    val s0 = out.filter($"query_id" === 0L).head.getSeq[Double](2)
    assert(math.abs(s0(0) - 1.0) < 1e-6 && math.abs(s0(1) - 2.0) < 1e-6)
  }

  test("ref:test_lazy_with_streaming — 100 queries x 50 corpus across partitions") {
    val rnd = new scala.util.Random(42)
    val q = qDf((0L until 100L).map(i => (i, Seq.fill(32)(rnd.nextGaussian()))))
      .repartition(7) // the polars streaming-engine analogue: chunked execution
    val c = corpusOf((0 until 50).map(_ => Seq.fill(32)(rnd.nextGaussian())))
    assert(Similarity.topk(q, "embedding", c, 5, Metric.Cosine).count() == 100)
  }

  test("ref:test_lazy_empty_after_filter — filter-to-empty yields empty result with matches column") {
    val q = Seq((0L, Seq(1.0, 0.0), false), (1L, Seq(0.0, 1.0), false))
      .toDF("query_id", "embedding", "active")
    val out = Similarity.topk(q.filter($"active"), "embedding",
      corpusOf(Seq(Seq(1.0, 0.0))), 1, Metric.Cosine)
    assert(out.count() == 0)
    assert(out.columns.contains("matches"))
  }

  test("ref:test_lazy_with_limit — limit(5) before the kernel") {
    val q = qDf((0L until 100L).map(i => (i, Seq(i.toDouble, 0.0))))
    val out = Similarity.topk(q.limit(5), "embedding",
      corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))), 1, Metric.Cosine)
    assert(out.count() == 5)
  }

  test("ref:test_lazy_with_sort_before — sort order survives the kernel's map") {
    val q = qDf(Seq((2L, Seq(0.5, 0.5)), (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))))
    val out = Similarity.topk(q.orderBy("query_id"), "embedding",
      corpusOf(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))), 1, Metric.Cosine)
    assert(out.select($"query_id").collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("ref:test_lazy_array_type_optimization — f32 fixed-width input through a lazy chain") {
    val dim = 8
    val q = Seq(
      (0L, Array.fill(dim)(1.0f)), (1L, Array.fill(dim)(2.0f)), (2L, Array.fill(dim)(0.5f)))
      .toDF("query_id", "embedding")
    val c = corpusOfF32(Seq(Seq.fill(dim)(1.0f), Seq.fill(dim)(0.0f)))
    assert(Similarity.topk(q, "embedding", c, 1, Metric.Cosine).count() == 3)
  }
}
