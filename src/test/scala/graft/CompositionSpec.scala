package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's lazy-composition surface
  * (tests/test_polars_matmul.py:467-768): the kernel must compose with
  * host-engine operations before and after it without breaking
  * laziness or results. Here that surface is Catalyst's — each shape
  * is checked against an independently computed expectation.
  */
class CompositionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  val dir = "/root/testdata/sf0.001"

  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val cx = Similarity.collectCorpus(emb, "vec_id", "embedding")

  test("filter before the kernel restricts the query set only") {
    val filtered = Similarity.topkFlat(
      emb.filter(col("vec_id") < 10).select("vec_id", "embedding"), "embedding", cx, 3, Metric.Cosine)
    val all = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 3, Metric.Cosine)
    val expect = all.filter(col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = filtered.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("filter after the kernel applies to match rows") {
    val out = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 5, Metric.Cosine)
      .filter(col("rank") === 1)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // rank-1 cosine self-search must be the query itself
    rows.foreach(r => assert(r.getLong(0) == r.getLong(2)))
  }

  test("aggregation after the kernel (group_by-after shape)") {
    val perQuery = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 5, Metric.Cosine)
      .groupBy("vec_id").agg(count(lit(1)).as("n"), max("score").as("best"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getLong(1) == 5)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6) // self-match is best
    }
  }

  test("two kernel invocations compose in one pipeline (multiple pmm ops shape)") {
    val a = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 1, Metric.Cosine)
      .select(col("vec_id"), col("index").as("cos_idx"))
    val b = Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", cx, 1, Metric.Euclidean)
      .select(col("vec_id"), col("index").as("l2_idx"))
    val joined = a.join(b, "vec_id").collect()
    assert(joined.nonEmpty)
    // self-search: both metrics agree the query itself is nearest
    joined.foreach(r => assert(r.getLong(1) == r.getLong(0) && r.getLong(2) == r.getLong(0)))
  }

  test("sort before + limit after keep kernel results consistent") {
    val lim = Similarity.topkFlat(
      emb.orderBy(col("vec_id").desc).select("vec_id", "embedding"),
      "embedding", cx, 2, Metric.Dot).limit(10)
    assert(lim.collect().length == 10)
  }
}
