package graft

import graft.operators.{Metric, Similarity}
import graft.syntax._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The pmm-style facade must be a pure renaming of the operator API —
  * identical plans, identical results, same metric parsing errors.
  */
class SyntaxSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private lazy val corpusDF =
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 1.0)))
      .toDF("id", "embedding")
  private lazy val cx = Similarity.collectCorpus(corpusDF, "id", "embedding")
  private lazy val queries =
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.5, 0.5))).toDF("qid", "embedding")

  test("pmmTopk / pmmTopkFlat == Similarity.topk/topkFlat") {
    val viaSyntax = queries.pmmTopkFlat("embedding", cx, k = 2)
      .select("qid", "rank", "index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val direct = Similarity.topkFlat(queries, "embedding", cx, 2, Metric.Cosine)
      .select("qid", "rank", "index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaSyntax == direct && viaSyntax.nonEmpty)
    assert(queries.pmmTopk("embedding", cx, k = 2).columns.contains("matches"))
  }

  test("DataFrame-accepting overloads: a reference one-liner ports verbatim") {
    val viaDf = queries.pmmTopkFlat("embedding", corpusDF, "id", "embedding", k = 2)
      .select("qid", "rank", "index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val direct = Similarity.topkFlat(queries, "embedding", cx, 2, Metric.Cosine)
      .select("qid", "rank", "index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaDf == direct && viaDf.nonEmpty)
    assert(queries.pmmTopk("embedding", corpusDF, "id", "embedding", k = 2)
      .columns.contains("matches"))
    assert(queries.pmmMatmul("embedding", corpusDF, "id", "embedding", flatten = true)
      .count() == 2 * 3)
    // metric parsing flows through unchanged
    intercept[IllegalArgumentException](
      queries.pmmTopkFlat("embedding", corpusDF, "id", "embedding", 2, "manhattan"))
  }

  test("pmmMatmul default = score array; flatten = exploded rows") {
    val arr = queries.pmmMatmul("embedding", cx)
    assert(arr.schema("scores").dataType.typeName == "array")
    val flat = queries.pmmMatmul("embedding", cx, flatten = true)
    assert(flat.count() == 2 * 3)
    assert(flat.columns.toSet.intersect(Set("index", "score")) == Set("index", "score"))
  }

  test("metric strings parse like the reference (euclidean aliases, bad input throws)") {
    val e = queries.pmmTopkFlat("embedding", cx, k = 1, metric = "l2")
    assert(e.count() == 2)
    val err = intercept[IllegalArgumentException](
      queries.pmmTopkFlat("embedding", cx, k = 1, metric = "manhattan"))
    assert(err.getMessage.contains("Unknown metric"))
  }
}
