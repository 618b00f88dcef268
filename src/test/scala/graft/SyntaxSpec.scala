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

  test("pipeline ops chain fluently and match their operator forms") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mangled = new String("café!".getBytes("UTF-8"), "windows-1252")
    val docs = Seq(
      (1L, s"A good first sentence here.\nbad { line }\n$mangled ok fine then.", "s0", 10L),
      (2L, "Another fine sentence stays.\nshort\nAnd one more good line here.", "s1", 99L),
      (3L, "Another fine sentence stays.\nshort\nAnd one more good line here.", "s1", 50L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = docs.hygiene("text")
      .winsorize("source", "n_chars")
      .splitN("doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .pseudonymize("k1", Seq("source"))
    assert(out.columns.toSet.contains("keep_doc") && out.columns.toSet.contains("n_chars_w"))
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[String]("text").contains("café! ok fine then."))
    assert(!rows(1L).getAs[String]("text").contains("{"))
    assert(rows.values.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
    assert(rows.values.forall(_.getAs[String]("source").length == 64))
    // dedupExact keeps one of the identical docs 2/3
    assert(docs.dedupExact("doc_id", "text").count() == 2)
    // intervalJoin syntax routes to the operator
    val pts = Seq((1L, 100L)).toDF("pid", "pt")
    val ivs = Seq((9L, 50L, 150L)).toDF("iid", "istart", "iend")
    assert(pts.intervalJoin("pt", ivs, "istart", "iend", 100L).count() == 1)
  }
}
