package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real corpora carry null text and null embeddings; every public
  * operator must tolerate them with sensible semantics rather than
  * crash. (The kernel's null propagation is covered in
  * SimilaritySpec; this spec sweeps the dedup/text family.)
  */
class NullSafetySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, null.asInstanceOf[String]),
    (3L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")

  test("null text: dedup family drops null docs from pair generation, keeps them groupable") {
    // exact: null text hashes to a null group — the (1,3) dup group is intact
    val exact = Dedup.exact(docs, "doc_id", "text").collect()
    assert(exact.length == 2)
    assert(exact.exists(r => r.getAs[Long]("keep_id") == 1L && r.getAs[Long]("n_copies") == 2L))
    // pair generators: the null doc simply never pairs
    for ((name, pairs) <- Seq(
        "minhash" -> Dedup.minhashPairs(docs, "doc_id", "text", 0.8),
        "simhash" -> Dedup.simhashPairs(docs, "doc_id", "text"),
        "ngram" -> Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8),
        "overlap" -> Dedup.overlapPairs(docs, "doc_id", "text", minShared = 1))) {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.forall(p => p._1 != 2L && p._2 != 2L), s"$name paired the null doc")
      assert(got.contains((1L, 3L)), s"$name missed the identical pair")
    }
    // end-to-end removal keeps the null doc (it duplicates nothing)
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("null text: winnow emits no fingerprints for the null doc") {
    val ids = TextAnalysis.winnow(docs, "doc_id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
  }

  test("null embeddings: pair generators skip the null row") {
    val emb = Seq((1L, Seq(1.0, 0.0)), (2L, null.asInstanceOf[Seq[Double]]),
      (3L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.toSeq == Seq((1L, 3L)))
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.5, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.toSeq == Seq((1L, 3L)))
  }

  test("null text: round-4 text ops propagate or drop nulls, never crash") {
    // perplexity: null text scores null bits, non-null docs unaffected
    val model = TextAnalysis.unigramModel(docs.filter($"text".isNotNull), "text")
    val nll = TextAnalysis.unigramNll(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(nll(2L).isEmpty && nll(1L).nonEmpty)
    // bm25: the null doc simply never matches
    val bm = TextAnalysis.bm25(docs, "doc_id", "text", Seq("fox"))
      .collect().map(_.getLong(0)).toSet
    assert(bm == Set(1L, 3L))
    // bpe: null text yields null pieces; others reconstruct
    val merges = TextAnalysis.trainBpe(docs.filter($"text".isNotNull), "text", 20)
    val pieces = TextAnalysis.bpePieces(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(pieces(2L).isEmpty && pieces(1L).nonEmpty)
    // quality features: null text featurizes to zeros (trainable frame)
    val feats = TextAnalysis.qualityFeatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(feats(2L) == 0.0)
    // source overlap: null text contributes no keys
    val ov = Dedup.sourceOverlap(
      Seq((1L, "a b c d e f", "s1"), (2L, null.asInstanceOf[String], "s2"),
        (3L, "a b c d e f", "s2")).toDF("doc_id", "text", "source"),
      "source", "text", gramN = 5).collect()
    assert(ov.length == 1 && ov.head.getLong(2) == 2L) // two shared 5-grams
    // hash mode: two sources that only share NULL text share NOTHING
    val ovh = Dedup.sourceOverlap(
      Seq((1L, null.asInstanceOf[String], "s1"), (2L, null.asInstanceOf[String], "s2"))
        .toDF("doc_id", "text", "source"),
      "source", "text").collect()
    assert(ovh.isEmpty)
  }

  test("null group: quota/mixture samplers drop rows with a null group key") {
    val df = Seq((1L, "s1"), (2L, null.asInstanceOf[String]), (3L, "s1"))
      .toDF("doc_id", "source")
    val q = graft.operators.Curate.sourceQuota(df, "source", "doc_id", 10)
      .collect().map(_.getLong(0)).toSet
    // a null key forms its own window group and survives the
    // constant-quota ranker; the MIXTURE form (CASE quota) drops it
    assert(q.contains(1L) && q.contains(3L))
    val m = graft.operators.Curate.mixtureSample(df, "source", "doc_id", Map("s1" -> 10))
      .collect().map(_.getLong(0)).toSet
    assert(m == Set(1L, 3L))
    val u = graft.operators.Curate.mixtureUpsample(df, "source", "doc_id", Map("s1" -> 2.0))
      .collect().map(_.getLong(0)).toSet
    assert(u == Set(1L, 3L))
  }

  test("null text/url: round-6 ops propagate or drop nulls, never crash") {
    // exact-substring dedup: the null doc passes through with null
    // clean text
    val spans = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", l = 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(spans(2L).isEmpty && spans(1L).nonEmpty)
    // fuzzy join: null strings generate no grams and no pairs
    val fz = graft.operators.Relational.fuzzyJoinPairs(
      Seq((1L, "abcdef"), (2L, null.asInstanceOf[String]), (3L, "abcdxf"))
        .toDF("id", "s"), "id", "s", maxDist = 1).collect()
    assert(fz.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 3L)))
    // DSIR: null text scores zero features
    val ratios = graft.operators.Curate.dsirLogRatios(
      docs.filter($"text".isNotNull), docs.filter($"text".isNotNull), "text", 64)
    val w = graft.operators.Curate.dsirWeights(docs, "doc_id", "text", ratios)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(2L) == 0L && w(1L) > 0L)
    // HTML extraction: null html extracts to null text
    val h = TextAnalysis.extractHtml(
      Seq((1L, "<p>hi</p>"), (2L, null.asInstanceOf[String])).toDF("id", "html"),
      "id", "html")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(h(2L).isEmpty && h(1L).contains("hi"))
    // URL dedup: null URLs form no group
    val ud = TextAnalysis.urlDuplicates(
      Seq((1L, "http://a.com/x"), (2L, null.asInstanceOf[String]),
        (3L, "http://a.com/x"), (4L, null.asInstanceOf[String]))
        .toDF("id", "url"), "id", "url").collect()
    assert(ud.length == 1 && ud.head.getLong(1) == 2L)
    // PMI: null text contributes no tokens, result unaffected
    val pmi = TextAnalysis.pmiPairs(
      Seq((1L, "x y x y x y"), (2L, null.asInstanceOf[String])).toDF("id", "text"),
      "id", "text", minCount = 2, k = 5).collect()
    assert(pmi.nonEmpty && pmi.head.getString(0) == "x y")
  }
}
