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
}
