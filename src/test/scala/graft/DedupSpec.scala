package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, dir)

  test("exact dedup keeps one id per content hash, counts copies") {
    val base = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(base, "doc_id", "text").collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash+LSH recovers the exact-jaccard pairs (recall ≥ 0.9, precision 1.0)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8, shingleN = 5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus must contain near-dups")
    // verify stage computes exact jaccard -> every reported pair is real
    assert(mh.subsetOf(exact), s"false positives: ${mh -- exact}")
    val recall = (mh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
  }

  test("simhash: near-identical docs collide within hamming 3, distinct docs don't") {
    val a = "the quick brown fox jumps over the lazy dog again and again in the park"
    val b = a.replace("park", "yard") // one token changed
    val c = "completely different content about spark query engines and columnar io paths"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash signatures are deterministic") {
    val s1 = Dedup.simhashSignatures(docs.limit(50), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.simhashSignatures(docs.limit(50), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val emb = Tables.embeddings(spark, dir)
    val pairs = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.3).collect()
    assert(pairs.forall(r => r.getAs[Long]("id1") < r.getAs[Long]("id2")))
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.3))
  }

  test("ngram jaccard with df-cut still finds the high-sim pairs") {
    val noCut = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.9)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // df-cut drops ubiquitous shingles; candidate intersection shrinks, so
    // compare membership at a lower verify threshold
    val cut = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.5,
        maxDocFreq = 100L)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noCut.subsetOf(cut), s"missing: ${noCut -- cut}")
  }
}
