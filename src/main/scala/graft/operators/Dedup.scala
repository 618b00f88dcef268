package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines (SURVEY §2.3).
  *
  * Scale shapes (see SURVEY §4):
  * - exact: one hash-shuffle; only (hash, id) rows move, never text.
  * - n-gram Jaccard "exact pairs": inverted-index join on shingles —
  *   no cross join; `maxDocFreq` drops ubiquitous shingles (the
  *   standard df-cut) to bound fan-out at scale.
  * - MinHash+LSH: signatures are a scan-stage projection; only
  *   (band, hash, id) rows shuffle; candidate pairs verified by exact
  *   Jaccard on the candidates alone.
  * - SimHash: 64-bit fingerprint; pigeonhole chunk join (4×16 bits)
  *   finds all pairs with hamming ≤ 3 without an all-pairs pass.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest id.
    * Output: (content_hash, keep_id, n_copies).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(md5(col(textCol)).as("content_hash"), col(idCol).as("id"))
      .groupBy("content_hash")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  /** Distinct (doc, shingle) rows over normalized text. */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(charShingles(normalize(col(textCol)), n)).as("s"))

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join.
    * Output: (id1, id2, jaccard) with jaccard ≥ threshold.
    * `maxDocFreq`: drop shingles occurring in more than that many docs
    * (0 = keep all; required 0 for oracle parity, >0 at scale).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Long = 0L): DataFrame = {
    val sh0 = shingleRows(docs, idCol, textCol, n)
    val sh = if (maxDocFreq > 0) {
      val df = sh0.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxDocFreq)
      sh0.join(df.select("s"), Seq("s"))
    } else sh0
    // sizes over the same (possibly df-cut) universe as the intersection
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("id").as("id1"), col("s"))
    val b = sh.select(col("id").as("id2"), col("s"))
    val inter = a.join(b, Seq("s")).filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
      .withColumn("jaccard",
        round(col("c") / (col("n1") + col("n2") - col("c")), 4) + lit(0.0))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  /** Deterministic MinHash permutation parameters (seeded). Multipliers
    * stay below 2^30 so a·h (h < 2^32) never overflows a signed long
    * (Spark 4 runs ANSI arithmetic).
    */
  private def perms(numPerms: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPerms)((math.abs(rnd.nextLong()) % 1073741823L + 1L,
      math.abs(rnd.nextLong()) % 2147483647L))
  }

  /** MinHash signatures: one row per doc, sig = array<long>(numPerms).
    * Shingle → 32-bit murmur (Spark `hash`) → per-permutation
    * universal-hash min. Computed with one shuffle (groupBy id).
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 5,
      numPerms: Int = 128,
      seed: Long = 42L): DataFrame = {
    val prime = 4294967311L
    val sh = shingleRows(docs, idCol, textCol, shingleN)
      .withColumn("h", hash(col("s")).cast("long").bitwiseAND(0xFFFFFFFFL))
    val minCols = perms(numPerms, seed).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % prime).as(s"m$i")
    }
    sh.groupBy("id").agg(minCols.head, minCols.tail.toIndexedSeq: _*)
      .select(col("id"), array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash + banded LSH near-dup pairs, verified with exact Jaccard.
    * Output: (id1, id2, jaccard) for verified pairs ≥ threshold.
    * bands × rowsPerBand must equal numPerms.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleN: Int = 5,
      numPerms: Int = 128,
      bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val rpb = numPerms / bands
    val sig = minhashSignatures(docs, idCol, textCol, shingleN, numPerms, seed)
    val banded = sig.select(col("id"),
        posexplode(array((0 until bands).map(bd =>
          hash((0 until rpb).map(r => col("sig")(bd * rpb + r)): _*)): _*))
          .as(Seq("band", "bh")))
    val cand = banded.select(col("band"), col("bh"), col("id").as("id1"))
      .join(banded.select(col("band"), col("bh"), col("id").as("id2")), Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    verifyJaccard(docs, idCol, textCol, cand, shingleN, threshold)
  }

  /** Exact Jaccard for a candidate-pair set only (the verify stage). */
  private def verifyJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int,
      threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      charShingles(normalize(col(textCol)), shingleN).as("sset"))
    candidates
      .join(sets.select(col("id").as("id1"), col("sset").as("s1")), Seq("id1"))
      .join(sets.select(col("id").as("id2"), col("sset").as("s2")), Seq("id2"))
      .withColumn("c", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("jaccard",
        round(col("c") / (size(col("s1")) + size(col("s2")) - col("c")), 4) + lit(0.0))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  /** 64-bit SimHash fingerprints over whitespace tokens: per bit,
    * majority vote of token-hash bits. One shuffle (groupBy id).
    * Output: (id, simhash).
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(tokens(normalize(col(textCol)))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val agg = toks.groupBy("id").agg(bitSums.head, bitSums.tail.toIndexedSeq: _*)
    val simhash = (0 until 64).map { j =>
      shiftleft(when(col(s"b$j") >= 0, 1L).otherwise(0L), j)
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("id"), simhash.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist (≤ 3 by
    * default). Pigeonhole: split 64 bits into 4 chunks; any pair at
    * distance ≤ 3 shares a chunk, so a join per chunk finds all of
    * them — no all-pairs comparison.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sig = simhashSignatures(docs, idCol, textCol)
    val chunks = sig.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("chunk", "cv")))
    val cand = chunks.select(col("chunk"), col("cv"), col("id").as("id1"), col("simhash").as("sh1"))
      .join(chunks.select(col("chunk"), col("cv"), col("id").as("id2"), col("simhash").as("sh2")),
        Seq("chunk", "cv"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "sh1", "sh2").distinct()
    cand.withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= maxDist)
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  /** Embedding-cosine near-dup pairs — exact all-pairs form (oracle
    * parity; Ann.lshCosine* is the scale path). Broadcast self-join.
    * Output: (id1, id2, cosine ≥ threshold).
    */
  def embeddingPairsExact(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id1"), col(embCol).cast("array<double>").as("e1"))
    val b = emb.select(col(idCol).as("id2"), col(embCol).cast("array<double>").as("e2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .withColumn("cosine", round(array_cosine(col("e1"), col("e2")), 4) + lit(0.0))
      .filter(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
      .orderBy("id1", "id2")
  }
}
