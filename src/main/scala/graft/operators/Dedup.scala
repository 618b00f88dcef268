package graft.operators

import graft.functions.SketchFunctions._
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

  /** Exact n-gram Jaccard near-dup pairs via PREFIX-FILTERED
    * inverted-index join (the classic all-pairs similarity-join
    * optimization — Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08,
    * both public literature). Under a global shingle order (ascending
    * document frequency, then shingle), any pair with J ≥ τ must share
    * one of each side's first `|s| − ⌈τ·|s|⌉ + 1` shingles, so only
    * those RAREST shingles are indexed — fan-out is Σ df² over rare
    * shingles instead of all shingles. A size filter
    * (`min ≥ τ·max`) prunes further; survivors are verified with an
    * exact `array_intersect` Jaccard. Lossless: output is identical to
    * the full inverted-index join.
    *
    * Output: (id1, id2, jaccard) with jaccard ≥ threshold.
    * `maxDocFreq`: drop shingles occurring in more than that many docs
    * from the universe (0 = keep all; required 0 for oracle parity,
    * >0 as the extra safety valve at scale).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Long = 0L): DataFrame = {
    val sh0 = shingleRows(docs, idCol, textCol, n)
    val dfAll = sh0.groupBy("s").agg(count(lit(1)).as("df"))
    val dfKeep = if (maxDocFreq > 0) dfAll.filter(col("df") <= maxDocFreq) else dfAll
    val sh = sh0.join(dfKeep, Seq("s"))
    // doc → (sorted distinct-shingle set, size); sorted once here so
    // verification is a linear merge per pair instead of a per-pair
    // hash set. Without a df-cut the set is a pure scan-stage
    // projection; with one it must be rebuilt from the cut universe.
    val sets =
      if (maxDocFreq > 0)
        sh.groupBy("id")
          .agg(array_sort(collect_list(col("s"))).as("sset"), count(lit(1)).as("n"))
      else {
        val sset = array_sort(charShingles(normalize(col(textCol)), n))
        docs.select(col(idCol).as("id"), sset.as("sset"), size(sset).cast("long").as("n"))
      }
    // prefix index: each doc's (|s| − ceil(τ·|s|) + 1) rarest shingles
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("s").asc)
    val prefix = sh
      .withColumn("rn", row_number().over(w))
      .join(sets.select(col("id"), col("n")), Seq("id"))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold) + 1)
      .select(col("id"), col("s"), col("n"))
    val cand = prefix.select(col("id").as("id1"), col("s"), col("n").as("n1"))
      .join(prefix.select(col("id").as("id2"), col("s"), col("n").as("n2")), Seq("s"))
      .filter(col("id1") < col("id2") &&
        least(col("n1"), col("n2")) >= ceil(greatest(col("n1"), col("n2")) * threshold))
      .select("id1", "id2").distinct()
    val full = sets.select(col("id"), col("sset"))
    cand
      .join(full.select(col("id").as("id1"), col("sset").as("s1")), Seq("id1"))
      .join(full.select(col("id").as("id2"), col("sset").as("s2")), Seq("id2"))
      .withColumn("c", sorted_intersect_count(col("s1"), col("s2")))
      .withColumn("jaccard",
        round(col("c") / (size(col("s1")) + size(col("s2")) - col("c")), 4) + lit(0.0))
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
    // >>> 1 (not math.abs, which returns Long.MinValue for Long.MinValue)
    // guarantees a strictly positive multiplier
    Array.fill(numPerms)(((rnd.nextLong() >>> 1) % 1073741823L + 1L,
      (rnd.nextLong() >>> 1) % 2147483647L))
  }

  /** MinHash signatures: one row per doc, sig = array<long>(numPerms).
    * Shingle → 32-bit murmur (same seed as Spark `hash`) →
    * per-permutation universal-hash min, all inside one codegen'd
    * expression ([[graft.functions.MinHashSignature]]) — a pure
    * scan-stage projection with NO shuffle (SURVEY §4); the earlier
    * explode + groupBy(id) formulation shuffled every (doc, shingle)
    * row and produced bit-identical signatures.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 5,
      numPerms: Int = 128,
      seed: Long = 42L): DataFrame = {
    val ps = perms(numPerms, seed)
    docs.select(col(idCol).as("id"),
      minhash_signature(charShingles(normalize(col(textCol)), shingleN),
        ps.map(_._1), ps.map(_._2)).as("sig"))
  }

  /** Banding geometry derived from the similarity threshold: the most
    * selective (fewest-bands) divisor split of `numPerms` whose
    * S-curve midpoint (1/b)^(1/r) stays ≤ threshold − 0.05, i.e. the
    * highest rows-per-band that still catches threshold-level pairs
    * with high probability. Why this matters AT SCALE and not in unit
    * tests: a band of r rows collides for an UNRELATED pair with
    * probability s^r, where s is the background cross-doc Jaccard of
    * the corpus (never 0 in practice — English 5-grams, templated
    * text, or a synthetic hex alphabet all give s in the 0.001–0.05
    * range). Spurious candidates therefore grow as n²·b·s^r: with the
    * legacy fixed r=4 (b=32), a measured s≈0.002 corpus produced 286k
    * false candidates at 1M docs, 2.97M at 4M, and 15.6M at 10M —
    * quadratic, exactly n²·b·s⁴, and every one of them paid for a
    * Jaccard verify. At r=8 the same corpus's term is n²·16·s⁸ ≈
    * 2e-8 pairs at 10M — the quadratic wall is gone for any n that
    * fits a cluster. Recall at the threshold itself stays high: for
    * τ=0.8, (b=16, r=8) detects s=0.80 pairs with p≈0.95, s=0.85 with
    * p≈0.994, s=0.9 with p≈0.9999. The 0.05 margin keeps a midpoint
    * from landing ON the threshold (recall there would be ~50%):
    * τ=0.7 resolves to (32, 4) — midpoint 0.42 — not (16, 8) whose
    * 0.707 midpoint would halve recall at exactly 0.7.
    */
  def lshBands(numPerms: Int, threshold: Double): Int = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val divisors = (1 to numPerms).filter(numPerms % _ == 0)
    divisors
      .filter(b => math.pow(1.0 / b, b.toDouble / numPerms) <= threshold - 0.05)
      .minOption
      // thresholds below every midpoint (τ ≲ 0.06): max recall is all
      // that's left — single-row bands
      .getOrElse(numPerms)
  }

  /** MinHash + banded LSH near-dup pairs, verified with exact Jaccard.
    * Output: (id1, id2, jaccard) for verified pairs ≥ threshold.
    * bands × rowsPerBand must equal numPerms; `bands = 0` (default)
    * derives the geometry from the threshold via [[lshBands]] — pass
    * an explicit count only to reproduce a fixed legacy geometry.
    *
    * `maxBucketSize` is the skew valve (SURVEY §4): a degenerate
    * (band, hash) bucket — e.g. every empty/boilerplate doc in the
    * corpus — would otherwise generate O(|bucket|²) candidate pairs
    * inside one task. Buckets above the cap degrade to STAR pairs
    * (every member against the bucket's min id): O(|bucket|) pairs
    * that still verify each member against a true near-dup and keep
    * the pair graph connected for [[clusterPairs]]; buckets at or
    * under the cap generate all pairs as usual, so recall on
    * non-degenerate corpora is unchanged.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleN: Int = 5,
      numPerms: Int = 128,
      bands: Int = 0,
      maxBucketSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    val b = if (bands > 0) bands else lshBands(numPerms, threshold)
    require(numPerms % b == 0, "bands must divide numPerms")
    require(maxBucketSize >= 2, s"maxBucketSize must be >= 2, got $maxBucketSize")
    val ps = perms(numPerms, seed)
    // Signature + band hashes fused in ONE expression
    // ([[graft.functions.MinHashBandHashes]]): posexplode/lambdas
    // re-evaluate their input per produced row, so referencing a sig
    // column here recomputed normalize+shingle+minhash `bands` times
    // per document. Two docs share a band iff their sig block is
    // equal, so any deterministic block hash yields the same
    // candidates; verification is exact either way.
    val banded = docs.select(col(idCol).as("id"),
        posexplode(minhash_band_hashes(
          charShingles(normalize(col(textCol)), shingleN),
          ps.map(_._1), ps.map(_._2), b)).as(Seq("band", "bh")))
    val cand = cappedBucketPairs(banded, Seq("band", "bh"), maxBucketSize)
    verifyJaccard(docs, idCol, textCol, cand, shingleN, threshold)
  }

  /** The candidate half of [[minhashPairs]] (banding + capped bucket
    * pairs, NO Jaccard verify) — exposed for scale diagnostics
    * ([[graft.tools.MinhashScaleProbe]]) so sub-stage walls can be
    * attributed instead of guessed. Same args, same candidate set the
    * verify stage sees.
    */
  private[graft] def minhashCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleN: Int = 5,
      numPerms: Int = 128,
      bands: Int = 0,
      maxBucketSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    val b = if (bands > 0) bands else lshBands(numPerms, threshold)
    cappedBucketPairs(
      minhashBanded(docs, idCol, textCol, shingleN, numPerms, b, seed),
      Seq("band", "bh"), maxBucketSize)
  }

  /** The exploded (id, band, bh) rows [[minhashCandidates]] buckets on
    * — exposed for bucket-distribution diagnostics.
    */
  private[graft] def minhashBanded(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 5,
      numPerms: Int = 128,
      bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val ps = perms(numPerms, seed)
    docs.select(col(idCol).as("id"),
      posexplode(minhash_band_hashes(
        charShingles(normalize(col(textCol)), shingleN),
        ps.map(_._1), ps.map(_._2), bands)).as(Seq("band", "bh")))
  }

  /** Within-bucket candidate pairs with the skew valve shared by every
    * LSH path: `sigs` is (id, bucket-key...) rows; buckets at or under
    * `cap` produce all (id1 < id2) pairs, larger buckets degrade to
    * O(|bucket|) STAR pairs anchored at the bucket min — bounded
    * fan-out, verify coverage for every member, and a connected pair
    * graph for clustering.
    *
    * The size/min stats come from a partial-aggregatable `groupBy`,
    * NOT a window keyed on the bucket: the degenerate bucket this cap
    * exists to defuse (every boilerplate/empty doc colliding in one
    * (band, hash)) is precisely the key a bucket-keyed window would
    * hand to ONE task — all n occurrences, unsplittable by AQE — the
    * same cliff the round-7 `dedupParagraphs` rebuild removed one
    * level up. With groupBy the hot bucket combines map-side (one
    * partial row per input partition), and the join attaching stats
    * back to members is an equi-join AQE CAN split.
    */
  private def cappedBucketPairs(sigs: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val stats = sigs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bsize"), min("id").as("bmin"))
    val withStats = sigs.join(stats, keys)
    val small = withStats.filter(col("bsize") <= cap)
    val candSmall = small.select(keys.map(col) :+ col("id").as("id1"): _*)
      .join(small.select(keys.map(col) :+ col("id").as("id2"): _*), keys)
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
    val candLarge = withStats
      .filter(col("bsize") > cap && col("id") =!= col("bmin"))
      .select(col("bmin").as("id1"), col("id").as("id2"))
    // dedup partitioned on id1 only (a subset of the keys co-locates
    // every copy of a pair, so the aggregate needs no second
    // exchange), and the verify stage's id1-side join then reuses the
    // same partitioning — the candidate set crosses one shuffle, the
    // same argument as Ann.dedupPairs.
    candSmall.unionAll(candLarge)
      .repartition(col("id1")).dropDuplicates("id1", "id2")
  }

  /** Exact Jaccard for a candidate-pair set only (the verify stage).
    * Docs are semi-joined to the candidate id universe BEFORE the
    * shingle sets are built, so set construction, sorting, and both
    * verify shuffles are proportional to |candidates| — at scale the
    * candidate universe is a sliver of the corpus, and shipping every
    * doc's sorted shingle set through two joins dominated the stage.
    */
  private def verifyJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int,
      threshold: Double): DataFrame = {
    // materialize the (expensive) candidate pipeline once: it feeds
    // three subtrees below (two join sides + the semi-filter id
    // universe), which would otherwise re-run LSH banding three times.
    // LAZY checkpoint: eager (the default) runs the whole banding
    // pipeline at OPERATOR-CALL time — work before any action breaks
    // lazy composition, and it silently escaped every `timed {}` block
    // that wrapped only the action (ScaleSmoke under-reported this
    // stage 5x for three rounds). Laziness changes nothing about
    // reuse: the checkpoint materializes once at the first action and
    // all three subtrees read it.
    val cand = candidates.localCheckpoint(eager = false)
    val candIds = cand.select(col("id1").as("id"))
      .unionAll(cand.select(col("id2").as("id")))
      .distinct()
    val sets = docs.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(candIds, Seq("id"), "leftsemi")
      .select(col("id"),
        array_sort(charShingles(normalize(col("__text")), shingleN)).as("sset"))
    cand
      .join(sets.select(col("id").as("id1"), col("sset").as("s1")), Seq("id1"))
      .join(sets.select(col("id").as("id2"), col("sset").as("s2")), Seq("id2"))
      .withColumn("c", sorted_intersect_count(col("s1"), col("s2")))
      .withColumn("jaccard",
        round(col("c") / (size(col("s1")) + size(col("s2")) - col("c")), 4) + lit(0.0))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
      .orderBy("id1", "id2")
  }

  /** Snapshot DIFF between two corpus versions — the change audit an
    * incremental pipeline runs between crawls ("what did yesterday →
    * today actually change"), and the input census for
    * [[exactIncremental]]. Content identity is md5 of the text, so
    * only (id, digest) pairs cross the one full-outer hash join —
    * never the documents. Output: (id, status ∈
    * added|removed|changed|unchanged), total ordering by id.
    */
  def corpusDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // presence rides its own marker: md5(NULL text) is NULL, so hash
    // nullability must not double as the existence test (a null-text
    // row would misreport added/removed); null-safe <=> lets two
    // null-text rows compare as unchanged
    val o = oldDocs.select(col(idCol).as("id"),
      md5(col(textCol)).as("__oh"), lit(true).as("__op"))
    val n = newDocs.select(col(idCol).as("id"),
      md5(col(textCol)).as("__nh"), lit(true).as("__np"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(col("__oh") <=> col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
      .orderBy("id")
  }

  /** 64-bit SimHash fingerprints over whitespace tokens: per bit,
    * majority vote of token-hash bits (xxh64, same seed as Spark
    * `xxhash64`), in one codegen'd expression
    * ([[graft.functions.SimHash64]]) — scan-stage projection, no
    * shuffle. Output: (id, simhash).
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      simhash64(tokens(normalize(col(textCol)))).as("simhash"))

  /** SimHash near-dup pairs with hamming distance ≤ maxDist. Pigeonhole:
    * split 64 bits into maxDist + 1 chunks — any pair at distance ≤
    * maxDist must agree on at least one chunk, so a join per chunk finds
    * all of them with no all-pairs comparison. The chunk count is
    * DERIVED from maxDist (4×16 bits at the default 3), so completeness
    * holds for every maxDist, not just ≤ 3.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame =
    hammingPairs(simhashSignatures(docs, idCol, textCol), "id", "simhash", maxDist)

  /** All pairs of 64-bit fingerprints within hamming `maxDist` — the
    * signature-level core of [[simhashPairs]], reusable for ANY 64-bit
    * perceptual fingerprint (image aHash —
    * [[Multimodal.imageNearDupPairs]] — audio chromaprints, …). Same
    * pigeonhole-chunk join geometry and exact verify.
    */
  def hammingPairs(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 16,
      s"maxDist must be in [0, 16], got $maxDist (chunks of < 4 bits bucket everything together)")
    val nChunks = maxDist + 1
    val sig = sigs.select(col(idCol).as("id"), col(sigCol).as("simhash"))
    val chunkCols = (0 until nChunks).map { c =>
      val start = c * 64 / nChunks
      val width = (c + 1) * 64 / nChunks - start
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      shiftright(col("simhash"), start).bitwiseAND(mask)
    }
    val chunks = sig.select(col("id"), col("simhash"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "cv")))
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

  /** SimHash near-dup pairs for LARGE corpora — same output contract
    * as [[simhashPairs]], different join geometry. The narrow-chunk
    * pigeonhole saturates at millions of docs (maxDist+1 chunks of
    * 64/(maxDist+1) bits hold few distinct values, so chunk buckets
    * grow linearly with n and within-bucket comparison quadratically —
    * measured 7× superlinear at 4M docs). Here the pigeonhole uses
    * ceil((maxDist+1)/2) WIDE chunks — some chunk of any qualifying
    * pair differs in ≤ 1 bit — and each doc emits, per chunk, its
    * exact value plus every one-bit flip (HmSearch-style query
    * expansion, Zhang et al. VLDB'13 — public literature). The join
    * requires at least one side exact, so keys are effectively
    * 32-bit-wide values whose buckets stay tiny at any corpus size;
    * fan-out is a fixed ~(width+1) rows per chunk per doc instead of
    * growing with n. Exact hamming verify on candidates either way.
    */
  def simhashPairsWide(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15,
      s"maxDist must be in [0, 15], got $maxDist")
    val nChunks = (maxDist + 2) / 2 // ceil((maxDist+1)/2)
    val sig = simhashSignatures(docs, idCol, textCol)
    val chunkCols = (0 until nChunks).flatMap { c =>
      val start = c * 64 / nChunks
      val width = (c + 1) * 64 / nChunks - start
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      val exact = shiftright(col("simhash"), start).bitwiseAND(mask)
      // key 0 = exact value; keys 1..width = one-bit flips
      (0 to width).map { b =>
        val v = if (b == 0) exact else exact.bitwiseXOR(lit(1L << (b - 1)))
        struct(lit(c).as("chunk"), v.as("cv"), lit(b == 0).as("isExact"))
      }
    }
    val keys = sig.select(col("id"), col("simhash"),
      explode(array(chunkCols: _*)).as("k"))
      .select(col("id"), col("simhash"),
        col("k.chunk").as("chunk"), col("k.cv").as("cv"), col("k.isExact").as("isExact"))
    val a = keys.select(col("chunk"), col("cv"), col("id").as("id1"),
      col("simhash").as("sh1"), col("isExact").as("e1"))
    val b = keys.select(col("chunk"), col("cv"), col("id").as("id2"),
      col("simhash").as("sh2"), col("isExact").as("e2"))
    val cand = a.join(b, Seq("chunk", "cv"))
      .filter(col("id1") < col("id2") && (col("e1") || col("e2")))
      .select("id1", "id2", "sh1", "sh2").distinct()
    cand.withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= maxDist)
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  /** Single entry point for SimHash pair generation — ALWAYS the
    * narrow-chunk pigeonhole. Until round 11 this switched to
    * [[simhashPairsWide]] past 5×10⁶ docs on a projected bucket-
    * saturation crossover; the 10M×maxDist=3 measurement REFUTED that
    * projection (narrow 99 s vs wide 1214 s, identical pairs,
    * BENCH_NOTES round 11): the wide form's ~(width+1)× key fan-out
    * costs far more than narrow's bucket growth recovers at any
    * measured scale, so no caller inherits the retired heuristic
    * (round-11 verdict #7). The wide form survives solely as the
    * independent-geometry cross-check (the `dedup_simhash_xcheck`
    * gate calls [[simhashPairsWide]] directly) — both produce the
    * SAME pair set (DedupSpec asserts equality).
    *
    */
  def simhashPairsAuto(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame =
    simhashPairs(docs, idCol, textCol, maxDist)

  /** Signature-stable overload from the pre-round-12 contract, where
    * `nDocsHint` selected the (since-refuted) wide geometry past a doc
    * -count crossover. The hint is IGNORED — callers tuning it, or
    * passing a count to avoid a scan, get a compile-time deprecation
    * warning instead of a silent no-op.
    */
  @deprecated("nDocsHint is ignored: simhashPairsAuto has routed narrow " +
    "unconditionally since round 12 (the wide crossover was refuted at 10M docs)",
    "round 12")
  def simhashPairsAuto(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int,
      nDocsHint: Long): DataFrame =
    simhashPairs(docs, idCol, textCol, maxDist)

  /** Connected components over a near-dup pair graph: every doc gets
    * `cluster` = the smallest doc id reachable through pairs — the
    * step that turns pairwise matches into "keep one per group".
    * Iterative min-label propagation (each round: labels flow across
    * edges both ways, keep the min), run to fixpoint. Rounds needed =
    * graph diameter ≈ log(n) for near-dup clusters, which are tiny and
    * star-shaped in practice; each round is one shuffle-join + one
    * groupBy. At cluster scale, checkpoint every few rounds to cut
    * lineage (noted, not needed at these sizes).
    */
  def clusterPairs(ids: DataFrame, idCol: String, pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialize the (usually expensive) pair graph once, and
    // truncate label lineage each round — otherwise round i replays
    // every previous round's join on top of the pair generation.
    // NOT pre-partitioned on the join key: a round-16 attempt added
    // `repartition(col("id2"))` here hoping every round's
    // edges⋈labels join would reuse that one exchange, but the
    // checkpoint surfaces to the optimizer as a plain
    // `Scan ExistingRDD … UnknownPartitioning(0)` under AQE
    // (plans/r17/cc_round2_plan_probe.txt: round-2's final plan
    // re-exchanges the edge side either way), so the repartition was
    // a pure extra full shuffle of the loop's biggest frame —
    // reverted, round-17.
    val edges = pairs.select(col("id1"), col("id2"))
      .unionAll(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .localCheckpoint()
    // SEEDED at the one-hop neighborhood minimum: round 1 of the loop
    // would compute exactly min(self, direct neighbors) from identity
    // labels, so starting there skips one full round (join + union +
    // groupBy + checkpoint + convergence action) for the price of a
    // single groupBy+join executed once. Fixpoint detection is
    // unaffected — the loop still runs until a round changes nothing.
    val nbrMin = edges.groupBy(col("id1").as("id")).agg(min("id2").as("nmin"))
    var labels = ids.select(col(idCol).as("id"))
      .join(nbrMin, Seq("id"), "left")
      .select(col("id"), least(coalesce(col("nmin"), col("id")), col("id")).as("cluster"))
      .localCheckpoint()
    var changed = true
    var iter = 0
    while (changed && iter < maxIters) {
      // the self branch carries each id's PREVIOUS label through the
      // min-aggregation (edge contributions carry a null sentinel,
      // which min() ignores — works for ANY id type, numeric or not),
      // so the convergence check is a filter over the freshly
      // checkpointed frame — no second join against the old labels,
      // which halved the per-round cost at toy scale
      val viaEdges = edges.join(labels, edges("id2") === labels("id"))
        .select(edges("id1").as("id"), col("cluster"), lit(null).as("old"))
      // lazy checkpoint + FULL-SCAN convergence agg: the agg is the
      // action that materializes the checkpoint — one job per round,
      // not two. (A limit(1) probe would be cheaper in isolation but
      // can stop before all partitions are computed, and the local
      // checkpoint then launches a second job for the missing ones.)
      val next = labels.select(col("id"), col("cluster"), col("cluster").as("old"))
        .unionAll(viaEdges)
        .groupBy("id").agg(min("cluster").as("cluster"), min("old").as("old"))
        .localCheckpoint(eager = false)
      changed = next.agg(
        count(when(col("cluster") =!= col("old"), 1))).head.getLong(0) > 0
      labels = next.select("id", "cluster")
      iter += 1
    }
    labels.orderBy("id")
  }

  /** Substring-overlap near-dup pairs via winnowing fingerprints —
    * COPY detection, a different paradigm from whole-document Jaccard:
    * two documents match if they share ≥ `minShared` winnow
    * fingerprints, i.e. they share verbatim passages (any common
    * substring of length ≥ w + k − 1 is guaranteed to contribute a
    * shared fingerprint), regardless of how different the rest of the
    * documents are. Plan shape: fingerprints are a scan-stage
    * projection; the join carries (fp, id) only; `maxDocFreq` drops
    * boilerplate fingerprints appearing in more than that many docs
    * (the df-cut valve — a site-wide footer should not pair every doc
    * with every other). On heavily TEMPLATED corpora the df-cut is the
    * load-bearing knob: at sf0.1 the synthetic documents share so much
    * phrasing that k=8/df≤1000 yields 9.7M pairs in 24 s, while
    * k=16/df≤20 yields the 13k genuinely-overlapping pairs in 2 s —
    * tune df to the corpus's boilerplate profile.
    * Output: (id1, id2, shared_fps) with shared_fps ≥ minShared.
    */
  def overlapPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int = 2,
      k: Int = 16,
      w: Int = 8,
      maxDocFreq: Long = 1000L): DataFrame = {
    import graft.functions.SketchFunctions.winnow_fingerprints
    // materialized once: the frame feeds the df aggregation AND both
    // self-join sides — without the checkpoint every document would be
    // fingerprinted three times. Lazy for the same reason as
    // [[verifyJaccard]]: no work before the caller's first action.
    val fps = docs.select(col(idCol).as("id"),
        explode(array_distinct(winnow_fingerprints(normalize(col(textCol)), k, w))).as("fp"))
      .localCheckpoint(eager = false)
    val kept =
      if (maxDocFreq > 0) {
        val df = fps.groupBy("fp").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq)
        fps.join(df.select("fp"), Seq("fp"))
      } else fps
    kept.select(col("fp"), col("id").as("id1"))
      .join(kept.select(col("fp"), col("id").as("id2")), Seq("fp"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .orderBy("id1", "id2")
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — public literature): each round rewires every node's
    * neighbors to its neighborhood minimum, which provably converges
    * in O(log² n) rounds REGARDLESS of graph diameter — the scale
    * path where [[clusterPairs]]' min-label propagation needs
    * diameter rounds (a 10 000-long chain of near-dups would need
    * 10 000 propagation rounds but ~15 star rounds). Each half-round
    * is one groupBy(min) + one join, all shuffles on node id; no
    * driver-side state beyond the convergence counter.
    *
    * Same contract as [[clusterPairs]]: every id in `ids` gets
    * `cluster` = smallest reachable id.
    */
  def clusterPairsStars(
      ids: DataFrame, idCol: String, pairs: DataFrame, maxIters: Int = 30): DataFrame = {
    val p = pairs.select(col("id1").as("a"), col("id2").as("b"))
    var edges = p
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)

    // one half-round over the BIDIRECTED neighborhood, per the paper:
    // large-star(u) connects every neighbor v > u to m(u) =
    // min(N(u) ∪ {u}); small-star(u) connects every neighbor v < u,
    // and u itself, to m(u). Output edges are canonical (u > v).
    // Duplicate edges are NOT dropped inside a half-round: no
    // neighborhood minimum changes under duplication, so one distinct
    // at the round end suffices — one shuffle per round, not two
    // (round-2 verdict #3: 12.2 s of mostly fixed per-round cost).
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val b = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val minN = b.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val withM = b.join(minN, "u")
      val out =
        if (large) withM.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
        else withM.filter(col("v") < col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(minN.select(col("u"), col("m").as("v")))
      out.filter(col("u") =!= col("v"))
    }

    // order-independent edge-set digest (bit_xor can't overflow under
    // ANSI arithmetic, unlike a sum of hashes); distinct edges make
    // xor-cancellation of duplicates a non-issue. The digest job is
    // ALSO the checkpoint materialization: edges is localCheckpoint
    // (eager = false), so the agg both persists the round's edge set
    // and reads the convergence state — ONE action per round where
    // round 2 paid three (eager checkpoint + digest + isEmpty probe).
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var prev = fingerprint(edges)
    if (prev._1 > 0L) {
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        edges = star(star(edges, large = true), large = false)
          .distinct()
          .localCheckpoint(eager = false)
        val cur = fingerprint(edges)
        converged = cur == prev
        prev = cur
        iter += 1
      }
    }
    // converged graph is a star per component; read labels off the
    // bidirected neighborhood minimum
    val bi = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val lab = bi.groupBy("u").agg(min("v").as("mv"))
    ids.select(col(idCol).as("id"))
      .join(lab, col("id") === col("u"), "left")
      .select(col("id"), least(coalesce(col("mv"), col("id")), col("id")).as("cluster"))
      .orderBy("id")
  }

  /** Keep one representative per near-dup group — the operation a
    * training pipeline actually runs: connected components over the
    * given pair graph ([[clusterPairsStars]], diameter-independent),
    * then keep exactly the rows whose id IS their cluster's minimum.
    * `pairs` comes from any of the pair generators ([[minhashPairs]],
    * [[ngramJaccardPairs]], [[embeddingPairsLsh]], [[overlapPairs]]) —
    * exact generators give a deterministic result, sketch-based ones
    * an approximate one with the generator's recall.
    * Output: the surviving rows of `docs`, all columns intact.
    */
  def dropDuplicatesByPairs(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val reps = clusterPairsStars(docs.select(col(idCol)), idCol, pairs)
      .filter(col("id") === col("cluster"))
      .select(col("id").as(idCol))
    docs.join(reps, Seq(idCol), "leftsemi")
  }

  /** [[dropDuplicatesByPairs]] keeping the BEST row per near-dup
    * cluster instead of the min-id one: the curation form — when a
    * page was crawled five times, keep the longest/highest-quality
    * variant, not whichever got the smallest id. `scoreCol` is any
    * orderable quality column (chars, words, a model score); ties
    * break to the LOWEST id so the result is deterministic.
    *
    * Plan shape: components come from the same diameter-independent
    * [[clusterPairsStars]]; the per-cluster argmax is ONE groupBy over
    * (cluster → max(score, -id) struct) — an aggregation with map-side
    * partials, not a per-cluster window, so a pathological giant
    * cluster costs a hot reduce key, never a single-task sort. Ids
    * must be numeric (they ride the struct-max negated for the
    * tie-break), the same contract as the hash-routed index builders.
    */
  def dropDuplicatesByPairsKeepBest(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: String): DataFrame = {
    val comps = clusterPairsStars(docs.select(col(idCol)), idCol, pairs)
    val winners = docs
      .select(col(idCol).cast("long").as("id"),
        col(scoreCol).as("graft_kb_score"))
      .join(comps, "id")
      .groupBy(col("cluster"))
      .agg(max(struct(col("graft_kb_score").as("s"), (-col("id")).as("nid")))
        .as("w"))
      .select((-col("w.nid")).as(idCol))
    docs.join(winners, Seq(idCol), "leftsemi")
  }

  /** [[dropDuplicatesByPairs]] with the MinHash+LSH near-dup generator
    * — the one-call "dedupe this corpus" most pipelines want.
    */
  def dropNearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleN: Int = 5): DataFrame =
    dropDuplicatesByPairs(docs, idCol,
      minhashPairs(docs, idCol, textCol, threshold, shingleN))

  /** Embedding-cosine near-dup pairs — exact all-pairs form (oracle
    * parity; [[embeddingPairsLsh]] is the scale path). Broadcast
    * self-join → O(n²) cosine by construction, so it GUARDS on corpus
    * size: above `maxRows` it refuses and points at the LSH path —
    * nothing in the public API should silently run O(n²) on 1B rows.
    * Output: (id1, id2, cosine ≥ threshold).
    */
  def embeddingPairsExact(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    // guard scan is itself bounded: limit(maxRows + 1) stops the scan
    // as soon as the bound is provably exceeded — a count() here would
    // read the whole (possibly enormous) corpus just to refuse it
    val probe = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    val over = emb.select(col(idCol)).limit(probe).count() > maxRows
    require(!over,
      s"embeddingPairsExact is O(n²) (all-pairs cosine): corpus has > maxRows=$maxRows rows. " +
        "Use Dedup.embeddingPairsLsh (hyperplane-bucketed, verified) for large corpora, " +
        "or raise maxRows explicitly if the quadratic cost is intended.")
    // all-pairs cosine IS a matmul: run the broadcast+GEMM kernel and
    // materialize only qualifying pairs (the round-2 shape — broadcast
    // nested-loop join + per-pair cosine expression — was 2.7× DuckDB;
    // the kernel turns the n² scoring into blocked BLAS). The kernel
    // threshold carries a 1e-4 margin because the CONTRACT filters on
    // the 4-decimal-ROUNDED cosine (as the SQL oracle does): a raw
    // 0.29996 rounds up to the threshold and must not be lost.
    Similarity.cosinePairsAbove(emb, idCol, embCol, threshold - 1e-4)
      .withColumn("cosine", round(col("cosine"), 4) + lit(0.0))
      .filter(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
      .orderBy("id1", "id2")
  }

  /** Embedding-cosine near-dup pairs at scale: random-hyperplane LSH
    * buckets (multi-probe, same machinery as [[Ann.lshCosineTopK]])
    * generate id-only candidate pairs, exact cosine verifies each —
    * the SURVEY §4 shape: hyperplane sign bits → bucket shuffle →
    * local pairs, never an O(n²) self-join. Approximate in the same
    * sense as [[minhashPairs]]: a true pair is missed only if it
    * disagrees in all `tables` probed signatures.
    *
    * SIZE `bits` WITH THE CORPUS: candidate volume is
    * ≈ tables · probes² · n²/2^bits (every within-bucket pair), and
    * the verify join attaches 2·dim·8 bytes to each candidate. With
    * the default bits=8 a 4M-vector corpus generates ~10⁸ candidates
    * and a ~200 GB verify shuffle; bits ≈ log₂(n) + 2 keeps expected
    * bucket size ≈ 1 and candidates ≈ O(n) + true matches (the 4M
    * scale smoke runs tables=2, bits=22, probes=2). Defaults suit
    * corpora up to ~10⁵.
    * Output: (id1, id2, cosine ≥ threshold).
    */
  def embeddingPairsLsh(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      dim: Int = 0,
      tables: Int = 16,
      bits: Int = 8,
      probes: Int = 4,
      maxBucketSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions.lsh_probe_buckets
    require(maxBucketSize >= 2, s"maxBucketSize must be >= 2, got $maxBucketSize")
    val d = if (dim > 0) dim
      else emb.select(size(col(embCol))).head.getInt(0)
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(tables * bits * d)(rnd.nextGaussian())
    val sigs = emb.select(col(idCol).as("id"),
        posexplode(lsh_probe_buckets(col(embCol), planes, tables, bits, probes))
          .as(Seq("pos", "bucket")))
      .select(col("id"), (col("pos") / probes).cast("int").as("table"), col("bucket"))
    // same skew valve as minhashPairs: oversized buckets → star pairs
    val cand = cappedBucketPairs(sigs, Seq("table", "bucket"), maxBucketSize)
    val e = emb.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("e"))
    cand
      .join(e.select(col("id").as("id1"), col("e").as("e1")), Seq("id1"))
      .join(e.select(col("id").as("id2"), col("e").as("e2")), Seq("id2"))
      .withColumn("cosine", round(array_cosine(col("e1"), col("e2")), 4) + lit(0.0))
      .filter(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
      .orderBy("id1", "id2")
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023):
    * cluster the embedding space with spherical k-means
    * ([[Ann.trainCellIndex]] — bounded deterministic sample, GEMM
    * assignment), then emit exact-cosine-verified pairs WITHIN cells
    * only. Where [[embeddingPairsLsh]] recovers near-identical
    * vectors via random hyperplanes, this form follows the data's own
    * cluster structure — the shape SemDeDup showed prunes semantic
    * (not just lexical) duplicates at web scale.
    *
    * `assign` > 1 assigns each vector to its `assign` nearest cells,
    * so pairs straddling one cell boundary are still co-located in
    * the runner-up cells (the standard recall fix for hard
    * partitioning; SemDeDup proper is top-1 — measured on the
    * synthetic gaussian corpus at τ=0.3, the auto defaults hold
    * recall 0.985–0.999 across sf0.001–0.1 where top-1 drops below
    * 0.4). Both sizing knobs auto-scale by default: nCells to √n (the
    * round-4 verdict's #3 — see the inline rationale) and assign to
    * 2·ln(nCells), so the defaults stay inside the 0.8 recall gate at
    * every measured SF without a caller reading the survey.
    * Candidate generation is
    * the same capped-bucket join as every LSH path: ids only, star
    * degradation above `maxCellSize`, one shuffle; precision is 1.0
    * by construction (every emitted pair is exact-cosine verified).
    * Output: (id1, id2, cosine ≥ threshold).
    */
  def semanticPairs(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      nCells: Int = 0,
      assign: Int = 0,
      lloydIters: Int = 5,
      maxTrain: Int = 0,
      maxCellSize: Int = 0): DataFrame = {
    require(assign >= 0, s"assign must be >= 0 (0 = auto), got $assign")
    require(maxTrain >= 0, s"maxTrain must be >= 0 (0 = auto), got $maxTrain")
    require(maxCellSize >= 0, s"maxCellSize must be >= 0 (0 = auto), got $maxCellSize")
    // nCells = 0 (the default) auto-sizes to max(16, ceil(sqrt(n))) —
    // the IVF nlist rule. Assignment work is O(n·nCells) and the
    // within-cell GEMM is O(n·cellSize) = O(n²/nCells), so √n
    // minimizes their sum at O(n^1.5); the n/1000 rule the 4M-doc
    // smoke originally used makes assignment O(n²/1000), the one
    // superlinear envelope the round-4 verdict flagged (#3). One
    // count() job prices the corpus; callers that know n pass it
    // explicitly and skip the job.
    lazy val n = emb.count() // one job, only when an auto knob needs it
    // The k-means train sample caps the cell count (more cells than
    // train vectors is meaningless). A FIXED cap would silently end
    // the √n rule at n ≈ maxTrain² (~17M docs at a fixed 4096) and
    // revert within-cell GEMM to the O(n²/maxTrain) envelope the
    // round-4 verdict flagged — so with maxTrain = 0 (auto, the
    // default) the sample GROWS with √n from a 4096 floor (≤ 65 536:
    // a ≤ ~134 MB driver collect at 256-d f64, the bounded-collect
    // budget), which keeps the rule honest out to n ≈ 4.3e9 docs.
    // Past that, route to `embeddingPairsLsh` (O(n) hash assignment)
    // — same guidance as `embeddingPairsExact`'s guard. An EXPLICIT
    // maxTrain > 0 is the caller's hard driver-collect budget (no
    // default-vs-explicit sentinel ambiguity: 0 is auto, anything
    // else is a contract).
    lazy val effTrain =
      if (maxTrain > 0) maxTrain
      else math.max(4096,
        math.min(1 << 16, math.ceil(math.sqrt(n.toDouble)).toInt))
    val cells =
      if (nCells > 0) nCells
      else math.min(effTrain,
        math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
    // assign = 0 (the default) auto-sizes to max(4, ceil(2·ln cells)):
    // a FIXED multi-assignment can't hold recall as cells multiply —
    // cell radius shrinks with cell count, so more boundary pairs need
    // more runner-up cells. Measured on the synthetic corpus at τ=0.3:
    // 16 cells/assign 4 → 0.95, 100 cells/assign 4 → 0.72 (red),
    // 100 cells/assign 8 → 0.91. The log rule keeps the duplication
    // factor LSH-multi-probe-sized (≤ ~16 even at thousands of cells),
    // so candidate volume stays O(n^1.5·log n) under the √n rule.
    val assigns = math.min(cells,
      if (assign > 0) assign
      else math.max(4, math.ceil(2.0 * math.log(cells.toDouble)).toInt))
    // maxCellSize = 0 (the default) auto-sizes to max(4096, 4× the
    // EXPECTED cell size assigns·n/cells): the cap is a skew valve
    // for degenerate cells, and a fixed 4096 starts binding the
    // TYPICAL cell once assigns·n/cells crosses it — measured at the
    // 4M smoke, where √n cells put the expected cell exactly at the
    // cap and star degradation cost a third of the planted pairs.
    // 4× expected keeps the within-cell GEMM at its designed
    // O(n^1.5·assign²) while still degrading only outlier cells.
    val cap =
      if (maxCellSize > 0) maxCellSize
      else math.min(Int.MaxValue.toLong,
        math.max(4096L, 4L * assigns * n / math.max(cells, 1))).toInt
    // explicit nCells under AUTO maxTrain raises the train sample to
    // cover the requested cells (k-means needs ≥ k points) — but an
    // EXPLICIT maxTrain is the caller's driver-collect budget and is
    // never silently exceeded: asking for more cells than the budget
    // can train fails fast instead (round-6 advice).
    val trainSample =
      if (nCells > 0) {
        if (maxTrain > 0) {
          require(cells <= maxTrain,
            s"nCells=$cells needs a train sample of ≥ $cells vectors but the " +
              s"explicit maxTrain=$maxTrain caps the driver collect below it — " +
              "raise maxTrain or lower nCells")
          maxTrain
        } else math.max(4096, math.min(1 << 16, cells))
      } else effTrain
    val cx = Ann.trainCellIndex(emb, idCol, embCol, cells, lloydIters, trainSample)
    // the assignment pass CARRIES the vector (duplicated under an
    // alias — topkFlat consumes/drops `embCol` but keeps every other
    // query column), so cell rows go straight into the grouped
    // kernel's one cell shuffle: no join back onto the corpus, and no
    // per-pair vector attachment anywhere.
    val assigned = Similarity.topkFlat(
        emb.select(col(idCol).as("id"), col(embCol),
          col(embCol).cast("array<double>").as("__v")),
        embCol, cx, assigns, Metric.Cosine)
      .select(col("id"), col("index").as("cell"), col("__v"))
    // kernel threshold carries the 1e-4 pre-round margin; the
    // contract filters on the ROUNDED cosine, like every oracle query
    val raw = Similarity.cellPairsAbove(assigned, "id", "cell", "__v",
      Metric.Cosine, threshold - 1e-4, cap)
    // multi-assignment emits a shared-cell pair once per shared cell;
    // dedup partitioned on id1 only (subset of the keys), so the
    // aggregate needs no second exchange — same argument as
    // cappedBucketPairs
    raw.repartition(col("id1")).dropDuplicates("id1", "id2")
      .withColumn("cosine", round(col("score"), 4) + lit(0.0))
      .filter(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
      .orderBy("id1", "id2")
  }

  /** [[dropDuplicatesByPairs]] with the semantic generator: the
    * one-call "semantically dedupe this corpus" — cluster reps
    * (min id per connected component of the semantic pair graph)
    * survive, everything within `threshold` cosine of a rep's
    * component is dropped.
    */
  def dropSemanticDuplicates(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      nCells: Int = 0, // 0 = auto √n, see [[semanticPairs]]
      assign: Int = 0): DataFrame =
    dropDuplicatesByPairs(emb, idCol,
      semanticPairs(emb, idCol, embCol, threshold, nCells, assign))

  /** SEMANTIC decontamination — the embedding-space analogue of
    * [[decontaminate]]: drop every `train` row whose embedding lies
    * within cosine `threshold` of ANY `eval` embedding (paraphrased
    * benchmark leakage that shares no n-gram — the gap the lexical
    * form can't see; modern release decontamination runs both).
    *
    * Same scale shape as the lexical form: the eval side is a
    * benchmark suite — SMALL by construction — so its packed f64
    * index BROADCASTS and every train partition scores it in one
    * GEMM (top-1 is all the decision needs, [[Similarity.topkFlat]]
    * with k = 1); the train corpus never shuffles embeddings. Only
    * the contaminated id set crosses an exchange, returning as an
    * anti-join that AQE broadcasts when it is small. The contract
    * filters on the ROUNDED cosine like every oracle query.
    */
  def decontaminateSemantic(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double): DataFrame = {
    val cx = Similarity.collectCorpus(
      eval.select(col(idCol), col(embCol).cast("array<double>").as(embCol)),
      idCol, embCol)
    val top1 = Similarity.topkFlat(
      train.select(col(idCol).as("__tid"),
        col(embCol).cast("array<double>").as(embCol)),
      embCol, cx, 1, Metric.Cosine)
    val bad = top1
      .filter(round(col("score"), 4) + lit(0.0) >= threshold)
      .select(col("__tid").as(idCol)) // k = 1 → at most one row per train id
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** Benchmark decontamination: drop every `train` document that
    * shares at least one word n-gram with any `eval` document (the
    * 13-gram test-set-overlap rule of GPT-3 appendix C / Brown et al.
    * 2020, parameterized). Grams are distinct per doc and built from
    * normalized text, so punctuation/case can't hide an overlap.
    *
    * Scale shape: the eval side is SMALL by construction (a benchmark
    * suite, not a corpus), so its distinct gram set BROADCASTS; the
    * train side streams through a broadcast-hash left-semi join in
    * the scan stage — the 100 TB train corpus is never shuffled on
    * gram strings. The contaminated id set is bounded only by |train|
    * (heavy boilerplate shared with eval can contaminate a few
    * percent of a multi-billion-doc corpus), so the anti-join back is
    * deliberately NOT hint-forced: AQE broadcasts it when its runtime
    * size is small and falls back to a shuffled anti-join when it is
    * not, instead of dying on the broadcast size limit. Nothing here
    * is proportional to |train| × |eval|.
    */
  def decontaminate(
      train: DataFrame, evalDf: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val grams = wordGrams(tokens(normalize(col(textCol))), n)
    val evalGrams = evalDf.select(explode(grams).as("g")).distinct()
    val contaminated = train.select(col(idCol), explode(grams).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** EXACT-SUBSTRING dedup — the span-level op from Lee et al. '21
    * ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, the ExactSubstr tool): every L-token span that
    * appears verbatim in ≥ `minDocFreq` DISTINCT documents is removed
    * from ALL of them (document-level dedup misses a quoted paragraph
    * inside otherwise-unique pages; this is the op that catches it).
    * Text is [[graft.functions.TextFunctions.normalize]]d first;
    * a token is dropped when ANY duplicated L-window covers it, so
    * overlapping duplicated windows merge into maximal spans exactly
    * as the suffix-array form does. Output:
    * (id, text_clean, n_tokens, n_dropped).
    *
    * Plan shape (the 100 TB story — the reference paper's suffix
    * array is single-node): pass 1 counts window DOC-frequencies on
    * 64-bit hashes, so the corpus-wide shuffle carries (hash, partial
    * count) only — window STRINGS never leave their scan stage
    * (`wordGrams` is per-doc distinct, so a plain count IS the doc
    * frequency). The duplicated-hash set is tiny (duplication is the
    * exception) and broadcasts back; candidate STRINGS are recovered
    * scan-stage under that broadcast filter and RE-COUNTED on the
    * string itself, so a 64-bit collision can inflate the candidate
    * set but never the final one — output is exact. Pass 2 is a
    * zero-shuffle scan rebuild via the broadcast window set
    * ([[graft.functions.RemoveDupSpans]], codegen'd — the
    * FilterBoilerplateLines shape one level down, at token windows
    * instead of lines). `maxDupWindows` guards the degenerate corpus
    * whose duplicated-window set would not broadcast.
    */
  def removeDuplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int,
      minDocFreq: Int = 2,
      maxDupWindows: Int = 1 << 22): DataFrame = {
    require(l >= 2, s"span length must be >= 2 tokens, got $l")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val norm = normalize(col(textCol))
    val winCol = wordGrams(tokens(norm), l)
    val winHashes = docs.select(explode(winCol).as("win"))
      .select(xxhash64(col("win")).as("h"))
    val dupHashes = winHashes.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minDocFreq).select("h")
    // limit BEFORE collect: the valve must bound driver memory, not
    // just fire after an unbounded collect already materialized a
    // degenerate corpus's window set
    val dupWins = docs.select(explode(winCol).as("win"))
      .join(broadcast(dupHashes), xxhash64(col("win")) === col("h"), "left_semi")
      .groupBy("win").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minDocFreq)
      .select("win")
      .limit(maxDupWindows + 1)
      .collect()
    require(dupWins.length <= maxDupWindows,
      s"${dupWins.length} duplicated $l-token windows exceed maxDupWindows=$maxDupWindows — " +
        "the corpus is dominated by repeated spans; raise minDocFreq or run document-level dedup first")
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(dupWins.length * 2, 16))
    dupWins.foreach(r => set.add(
      org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
    val bc = docs.sparkSession.sparkContext.broadcast(set)
    docs
      .select(col(idCol).as("id"), remove_dup_spans(norm, l, bc).as("__s"))
      .select(col("id"), col("__s.clean").as("text_clean"),
        col("__s.n_tokens").cast("long").as("n_tokens"),
        col("__s.n_dropped").cast("long").as("n_dropped"))
  }

  /** SPAN-LEVEL decontamination — [[decontaminate]]'s surgical form:
    * instead of DROPPING every train document that shares an L-token
    * window with the eval suite, remove just the contaminated SPANS
    * and keep the rest of the document (the GPT-3 appendix-C
    * remediation: "remove the leaked text, keep the page" — dropping
    * whole documents over one quoted benchmark question wastes
    * otherwise-good data at 100 TB). Every train token covered by an
    * L-token window that appears verbatim in ANY eval document is
    * dropped; overlapping eval windows merge into maximal removed
    * spans exactly as in [[removeDuplicatedSpans]]. Output:
    * (id, text_clean, n_tokens, n_dropped).
    *
    * Plan shape: the eval side is a benchmark suite — SMALL by
    * construction — so its distinct window set collects and
    * BROADCASTS (same envelope argument as [[decontaminate]]'s gram
    * set; `maxEvalWindows` guards a mis-sized "eval" input). The
    * train corpus side is then a ZERO-shuffle scan rebuild via the
    * same codegen'd [[graft.functions.RemoveDupSpans]] — no train
    * token ever crosses an exchange, the shape that lets one pass
    * scrub 100 TB while reading it.
    */
  /** Train the broadcast L-token window set of an eval suite — the
    * static half of [[decontaminateSpans]], exposed so a STREAMING
    * scrub ([[graft.streaming.EventStream.scrubSpans]]) can train once
    * and apply per microbatch. OWNERSHIP: the returned Broadcast
    * belongs to the caller (destroy() on retrain — the
    * [[TextAnalysis.trainBoilerplateSet]] contract).
    */
  def spanWindowSet(
      eval: DataFrame,
      textCol: String,
      l: Int,
      maxEvalWindows: Int = 1 << 22): org.apache.spark.broadcast.Broadcast[
      java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]] = {
    require(l >= 2, s"span length must be >= 2 tokens, got $l")
    // limit BEFORE collect — same driver-memory valve as
    // [[removeDuplicatedSpans]]
    val evalWins = eval
      .select(explode(wordGrams(tokens(normalize(col(textCol))), l)).as("win"))
      .distinct()
      .limit(maxEvalWindows + 1)
      .collect()
    require(evalWins.length <= maxEvalWindows,
      s"${evalWins.length} distinct eval $l-token windows exceed maxEvalWindows=$maxEvalWindows — " +
        "the eval side should be a benchmark suite, not a corpus; raise l or swap the inputs")
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(evalWins.length * 2, 16))
    evalWins.foreach(r => set.add(
      org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
    eval.sparkSession.sparkContext.broadcast(set)
  }

  def decontaminateSpans(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      l: Int,
      maxEvalWindows: Int = 1 << 22): DataFrame = {
    val bc = spanWindowSet(eval, textCol, l, maxEvalWindows)
    train
      .select(col(idCol).as("id"), remove_dup_spans(normalize(col(textCol)), l, bc).as("__s"))
      .select(col("id"), col("__s.clean").as("text_clean"),
        col("__s.n_tokens").cast("long").as("n_tokens"),
        col("__s.n_dropped").cast("long").as("n_dropped"))
  }

  // ===== incremental dedup (append-only corpus maintenance) =====
  //
  // At 100 TB nobody re-dedups the whole corpus per ingest batch: the
  // landed corpus is immutable, and each new batch must be deduped (a)
  // within itself and (b) against what already landed — touching the
  // corpus as little as possible. The operators below are the
  // append-only forms of [[exact]] / [[minhashPairs]]: the corpus
  // contributes only a precomputable artifact (a content-hash column /
  // a capped band table) that a pipeline lands ONCE via
  // [[graft.sources.Sink.writeBucketed]], after which every batch
  // joins it with zero corpus-side shuffle.

  /** The landed corpus's content-hash set — the exact-dedup artifact.
    * Pipelines persist this (bucketed on `content_hash`) so
    * [[exactIncremental]] never rereads corpus text.
    */
  def contentHashes(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(md5(col(textCol)).as("content_hash"))

  /** INCREMENTAL exact dedup: the rows of `newDocs` that survive an
    * append against a landed corpus — within-batch exact dups keep the
    * min-id representative (the [[exact]] rule), and representatives
    * whose content hash already landed are dropped. Output: surviving
    * `newDocs` rows + `content_hash`.
    *
    * `corpusHashes` is any frame with a `content_hash` column —
    * [[contentHashes]] of the raw corpus, or (the scale form) the
    * persisted hash table. Plan shape: the batch shuffles once on its
    * content hash; the representative aggregation leaves it
    * partitioned on exactly the anti-join key, so the join adds no
    * batch-side exchange. The corpus side is hash-only rows (never
    * text) and is exchange-free entirely when `corpusHashes` is a
    * table bucketed on `content_hash` (asserted in SinkSpec).
    */
  def exactIncremental(
      newDocs: DataFrame,
      corpusHashes: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    minIdReps(newDocs.withColumn("content_hash", md5(col(textCol))), idCol)
      .join(corpusHashes.select("content_hash"), Seq("content_hash"), "left_anti")

  /** Min-id representative per `content_hash` via a partial-aggregatable
    * `min(struct(id, row))` — NOT a hash-keyed `row_number` window. A
    * mass-duplicated document (the boilerplate/empty-page case exact
    * dedup exists for) is a hot content hash, and a window hands its
    * entire occurrence set to ONE task, unsplittable by AQE; the
    * aggregate combines it map-side to one candidate row per input
    * partition. The whole row rides the aggregation buffer (one row
    * per hash per partition — bounded), ids are unique so later struct
    * fields never decide a comparison, and the result stays
    * hash-partitioned on `content_hash` exactly like the window form.
    * Output columns: `newDocs` order, then `content_hash`.
    */
  private def minIdReps(hashed: DataFrame, idCol: String): DataFrame = {
    val cols = hashed.columns.filterNot(_ == "content_hash")
    val ordered = idCol +: cols.filterNot(_ == idCol)
    hashed.groupBy("content_hash")
      .agg(min(struct(ordered.map(col): _*)).as("__w"))
      .select(cols.map(c => col("__w").getField(c).as(c)) :+ col("content_hash"): _*)
  }

  /** Cross-source duplication matrix: for every pair of sources, how
    * many distinct keys they share — the "who copies whom" diagnostic
    * a curation run uses to decide which source keeps a duplicate.
    * `gramN = 0` keys on the exact content hash (verbatim dups);
    * `gramN > 0` keys on distinct word n-grams (shared PHRASING, the
    * decontamination unit). One shuffle on the key co-locates every
    * source owning it; per-key DISTINCT source sets are bounded by
    * |sources|, and the pair explosion happens after that aggregation
    * — output is ≤ |sources|² counts, never row-scale.
    */
  def sourceOverlap(
      docs: DataFrame, sourceCol: String, textCol: String, gramN: Int = 0): DataFrame = {
    val keyed =
      if (gramN == 0)
        // NULL text -> NULL hash must contribute NO key: grouping
        // NULLs together would report sources sharing "content" that
        // is just mutual absence of it
        docs.select(col(sourceCol).as("source"), md5(col(textCol)).as("h"))
          .filter(col("h").isNotNull)
      else
        // grams are hashed to 8-byte longs IN THE SCAN STAGE (xxhash64,
        // the MinHash-machinery convention): the row-scale shuffle and
        // the per-key aggregation buffers carry fixed-width keys instead
        // of ~40-byte gram strings. Collisions merge two grams into one
        // key at ~n²/2^65 probability — immaterial next to the sampling
        // noise of the diagnostic this feeds.
        docs.select(col(sourceCol).as("source"),
          explode(graft.functions.TextFunctions.wordGrams(
            graft.functions.TextFunctions.tokens(
              graft.functions.TextFunctions.normalize(col(textCol))), gramN)).as("g"))
          .select(col("source"), xxhash64(col("g")).as("h"))
    // NO pre-distinct: collect_set already dedups sources within each
    // key, so a distinct() here would be a second ROW-SCALE shuffle
    // doing work the aggregation does anyway (and unlike distinct on
    // (source, h), the h-keyed aggregate combines map-side to one
    // buffer row per key per partition)
    keyed
      .groupBy("h").agg(collect_set(col("source")).as("sources"))
      .select(explode(col("sources")).as("s1"), col("sources"))
      .select(col("s1"), explode(col("sources")).as("s2"))
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("shared_keys"))
      .orderBy("s1", "s2")
  }

  /** Bloom-filter sketch of the landed corpus's content hashes — the
    * third landed artifact (next to [[contentHashes]] and
    * [[minhashBandTable]]), built ONCE when a corpus version lands and
    * reused by every subsequent [[exactIncrementalBloom]] batch. At
    * 1e9 hashes / 1 % fpp the filter is ~1.2 GB — broadcastable where
    * the exact hash SET is a multi-TB table that every batch would
    * otherwise join against in full.
    *
    * `expectedItems = 0` sizes the filter from a corpus count (one
    * extra job — pass the landed row count in a real pipeline).
    */
  def contentBloom(
      corpusHashes: DataFrame,
      expectedItems: Long = 0L,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val n = if (expectedItems > 0) expectedItems else math.max(corpusHashes.count(), 1L)
    corpusHashes.stat.bloomFilter("content_hash", n, fpp)
  }

  /** [[exactIncremental]] with a BROADCAST BLOOM PRE-FILTER — identical
    * output (the bloom has no false negatives, and its false positives
    * are re-checked by the exact anti-join), but the batch splits in
    * the scan stage: rows whose hash the filter rejects are DEFINITELY
    * new and bypass the corpus join entirely; only bloom-positive rows
    * (true dups + ~fpp of the batch) reach it. For a typical append
    * where most content is new, the join's probe side shrinks from
    * |batch| to |dups| + fpp·|batch| — and with the corpus hash table
    * bucketed, nothing about the corpus side changes (zero exchange,
    * as [[exactIncremental]]).
    */
  def exactIncrementalBloom(
      newDocs: DataFrame,
      corpusHashes: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      idCol: String,
      textCol: String): DataFrame = {
    val bc = newDocs.sparkSession.sparkContext.broadcast(bloom)
    // NULL text -> NULL hash -> NULL bloom result: coalesce(false)
    // routes those rows to the definitely-new branch, which is where
    // the exact path lands them too (an anti join on a NULL key never
    // matches) — without it BOTH filters drop the row and the bloom
    // path silently loses null-text documents
    val reps = minIdReps(
        newDocs.withColumn("content_hash", md5(col(textCol))), idCol)
      .withColumn("__maybe", coalesce(
        graft.functions.SketchFunctions.bloom_might_contain(col("content_hash"), bc),
        lit(false)))
    val definitelyNew = reps.filter(!col("__maybe")).drop("__maybe")
    val verified = reps.filter(col("__maybe")).drop("__maybe")
      .join(corpusHashes.select("content_hash"), Seq("content_hash"), "left_anti")
    definitelyNew.unionByName(verified)
  }

  /** The landed corpus's capped MinHash band table — the near-dup
    * artifact mirroring [[contentHashes]]: (band, bh, id) rows, one
    * per (document, band). Buckets larger than `maxBucketSize`
    * degrade to their min-id member (the star-anchor rule of
    * [[minhashPairs]]'s skew valve, cap 1): degenerate boilerplate
    * buckets keep one representative to verify new docs against,
    * instead of fanning every batch out against the whole bucket.
    * Computing the cap costs one (band, bh) shuffle of id-only rows —
    * paid once when the table is landed (bucketed on (band, bh)),
    * amortized over every subsequent batch.
    */
  def minhashBandTable(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleN: Int = 5,
      numPerms: Int = 128,
      bands: Int = 0,
      maxBucketSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    // the table BAKES IN the banding geometry: probe it with the same
    // (numPerms, threshold) — or the same explicit bands — as built,
    // else the (band, bh) join keys silently never match
    val b = if (bands > 0) bands else lshBands(numPerms, threshold)
    require(numPerms % b == 0, "bands must divide numPerms")
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
    val ps = perms(numPerms, seed)
    val banded = corpus.select(col(idCol).as("id"),
      posexplode(minhash_band_hashes(
        charShingles(normalize(col(textCol)), shingleN),
        ps.map(_._1), ps.map(_._2), b)).as(Seq("band", "bh")))
    // groupBy-min stats, not a bucket-keyed window: the over-cap
    // bucket being reduced to its anchor is exactly the hot key a
    // window would serialize into one task (see cappedBucketPairs)
    val stats = banded.groupBy("band", "bh")
      .agg(count(lit(1)).as("bsize"), min("id").as("bmin"))
    banded.join(stats, Seq("band", "bh"))
      .filter(col("bsize") <= maxBucketSize || col("id") === col("bmin"))
      .select("band", "bh", "id")
  }

  /** MinHash near-dup pairs BETWEEN a new batch and a landed corpus:
    * (new_id, corpus_id, jaccard ≥ threshold), every pair verified
    * with exact Jaccard — the cross-sided [[minhashPairs]].
    *
    * `corpusBands` is [[minhashBandTable]] output (recomputed here by
    * the convenience overload, read from the landed table in a real
    * pipeline). Plan shape: the batch's band rows are hint-BROADCAST
    * (a batch is small relative to the corpus by definition), so the
    * band join is a scan-stage hash join — the corpus band table
    * streams through it with no exchange. Candidates cross one
    * id-only shuffle for dedup, and the verify stage attaches shingle
    * sets per side, each semi-joined to the candidate universe first
    * (candidate-proportional, the [[verifyJaccard]] argument).
    */
  def minhashNewVsBandsPairs(
      newDocs: DataFrame,
      corpusBands: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleN: Int = 5,
      numPerms: Int = 128,
      bands: Int = 0,
      seed: Long = 42L): DataFrame = {
    // bands must match the geometry `corpusBands` was BUILT with — the
    // auto default stays consistent because both sides derive it from
    // the same (numPerms, threshold)
    val b = if (bands > 0) bands else lshBands(numPerms, threshold)
    require(numPerms % b == 0, "bands must divide numPerms")
    val ps = perms(numPerms, seed)
    val newBands = newDocs.select(col(idCol).as("new_id"),
      posexplode(minhash_band_hashes(
        charShingles(normalize(col(textCol)), shingleN),
        ps.map(_._1), ps.map(_._2), b)).as(Seq("band", "bh")))
    val cand = corpusBands.select(col("band"), col("bh"), col("id").as("corpus_id"))
      .join(broadcast(newBands), Seq("band", "bh"))
      // a batch doc that also landed in the corpus matches itself on
      // every band; incremental semantics compare distinct documents
      .filter(col("new_id") =!= col("corpus_id"))
      .repartition(col("new_id")).dropDuplicates("new_id", "corpus_id")
    verifyJaccardCross(newDocs, corpus, idCol, textCol, cand, shingleN, threshold)
  }

  /** [[minhashNewVsBandsPairs]] with the band table computed in-line —
    * the self-contained form for one-off batches (pays the corpus
    * band shuffle every call; land the table for recurring ingest).
    */
  def minhashNewVsCorpusPairs(
      newDocs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleN: Int = 5,
      numPerms: Int = 128,
      bands: Int = 0,
      maxBucketSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    val b = if (bands > 0) bands else lshBands(numPerms, threshold)
    minhashNewVsBandsPairs(newDocs,
      minhashBandTable(corpus, idCol, textCol, threshold, shingleN, numPerms, b,
        maxBucketSize, seed),
      corpus, idCol, textCol, threshold, shingleN, numPerms, b, seed)
  }

  /** One-call incremental append: within-batch near-dup reps
    * ([[minhashPairs]] + [[dropDuplicatesByPairs]], which subsumes
    * exact dups at J = 1), minus batch docs with a verified near-dup
    * already in the corpus. Returns the `newDocs` rows safe to append.
    */
  def minhashIncremental(
      newDocs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleN: Int = 5): DataFrame = {
    val batchReps = dropDuplicatesByPairs(newDocs, idCol,
      minhashPairs(newDocs, idCol, textCol, threshold, shingleN))
    val matched = minhashNewVsCorpusPairs(newDocs, corpus, idCol, textCol,
        threshold, shingleN)
      .select(col("new_id").as(idCol)).distinct()
    batchReps.join(matched, Seq(idCol), "left_anti")
  }

  /** Cross-sided verify stage: exact Jaccard over (new_id, corpus_id)
    * candidates, shingle sets attached from each side's own frame
    * (the single-frame [[verifyJaccard]] unions the id universe and
    * scans once; here the sides are different datasets). Both
    * attachments are semi-joined to the candidate ids first, so work
    * stays candidate-proportional. Output: (new_id, corpus_id,
    * jaccard ≥ threshold).
    */
  private def verifyJaccardCross(
      newDocs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int,
      threshold: Double): DataFrame = {
    val cand = candidates.localCheckpoint(eager = false)
    def sets(docs: DataFrame, idsName: String): DataFrame =
      docs.select(col(idCol).as(idsName), col(textCol).as("__text"))
        .join(cand.select(idsName).distinct(), Seq(idsName), "leftsemi")
        .select(col(idsName),
          array_sort(charShingles(normalize(col("__text")), shingleN)).as("sset"))
    cand
      .join(sets(newDocs, "new_id").withColumnRenamed("sset", "s1"), Seq("new_id"))
      .join(sets(corpus, "corpus_id").withColumnRenamed("sset", "s2"), Seq("corpus_id"))
      .withColumn("c", sorted_intersect_count(col("s1"), col("s2")))
      .withColumn("jaccard",
        round(col("c") / (size(col("s1")) + size(col("s2")) - col("c")), 4) + lit(0.0))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "corpus_id", "jaccard")
      .orderBy("new_id", "corpus_id")
  }
}
