package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbour over embedding columns.
  *
  * Brute force = Similarity.topk (broadcast + GEMM): the exact
  * baseline. This file adds the scale path: random-hyperplane LSH —
  * sign-bit signatures per table bucket queries and corpus together,
  * so candidate generation is a plain equi-join on (table, bucket)
  * with no all-pairs stage; exact cosine re-ranks candidates only.
  * Recall grows with `tables` and (cheaply) with `probes` — queries
  * additionally probe the buckets reached by flipping their
  * lowest-margin sign bits (multi-probe LSH, Lv et al. VLDB'07).
  * Defaults (16 tables × 8 bits × 8 probes) target ≥0.8 recall@10 on
  * the synthetic gaussian corpus — LSH's worst case (no cluster
  * structure); round-1 single-probe at 16×6 gave 0.56.
  */
object Ann {

  /** Deterministic gaussian hyperplanes: tables × bits × dim. */
  private def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** LSH cosine top-k: per query, the k most-cosine-similar corpus
    * rows among LSH candidates. Output: (qid, rank, index, score) —
    * same shape as Similarity.topkFlat for recall comparison.
    *
    * Plan shape (the part that matters at 100 TB): the bucket
    * equi-join and the candidate-pair distinct carry ONLY ids — the
    * embedding vectors never ride through the high-fan-out stages.
    * Embeddings are attached once per unique pair afterwards: the
    * corpus side by broadcast (it is the small "index" side), the
    * query side by a hash join on the query id whose partitioning the
    * ranking window then reuses. Shuffle volume is O(unique pairs) ×
    * 16 bytes instead of × 2·dim·8 bytes.
    */
  /** `dim`: embedding dimensionality. Pass it when known (a `head()`
    * probe on a 100 TB query table triggers a scan stage); ≤ 0 falls
    * back to probing the first query row.
    *
    * `maxBucketSize` caps the CORPUS side of every (table, bucket): a
    * degenerate bucket (e.g. a mass of zero/identical vectors) would
    * otherwise fan out |bucket| candidates per query landing in it.
    * Oversized buckets keep a deterministic salted-hash sample with
    * EXPECTED size `maxBucketSize` (each member survives iff
    * hash(index, table, bucket) mod bsize < cap — exact identity for
    * at-cap buckets, an unbiased ≈cap slice past it). This is a
    * filter on groupBy-computed sizes, NOT a bucket-keyed ranking
    * window: the degenerate bucket the cap defuses is exactly the hot
    * key a window would sort in ONE AQE-unsplittable task, while the
    * size aggregate combines it map-side and the stats join is
    * skew-splittable (the dedupParagraphs argument, applied to the
    * ANN index).
    */
  def lshCosineTopK(
      queries: DataFrame,
      qIdCol: String,
      corpus: DataFrame,
      cIdCol: String,
      embCol: String,
      k: Int,
      tables: Int = 16,
      bits: Int = 8,
      probes: Int = 8,
      dim: Int = 0,
      maxBucketSize: Int = 4096,
      seed: Long = 42L): DataFrame = {
    val d = if (dim > 0) dim else queries.select(size(col(embCol))).head.getInt(0)
    val planes = hyperplanes(tables, bits, d, seed)
    // (id, table, bucket) signature rows — ids only past this point.
    // Queries probe `probes` buckets per table (pos → table = pos/probes);
    // the corpus contributes exactly its own bucket per table.
    def signatures(df: DataFrame, idOut: String, nProbes: Int) =
      df.select(col(idOut),
          posexplode(lsh_probe_buckets(col(embCol), planes.flatten.flatten,
            tables, bits, nProbes)).as(Seq("pos", "bucket")))
        .select(col(idOut), (col("pos") / nProbes).cast("int").as("table"), col("bucket"))
    val qb = signatures(queries.select(col(qIdCol), col(embCol)), qIdCol, probes)
    val cbAll = signatures(
      corpus.select(col(cIdCol).as("index"), col(embCol)), "index", 1)
    val bsizes = cbAll.groupBy("table", "bucket").agg(count(lit(1)).as("bsize"))
    val cb = cbAll.join(bsizes, Seq("table", "bucket"))
      .filter(pmod(xxhash64(col("index"), col("table"), col("bucket")),
        col("bsize")) < lit(maxBucketSize.toLong))
      .drop("bsize")
    val pairs = dedupPairs(qb.join(cb, Seq("table", "bucket"))
      .select(col(qIdCol), col("index")), qIdCol)
    rerank(pairs, queries, qIdCol, corpus, cIdCol, embCol, k)
  }

  /** Candidate-pair dedup partitioned on the QUERY id only: a plain
    * `.distinct()` hash-partitions on (qid, index), and the rerank's
    * qid join then re-shuffles the whole candidate set a second time.
    * Partitioning on qid alone already co-locates every copy of a
    * (qid, index) pair — HashPartitioning on a subset of the
    * aggregation keys satisfies its ClusteredDistribution — so the
    * dedup aggregate runs without its own exchange and the SAME
    * partitioning carries through the rerank join and ranking window:
    * the candidate set crosses exactly one shuffle end to end.
    */
  private def dedupPairs(pairs: DataFrame, qIdCol: String): DataFrame =
    pairs.repartition(col(qIdCol)).dropDuplicates(qIdCol, "index")

  /** Exact-cosine rerank of id-only candidate pairs — the shared tail
    * of both ANN paths: corpus embeddings attach by broadcast (the
    * small index side), query embeddings by a qid hash join whose
    * partitioning the ranking window then reuses. Shuffle volume stays
    * O(unique pairs) × 16 bytes; vectors never ride the high-fan-out
    * candidate stages.
    *
    * DESIGN ENVELOPE: the corpus-side broadcast bounds this rerank to
    * corpora whose (id, vector) table fits a broadcast (~1-2 GB —
    * the same envelope as [[Similarity.topk]]'s index). Beyond that,
    * the right shape is not a bigger join but scoring INSIDE the
    * bucket/cell join, where both vectors are already co-located
    * before any candidate fan-out: volume O(n·tables·dim) on the
    * bucket shuffle instead of a corpus broadcast — at the cost of
    * vectors riding that one shuffle. The current split (id-only
    * candidates + broadcast rerank) is the better trade below the
    * broadcast limit because NO vector crosses any exchange.
    */
  private def rerank(
      pairs: DataFrame,
      queries: DataFrame,
      qIdCol: String,
      corpus: DataFrame,
      cIdCol: String,
      embCol: String,
      k: Int): DataFrame = {
    val e = col(embCol).cast("array<double>")
    val ce = corpus.select(col(cIdCol).as("index"), e.as("ce"))
    val qe = queries.select(col(qIdCol), e.as("qe"))
    // join ORDER is the load-bearing choice: the qid join runs FIRST,
    // while the candidate rows are still (qid, index) — 16 B each —
    // so the only full-size exchange in the stage moves ids. The
    // corpus vector then attaches map-side (broadcast) on the already
    // co-partitioned rows, the cosine is computed, and both vectors
    // are dropped in the same projection — neither embedding ever
    // rides a shuffle, and the ranking window reuses the qid
    // partitioning. (Round 2 attached `ce` before the qid exchange:
    // ~dim·8 B × |candidates| ≈ 3 GB shuffled at sf0.1 — ann_ivf's
    // 4.3 s was that exchange.)
    val cand = pairs
      .join(qe, Seq(qIdCol))
      .join(broadcast(ce), Seq("index"))
      .select(col(qIdCol), col("index"),
        array_cosine(col("qe"), col("ce")).as("score"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("score").desc, col("index").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col("index"),
        (round(col("score"), 4) + lit(0.0)).as("score"))
      .orderBy(qIdCol, "rank")
  }

  /** Spherical k-means centroid index — the trainable half of IVF,
    * shared with [[Dedup.semanticPairs]]. Trains on a bounded,
    * deterministic corpus sample taken in xxhash64(id) order (NOT id
    * order: ids typically correlate with ingest time/content, so a
    * first-N sample trains biased centroids; hash order is equally
    * deterministic and unbiased — round-2 verdict #6).
    * TakeOrderedAndProject keeps the sample a single bounded pass, no
    * full sort. The returned [[CorpusIndex]] assigns vectors to cells
    * through the same broadcast+GEMM kernel used for search.
    */
  private[operators] def trainCellIndex(
      corpus: DataFrame,
      cIdCol: String,
      embCol: String,
      nCells: Int,
      lloydIters: Int,
      maxTrain: Int): CorpusIndex = {
    val sample = corpus.select(col(cIdCol), col(embCol).cast("array<double>"))
      .orderBy(xxhash64(col(cIdCol)), col(cIdCol)).limit(maxTrain)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "Empty corpus")
    val dim = sample.head.length
    def normalized(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n <= 1e-10) v else v.map(_ / n)
    }
    val unit = sample.map(normalized)
    var centroids = unit.take(math.min(nCells, unit.length)).map(_.clone())
    for (_ <- 1 to lloydIters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      unit.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < centroids.length) {
          var dot = 0.0; var d = 0
          while (d < dim) { dot += v(d) * centroids(c)(d); d += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) else normalized(sums(c))
      }.toArray
    }
    val n = centroids.length
    val data = new Array[Double](n * dim)
    val norms = new Array[Double](n)
    val sqNorms = new Array[Double](n)
    centroids.zipWithIndex.foreach { case (cvec, i) =>
      System.arraycopy(cvec, 0, data, i * dim, dim)
      val sq = cvec.map(x => x * x).sum
      sqNorms(i) = sq; norms(i) = math.sqrt(sq)
    }
    CorpusIndex(Array.tabulate(n)(_.toLong), data, null, n, dim, norms, sqNorms)
  }

  /** IVF (inverted-file) cosine top-k — the second ANN scale path.
    *
    * Train: spherical k-means on a driver-side corpus sample (bounded
    * at `maxTrain` rows — standard IVF practice; the sample is taken
    * in xxhash64(id) order, so training is deterministic AND unbiased
    * when ids correlate with content). Assign: both
    * corpus and queries are scored against the centroid index with the
    * SAME broadcast+GEMM kernel used for search ([[Similarity.topk]]),
    * so assignment is fully distributed — corpus rows land in their
    * top-1 cell, queries probe their `nProbe` nearest cells. Search:
    * candidates come from a (cell)-equi-join carrying ids only;
    * embeddings are attached once per unique pair (corpus by
    * broadcast, queries by a qid hash join the ranking window
    * reuses), then exact cosine reranks.
    *
    * Output: (qid, rank, index, score) — same shape as
    * [[lshCosineTopK]] / Similarity.topkFlat.
    */
  def ivfCosineTopK(
      queries: DataFrame,
      qIdCol: String,
      corpus: DataFrame,
      cIdCol: String,
      embCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 5,
      maxTrain: Int = 4096): DataFrame = {
    // --- train (driver, bounded sample, deterministic) ---------------
    val centroidCx = trainCellIndex(corpus, cIdCol, embCol, nCells, lloydIters, maxTrain)
    // --- assign with the GEMM kernel (distributed) -------------------
    def cells(df: DataFrame, idOut: String, probes: Int) =
      Similarity.topkFlat(df, embCol, centroidCx, probes, Metric.Cosine)
        .select(col(idOut), col("index").as("cell"))
    // corpus id aliased away from "index", which topkFlat uses for the match
    val cb = cells(corpus.select(col(cIdCol).as("__cid"), col(embCol)), "__cid", 1)
      .select(col("__cid").as("index"), col("cell"))
    val qb = cells(queries.select(col(qIdCol), col(embCol)), qIdCol, nProbe)
    // --- search: id-only candidate join, broadcast rerank ------------
    val pairs = dedupPairs(
      qb.join(cb, Seq("cell")).select(col(qIdCol), col("index")), qIdCol)
    rerank(pairs, queries, qIdCol, corpus, cIdCol, embCol, k)
  }

  /** IVF + SQ8-rerank ANN — [[ivfCosineTopK]] with the candidate
    * rerank scored against the BROADCAST SQ8 INDEX instead of a
    * broadcast f64 (id, vector) table. This closes the design-envelope
    * gap [[rerank]]'s scaladoc documents: the f64 rerank is bounded by
    * a ~1-2 GB broadcast of full vectors, while the SQ8 envelope holds
    * 8× the corpus per broadcast gigabyte — same cells, same id-only
    * candidate shuffle, rerank decode-and-dot is one codegen'd
    * expression ([[Similarity.Sq8CosineAt]]) per candidate, O(dim)
    * each, no LUT, no UDF. Scores are the quantized cosine (the SQ8
    * grid error the `ann_sq8_recall` gate bounds), rounded like every
    * ANN output.
    */
  def ivfSq8CosineTopK(
      queries: DataFrame,
      qIdCol: String,
      corpus: DataFrame,
      cIdCol: String,
      embCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 5,
      maxTrain: Int = 4096): DataFrame = {
    val centroidCx = trainCellIndex(corpus, cIdCol, embCol, nCells, lloydIters, maxTrain)
    def cells(df: DataFrame, idOut: String, probes: Int) =
      Similarity.topkFlat(df, embCol, centroidCx, probes, Metric.Cosine)
        .select(col(idOut), col("index").as("cell"))
    val cb = cells(corpus.select(col(cIdCol).as("__cid"), col(embCol)), "__cid", 1)
      .select(col("__cid").as("index"), col("cell"))
    val qb = cells(queries.select(col(qIdCol), col(embCol)), qIdCol, nProbe)
    val pairs = dedupPairs(
      qb.join(cb, Seq("cell")).select(col(qIdCol), col("index")), qIdCol)
    // SQ8 envelope of the corpus (one collect + pack, broadcast once)
    val sq8 = Similarity.collectCorpusSq8(
      corpus.select(col(cIdCol), col(embCol).cast("array<double>").as(embCol)),
      cIdCol, embCol)
    val bc = queries.sparkSession.sparkContext.broadcast(sq8)
    val qe = queries.select(col(qIdCol),
      col(embCol).cast("array<double>").as("qe"))
    // qid join first (candidates are 16 B rows), then the scan-stage
    // decode-and-dot — no vector and no f64 corpus table crosses any
    // exchange (the rerank join-order rule, kept)
    import org.apache.spark.sql.graft.ColumnBridge.{column => C, expression => E}
    val cand = pairs
      .join(qe, Seq(qIdCol))
      .select(col(qIdCol), col("index"),
        C(Similarity.Sq8CosineAt(E(col("index")), E(col("qe")), bc)).as("score"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("score").desc, col("index").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col("index"),
        (round(col("score"), 4) + lit(0.0)).as("score"))
      .orderBy(qIdCol, "rank")
  }

  /** Public k-means over an embedding column — unsupervised topic/
    * style bucketing of a corpus (the IVF trainer, exposed): spherical
    * Lloyd on a bounded hash-ordered sample (deterministic AND
    * unbiased), centroids returned as a [[CorpusIndex]] so assignment
    * and any later search share one artifact.
    */
  def trainKMeans(corpus: DataFrame, idCol: String, embCol: String,
      k: Int, lloydIters: Int = 5, maxTrain: Int = 4096): CorpusIndex =
    trainCellIndex(corpus, idCol, embCol, k, lloydIters, maxTrain)

  /** Assign every vector to its nearest (cosine) trained centroid —
    * fully distributed through the broadcast GEMM kernel at k=1.
    * Output: (idCol, cluster, sim). `emb_kmeans_gate` proves the
    * kernel's choice optimal against an independent
    * Catalyst-expression argmax over the same centroid table.
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, embCol: String,
      centroids: CorpusIndex): DataFrame =
    Similarity.topkFlat(corpus.select(col(idCol), col(embCol)),
        embCol, centroids, 1, Metric.Cosine)
      .select(col(idCol), col("index").as("cluster"),
        (round(col("score"), 4) + lit(0.0)).as("sim"))
      .orderBy(idCol)

  /** Trained PCA basis for an embedding column: top-`k` principal
    * directions of the (mean-centered) corpus — the standard
    * dimension-reduction step BEFORE quantized indexing (FAISS's
    * `PCAMatrix` pretransform): project 256-d embeddings to 64-d,
    * index the projection, pay 4× less in codes, centroids, and ADC
    * work for a measured recall cost (`emb_pca_gate` pins it).
    *
    * `basis` is row-major k×dim, rows orthonormal, ordered by
    * eigenvalue descending (ties by first-index order; each row's
    * sign is fixed by its largest-|·| entry). The Jacobi solver is
    * deterministic, so the model is reproducible for a given
    * partitioning; across REpartitionings the moments reduce in a
    * different floating-point order, so components agree only to
    * accumulation error (~1e-12 on unit-scale data) — train once and
    * persist if bit-stability across layouts matters.
    * `varianceCaptured` = Σ top-k λ / Σ λ.
    */
  final case class PcaModel(
      dim: Int,
      k: Int,
      n: Long,
      mean: Array[Double],
      basis: Array[Double],
      eigenvalues: Array[Double],
      totalVariance: Double,
      varianceCaptured: Double) extends Serializable {
    /** The nested smaller model — PCA's defining property: the top-k₂
      * rows of a k-component basis ARE the k₂-component model, so
      * train once at the largest k you might serve and truncate per
      * consumer (the train-once convention, without retraining).
      * Truncation is an EXACT slice of this model; a direct smaller
      * train agrees only to the train pass's floating-point reduction
      * order (~1e-14, see [[pcaTrain]]).
      */
    def truncate(k2: Int): PcaModel = {
      require(k2 >= 1 && k2 <= k, s"truncate($k2) outside [1, $k]")
      copy(k = k2,
        basis = java.util.Arrays.copyOf(basis, k2 * dim),
        eigenvalues = java.util.Arrays.copyOf(eigenvalues, k2),
        varianceCaptured =
          if (totalVariance <= 0.0) 1.0
          else eigenvalues.take(k2).map(math.max(_, 0.0)).sum / totalVariance)
    }
  }

  /** Train PCA in ONE distributed pass: every partition folds its
    * rows into (count, Σx, upper-triangular Σxxᵀ) — d(d+3)/2 + 1
    * doubles of state, combined associatively (treeAggregate), so
    * nothing row-shaped ever reaches the driver; the covariance
    * eigenproblem is solved driver-side by a cyclic Jacobi sweep
    * (d×d, deterministic — no library dependency). `dim` is guarded
    * at 1024 so the per-partition grammian buffer stays ≤ ~4 MB;
    * reduce wider embeddings in two hops or shard the columns first.
    */
  def pcaTrain(corpus: DataFrame, embCol: String, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vecs = corpus.select(col(embCol).cast("array<double>").as("v")).na.drop()
    val head = vecs.limit(1).collect()
    require(head.nonEmpty, "Empty corpus")
    val dim = head.head.getSeq[Double](0).length
    require(k <= dim, s"k=$k exceeds embedding dim $dim")
    require(dim <= 1024,
      s"pcaTrain's per-partition grammian is O(dim²): dim=$dim exceeds the " +
        "1024 contract — project in two hops (block the columns) instead")
    val tri = dim * (dim + 1) / 2
    // state: [0] = count, [1..dim] = Σx, [dim+1 ..] = packed upper Σxxᵀ
    val zero = new Array[Double](1 + dim + tri)
    val agg = org.apache.spark.sql.graft.InternalRowBridge.toInternalRdd(vecs)
      .treeAggregate(zero)(
        seqOp = (s, row) => {
          val a = row.getArray(0)
          if (a.numElements() != dim) throw new IllegalArgumentException(
            s"pcaTrain: ragged embedding — expected $dim elements, got ${a.numElements()}")
          val v = a.toDoubleArray()
          s(0) += 1.0
          var i = 0
          var t = 1 + dim
          while (i < dim) {
            s(1 + i) += v(i)
            var j = i
            while (j < dim) { s(t) += v(i) * v(j); j += 1; t += 1 }
            i += 1
          }
          s
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
    val n = agg(0).toLong
    require(n >= 2, s"pcaTrain needs at least 2 rows, got $n")
    val mean = Array.tabulate(dim)(i => agg(1 + i) / n)
    // covariance from the raw moments: C = Σxxᵀ/n − μμᵀ (population
    // normalization — the eigenvectors are scale-invariant either way)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 1 + dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = agg(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigSym(cov)
    // order by eigenvalue desc, stable
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i))
    val totalVar = eigVals.map(math.max(_, 0.0)).sum
    val topVar = order.take(k).map(i => math.max(eigVals(i), 0.0)).sum
    val basis = new Array[Double](k * dim)
    var r = 0
    while (r < k) {
      val src = order(r)
      var d = 0
      // deterministic sign: make each component's largest-|.| entry
      // positive, so the basis doesn't flip between runs/partitionings
      var mx = 0; var mv = 0.0
      while (d < dim) {
        val x = math.abs(eigVecs(d)(src)); if (x > mv) { mv = x; mx = d }; d += 1
      }
      val sgn = if (eigVecs(mx)(src) < 0) -1.0 else 1.0
      d = 0
      while (d < dim) { basis(r * dim + d) = sgn * eigVecs(d)(src); d += 1 }
      r += 1
    }
    PcaModel(dim, k, n, mean,
      basis, order.take(k).map(eigVals(_)).toArray, totalVar,
      if (totalVar <= 0.0) 1.0 else topVar / totalVar)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — returns
    * (eigenvalues, eigenvector MATRIX with vectors in COLUMNS).
    * Deterministic (fixed sweep order, fixed tolerance), O(d³) per
    * sweep; the 1024-dim contract keeps it a driver-side blink.
    * Convergence is RELATIVE — off-diagonal energy against the
    * matrix's own squared Frobenius norm — so covariances with
    * entries far above unit scale converge in the usual ≤ ~10 sweeps
    * instead of grinding all 64 against an absolute floor their
    * rounding noise can never reach.
    */
  private[graft] def jacobiEigSym(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var frob2 = 0.0
    var fi = 0
    while (fi < d) {
      var fj = 0
      while (fj < d) { frob2 += m(fi)(fj) * m(fi)(fj); fj += 1 }
      fi += 1
    }
    val tol = math.max(1e-22, 1e-24 * frob2)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t0 = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t0 * t0 + 1.0)
            val s = t0 * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d - 1) {
        var j = i + 1
        while (j < d) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Random (Johnson–Lindenstrauss) projection to k dims: out = R·x
    * with R a seeded gaussian matrix scaled 1/√k — the
    * dimension-reduction for corpora PCA can't help (isotropic or
    * flat-spectrum embeddings, where no k-dim subspace holds the
    * variance): JL preserves ALL pairwise euclidean distances within
    * (1±ε) w.h.p. regardless of spectrum, ε ~ √(8·ln n / k). No
    * training pass at all — the matrix is a pure function of
    * (dim, k, seed), so two sites project identically without
    * shipping a model. Distortion is driver-gated (`emb_rp_gate`
    * pins the p95 squared-distance ratio on sampled pairs).
    */
  def randomProject(
      df: DataFrame, embCol: String, k: Int, seed: Long = 42L,
      outCol: String = "rp"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dim = embDim(df, embCol)
    require(k <= dim, s"k=$k exceeds embedding dim $dim")
    val rnd = new scala.util.Random(seed)
    val scale = 1.0 / math.sqrt(k.toDouble)
    // row-major k×dim like PcaModel.basis — JL needs no centering
    val r = Array.fill(k * dim)(rnd.nextGaussian() * scale)
    projectMatrix(df, embCol, dim, k, new Array[Double](dim), r, outCol)
  }

  /** FULL-DIMENSION rerank of a reduced-dim shortlist — the
    * recall-recovery rung of the compressed pipeline (project →
    * index at k dims → propose → rerank at full dim). The reduced
    * index only PROPOSES candidates; the final order is the full-dim
    * SQ8 cosine of the ORIGINAL query embedding against the SQ8
    * envelope of the ORIGINAL corpus (8 bits/dim — 8× more corpus
    * per broadcast GB than f64), one codegen'd decode-and-dot
    * ([[Similarity.Sq8CosineAt]]) per candidate. Cost:
    * O(shortlist · full_dim) per query on top of the compressed
    * search — at the 10M/256→64 recipe this buys back most of the
    * JL recall gap for a serve-time fraction.
    *
    * `shortlist` is ANY (qIdCol, index) proposal source — the flat,
    * sharded, filtered, or wave form of the reduced-dim search
    * composes unchanged. Output: (qIdCol, rank, index, score), the
    * [[Similarity.topkFlat]] shape, scores the quantized cosine.
    */
  def rerankFullDim(
      shortlist: DataFrame,
      queries: DataFrame,
      qIdCol: String,
      embCol: String,
      full: Similarity.CorpusIndexSq8,
      k: Int): DataFrame =
    rerankFullDim(shortlist, queries, qIdCol, embCol, Seq(full), k)

  /** [[rerankFullDim]] against SHARDED SQ8 envelopes
    * ([[Similarity.buildSq8Sharded]]) — the form for corpora past one
    * broadcast: each candidate scores against the shard that holds
    * its id (shards are id-disjoint by the hash-mod build contract,
    * so a coalesce over the per-shard decode-and-dots picks exactly
    * the holder's score; ids in no shard drop out).
    */
  def rerankFullDim(
      shortlist: DataFrame,
      queries: DataFrame,
      qIdCol: String,
      embCol: String,
      fulls: Seq[Similarity.CorpusIndexSq8],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(fulls.nonEmpty, "Empty SQ8 envelope list")
    val spark = queries.sparkSession
    val bcs = fulls.map(f => spark.sparkContext.broadcast(f))
    val qe = queries.select(col(qIdCol),
      col(embCol).cast("array<double>").as("__qe"))
    import org.apache.spark.sql.graft.ColumnBridge.{column => C, expression => E}
    // candidates are id pairs (16 B rows): join the query vector on
    // qid first, then the scan-stage decode-and-dot — no corpus
    // vector crosses any exchange (the rerank join-order rule)
    val scoreCol = coalesce(bcs.map(bc =>
      C(Similarity.Sq8CosineAt(E(col("index")), E(col("__qe")), bc))): _*)
    val cand = shortlist.select(col(qIdCol), col("index"))
      .join(qe, Seq(qIdCol))
      .select(col(qIdCol), col("index"), scoreCol.as("score"))
      .filter(col("score").isNotNull)
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col("index").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col("index"),
        (round(col("score"), 4) + lit(0.0)).as("score"))
      .orderBy(qIdCol, "rank")
  }

  /** EXACT full-dimension rerank — [[rerankFullDim]] with f64 cosine
    * instead of the SQ8 envelope, for corpora whose fine rank gaps
    * sit BELOW the global 8-bit grid (measured at 10M×256: the family
    * corpus's intra-cluster gaps cap the SQ8 rerank at ~0.867
    * recall@10 no matter how deep the shortlist, while exact recovers
    * to the shortlist's coverage, ≥0.9). Fully distributed — no
    * envelope build, no vector broadcast, no collect: the candidate
    * id pairs JOIN the corpus table (only shortlist·|queries| corpus
    * vectors cross the exchange — the fetch, not the corpus), then
    * the queries on qid, and the codegen'd [[graft.functions
    * .ArrayCosine]] (via `array_cosine`) scores each pair scan-stage.
    * Costs one corpus-table scan per serve — the SQ8 envelope stays
    * the right rung when serve latency matters more than the last
    * recall points.
    */
  def rerankExact(
      shortlist: DataFrame,
      queries: DataFrame,
      qIdCol: String,
      embCol: String,
      corpus: DataFrame,
      cIdCol: String,
      cEmbCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cand = shortlist.select(col(qIdCol), col("index"))
    val cv = corpus.select(
      col(cIdCol).cast(org.apache.spark.sql.types.LongType).as("index"),
      col(cEmbCol).cast("array<double>").as("__ce"))
    val qv = queries.select(col(qIdCol),
      col(embCol).cast("array<double>").as("__qe"))
    val scored = cand
      .join(cv, Seq("index"))
      .join(qv, Seq(qIdCol))
      .select(col(qIdCol), col("index"),
        array_cosine(col("__qe"), col("__ce")).as("score"))
      .filter(col("score").isNotNull)
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col("index").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col("index"),
        (round(col("score"), 4) + lit(0.0)).as("score"))
      .orderBy(qIdCol, "rank")
  }

  /** The compressed pipeline end-to-end: reduced-dim IVF+PQ proposes
    * `shortlist` candidates (all ADC cost at the REDUCED dim), the
    * full-dim SQ8 envelope reranks to the final top-k
    * ([[rerankFullDim]]). `queries` must carry BOTH the original
    * embedding (`embCol`) and its projection (`projCol`, from the
    * SAME [[pcaProject]]/[[randomProject]] transform that built
    * `reduced`'s corpus); `reduced` and `full` must pack the SAME
    * corpus — checked by id-array equality.
    */
  def topkIvfPqRerankFull(
      queries: DataFrame,
      qIdCol: String,
      embCol: String,
      projCol: String,
      reduced: Similarity.CorpusIndexIvfPq,
      full: Similarity.CorpusIndexSq8,
      k: Int,
      nProbe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist must be >= k for the rerank to fill k, got $shortlist (k=$k)")
    require(reduced.n == full.n &&
        java.util.Arrays.equals(reduced.ids, full.ids),
      "reduced index and full-dim SQ8 envelope must pack the SAME corpus " +
        s"(ids differ: reduced n=${reduced.n}, full n=${full.n})")
    val proposals = Similarity.topkIvfPqFlat(
      queries.select(col(qIdCol), col(projCol)),
      projCol, reduced, shortlist, nProbe)
    rerankFullDim(proposals, queries, qIdCol, embCol, full, k)
  }

  private def embDim(df: DataFrame, embCol: String): Int = {
    val head = df.select(col(embCol)).na.drop().limit(1).collect()
    require(head.nonEmpty, "Empty corpus")
    head.head.getSeq[Any](0).length
  }

  /** Project an embedding column through a trained [[PcaModel]] —
    * scan-stage (model broadcasts with the plan closure, no shuffle):
    * out[j] = Σ_d (x[d] − μ[d]) · basis[j][d]. Null embeddings stay
    * null; f32 columns widen per element like the kernels.
    *
    * `whiten = true` additionally scales component j by 1/√λⱼ (PCA
    * whitening — each retained direction leaves with ~unit variance
    * on the training corpus), the usual prep before cosine/dot
    * indexing so one dominant direction can't drown the rest.
    * Near-zero eigenvalues are floored at 1e-12·λ₁ so a degenerate
    * direction amplifies to ~0 instead of exploding.
    */
  def pcaProject(
      df: DataFrame, embCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val mat =
      if (!whiten) model.basis
      else {
        val floor = math.max(model.eigenvalues.headOption.getOrElse(0.0), 0.0) * 1e-12
        val m = model.basis.clone()
        var j = 0
        while (j < model.k) {
          val lam = math.max(model.eigenvalues(j), floor)
          val s = if (lam <= 0.0) 0.0 else 1.0 / math.sqrt(lam)
          var d = 0
          while (d < model.dim) { m(j * model.dim + d) *= s; d += 1 }
          j += 1
        }
        m
      }
    projectMatrix(df, embCol, model.dim, model.k, model.mean, mat, outCol)
  }

  /** Shared scan-stage affine projection: out[j] = Σ_d (x[d] − μ[d]) ·
    * m[j][d] (row-major k×dim).
    */
  private def projectMatrix(
      df: DataFrame, embCol: String, dim: Int, k: Int,
      mean: Array[Double], matrix: Array[Double], outCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val spark = df.sparkSession
    val schema = df.schema
    val embIdx = schema.fieldIndex(embCol)
    val embIsF32 = schema(embCol).dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case dt => throw new IllegalArgumentException(
        s"$embCol must be array<float>/array<double>, got ${dt.simpleString}")
    }
    val fieldTypes = schema.fields.map(_.dataType)
    val outSchema = StructType(schema.fields :+ StructField(outCol,
      ArrayType(DoubleType, containsNull = false), nullable = true))
    val bc = spark.sparkContext.broadcast((mean, matrix))
    val outRdd = org.apache.spark.sql.graft.InternalRowBridge.toInternalRdd(df)
      .mapPartitions { it =>
        val (mu, mat) = bc.value
        val x = new Array[Double](dim)
        it.map { row0 =>
          val row = row0.copy()
          val result: AnyRef =
            if (row.isNullAt(embIdx)) null
            else {
              val a = row.getArray(embIdx)
              if (a.numElements() != dim) throw new IllegalArgumentException(
                s"projection: expected $dim elements, got ${a.numElements()}")
              var d = 0
              if (embIsF32) {
                val fa = a.toFloatArray()
                while (d < dim) { x(d) = fa(d).toDouble - mu(d); d += 1 }
              } else {
                val da = a.toDoubleArray()
                while (d < dim) { x(d) = da(d) - mu(d); d += 1 }
              }
              val out = new Array[Any](k)
              var j = 0
              while (j < k) {
                var acc = 0.0
                var d2 = 0
                val base = j * dim
                while (d2 < dim) { acc += x(d2) * mat(base + d2); d2 += 1 }
                out(j) = acc
                j += 1
              }
              new GenericArrayData(out)
            }
          val vals = new Array[Any](fieldTypes.length + 1)
          var f = 0
          while (f < fieldTypes.length) { vals(f) = row.get(f, fieldTypes(f)); f += 1 }
          vals(fieldTypes.length) = result
          new GenericInternalRow(vals): InternalRow
        }
      }
    org.apache.spark.sql.graft.InternalRowBridge.fromInternalRdd(spark, outRdd, outSchema)
  }
}
