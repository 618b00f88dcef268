package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine several independent rankings of
  * the same candidate space (BM25 keyword search, dense-vector top-k,
  * a recency sort, …) into one fused ranking with reciprocal-rank
  * fusion (Cormack/Clarke/Büttcher, SIGIR'09):
  *
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d))
  *
  * RRF fuses RANKS, not scores, so the lists need no score
  * calibration against each other — the standard trick for gluing a
  * lexical retriever to a vector retriever whose score scales are
  * incomparable (BM25 is unbounded, cosine lives in [-1, 1]). A
  * document missing from a list simply contributes nothing for that
  * list (the usual RRF convention), so lists over different candidate
  * subsets fuse without imputation.
  *
  * Scale shape: inputs are top-N lists, i.e. |queries| × N rows per
  * list — already shortlists, orders of magnitude smaller than the
  * corpus that produced them. The fuse is one union + one partial-
  * aggregatable groupBy on (query, id) + one per-query top-k window;
  * both exchanges move only shortlist rows, never corpus rows, so the
  * operator's cost is independent of corpus size. The expensive part
  * of hybrid search stays in the retrievers (BM25 scan, ANN probe),
  * which scale on their own paths.
  */
object Retrieval {

  /** Fuse `rankings` by reciprocal rank. Each input DataFrame must
    * carry `queryCols` (zero or more query-identifying columns — empty
    * for a single-query fusion), `idCol` (the candidate id) and
    * `rankCol` (1-based rank within that list, castable to int;
    * rank ≤ 0 or null refuses — a 0-based rank silently inflates
    * every contribution, the classic off-by-one RRF bug).
    *
    * Output: `queryCols :+ idCol :+ "rrf"`, the top `k` candidates
    * per query by `(rrf DESC, id ASC)` — deterministic under rrf
    * ties, which are common (two docs each appearing in exactly one
    * list at the same rank fuse to the same score).
    *
    * A candidate appearing twice in ONE list refuses (that is a
    * malformed ranking, and summing both occurrences would double-
    * count the list); appearing in several lists is the point.
    *
    * `weights` (optional, one per ranking, all > 0) scales each
    * list's contribution — w_i/(c+rank) — the standard knob when one
    * retriever is trusted more (e.g. 2:1 dense:lexical). Empty =
    * unweighted (all 1.0).
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      queryCols: Seq[String],
      idCol: String,
      rankCol: String,
      k: Int,
      c: Double = 60.0,
      weights: Seq[Double] = Nil): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    require(c > 0.0, s"rrf constant c must be > 0, got $c")
    require(weights.isEmpty || weights.length == rankings.length,
      s"weights must be empty or one per ranking: ${weights.length} weights, " +
        s"${rankings.length} rankings")
    require(weights.forall(_ > 0.0),
      s"weights must be > 0, got ${weights.filter(_ <= 0.0).mkString(", ")}")
    val wts = if (weights.isEmpty) Seq.fill(rankings.length)(1.0) else weights
    val keyCols = queryCols :+ idCol
    rankings.zipWithIndex.foreach { case (r, i) =>
      val missing = (keyCols :+ rankCol).filterNot(r.columns.contains)
      require(missing.isEmpty,
        s"ranking #$i is missing column(s) ${missing.mkString(", ")}")
    }
    val key: Seq[Column] = keyCols.map(col)
    // Tag each list so a within-list duplicate is detectable AFTER the
    // union (count per (list, query, id) must be 1) without a separate
    // pre-pass per input.
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select((key :+ col(rankCol).cast("int").as("_rrf_rank") :+
        lit(i).as("_rrf_list") :+ lit(wts(i)).as("_rrf_w")): _*)
    }
    val unioned = tagged.reduce(_ unionByName _)
      .withColumn("_rrf_rank",
        when(col("_rrf_rank").isNull || col("_rrf_rank") <= 0,
          raise_error(concat(lit("rrfFuse: rank must be a positive " +
            "1-based integer; got "),
            coalesce(col("_rrf_rank").cast("string"), lit("null")),
            lit(" for id "),
            coalesce(col(idCol).cast("string"), lit("null")))))
          .otherwise(col("_rrf_rank")))
    // ONE shuffle on (query, id) does double duty: the fused score
    // and the within-list duplicate check — a candidate is duplicated
    // inside a list iff its row count exceeds its DISTINCT list count
    // (collect_set over ≤ |rankings| tags, partial-aggregatable, so
    // no second exchange and no expanded distinct-agg plan).
    val fused = unioned
      .groupBy(key: _*)
      .agg(sum(col("_rrf_w") / (lit(c) + col("_rrf_rank").cast("double"))).as("rrf"),
        count(lit(1)).as("_rrf_n"),
        size(collect_set(col("_rrf_list"))).as("_rrf_nlists"))
      .withColumn("rrf",
        when(col("_rrf_n") > col("_rrf_nlists"),
          raise_error(concat(lit("rrfFuse: candidate "),
            col(idCol).cast("string"),
            lit(" appears more than once in one ranking — rankings " +
              "must list each candidate at most once"))))
          .otherwise(col("rrf")))
      .drop("_rrf_n", "_rrf_nlists")
    // SINGLE-PARTITION window by design when there are no query
    // columns: the fused frame is bounded by Σ|rankings| — shortlists
    // (top-N per retriever) by contract, never a corpus-scale frame.
    // Feeding corpus-scale rankings through the no-query-column form
    // would serialize here; partition such inputs by a query key
    // instead (round-16 advisor note).
    val w =
      if (queryCols.isEmpty) Window.orderBy(col("rrf").desc, col(idCol).asc)
      else Window.partitionBy(queryCols.map(col): _*)
        .orderBy(col("rrf").desc, col(idCol).asc)
    fused
      .withColumn("_rrf_pos", row_number().over(w))
      .filter(col("_rrf_pos") <= k)
      .drop("_rrf_pos")
  }
}
