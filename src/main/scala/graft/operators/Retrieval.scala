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
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      queryCols: Seq[String],
      idCol: String,
      rankCol: String,
      k: Int,
      c: Double = 60.0): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    require(c > 0.0, s"rrf constant c must be > 0, got $c")
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
        lit(i).as("_rrf_list")): _*)
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
    // One shuffle on (list, query, id) does double duty: the duplicate
    // check (count must be 1) and the per-key contribution. The second
    // groupBy on (query, id) then reduces list contributions — both
    // aggregations are partial (map-side combine), and the rows are
    // shortlist-sized.
    val perList = unioned
      .groupBy((col("_rrf_list") +: key): _*)
      .agg(count(lit(1)).as("_rrf_n"), min(col("_rrf_rank")).as("_rrf_rank"))
      .withColumn("_rrf_n",
        when(col("_rrf_n") > 1,
          raise_error(concat(lit("rrfFuse: candidate "),
            col(idCol).cast("string"),
            lit(" appears more than once in ranking #"),
            col("_rrf_list").cast("string"),
            lit(" — rankings must list each candidate at most once"))))
          .otherwise(col("_rrf_n")))
    val fused = perList
      .filter(col("_rrf_n") === 1) // always true; keeps the check in-plan
      .groupBy(key: _*)
      .agg(sum(lit(1.0) / (lit(c) + col("_rrf_rank").cast("double"))).as("rrf"))
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
