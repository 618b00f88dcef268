package graft

import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query returns a deterministic DataFrame whose column names
  * and (rounded) values match the paired DuckDB oracle SQL exactly.
  * Floating scores are rounded to 4 decimals on both sides; ranking
  * ties are broken by id on both sides.
  */
object SparkEntry {

  /** Flagship: cosine top-k self-search over the embeddings table. */
  def entry(spark: SparkSession): DataFrame =
    queries("topk_cosine")(spark, "/root/testdata/sf0.001")

  // ---- similarity family (SURVEY §2.1) ----------------------------------

  /** Corpus collection is per-call; at verify/bench scale it's a
    * sub-second broadcast (2000×64 floats at sf0.1).
    */
  private def corpus(s: SparkSession, dir: String) =
    Similarity.collectCorpus(Tables.embeddings(s, dir), "vec_id", "embedding")

  private def topkQuery(s: SparkSession, dir: String, metric: Metric, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.topkFlat(emb.select("vec_id", "embedding"), "embedding", corpus(s, dir), k, metric)
      .select(col("vec_id"), col("rank").cast("long").as("rank"), col("index"),
        (round(col("score"), 4) + lit(0.0)).as("score"))
      .orderBy("vec_id", "rank")
  }

  private def topkOracle(scoreFn: String, desc: Boolean, k: Int = 5): String = {
    val dir = if (desc) "DESC" else "ASC"
    s"""WITH scores AS (
       |  SELECT q.vec_id AS vec_id, c.vec_id AS idx,
       |         $scoreFn(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS s
       |  FROM embeddings q CROSS JOIN embeddings c
       |), ranked AS (
       |  SELECT vec_id, idx, s,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY s $dir, idx ASC) AS rank
       |  FROM scores
       |)
       |SELECT vec_id, rank, idx AS "index", round(s, 4) + 0.0 AS score
       |FROM ranked WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_cosine" -> ((s, dir) => topkQuery(s, dir, Metric.Cosine)),
    "topk_dot" -> ((s, dir) => topkQuery(s, dir, Metric.Dot)),
    "topk_euclidean" -> ((s, dir) => topkQuery(s, dir, Metric.Euclidean)),

    "topk_join_meta" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val meta = emb.select(col("vec_id").as("index"), col("label"))
      topkQuery(s, dir, Metric.Cosine)
        .join(broadcast(meta), Seq("index"))
        .select(col("vec_id"), col("rank"), col("index"), col("label"), col("score"))
        .orderBy("vec_id", "rank")
    }),

    "matmul_flat" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // queries capped at 100 rows: |out| = 100 × |corpus| pairs.
      // Cast to f64 so the f64 GEMM path runs (the oracle computes in
      // DOUBLE; the f32 fast path is covered by SimilaritySpec).
      val q = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")).filter(col("vec_id") < 100)
      Similarity.matmulFlat(q, "embedding", corpus(s, dir))
        .select(col("vec_id"), col("index"), (round(col("score"), 4) + lit(0.0)).as("score"))
        .orderBy("vec_id", "index")
    }),

    "matmul_rows" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // cast queries to f64 so the f64 GEMM path runs (oracle casts too)
      val q = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")).filter(col("vec_id") < 100)
      Similarity.matmul(q, "embedding", corpus(s, dir), "scores")
        .select(col("vec_id"),
          transform(col("scores"), x => round(x, 4) + lit(0.0)).as("scores"))
        .orderBy("vec_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "topk_cosine" -> topkOracle("list_cosine_similarity", desc = true),
    "topk_dot" -> topkOracle("list_inner_product", desc = true),
    "topk_euclidean" -> topkOracle("list_distance", desc = false),

    "topk_join_meta" ->
      s"""WITH scores AS (
         |  SELECT q.vec_id AS vec_id, c.vec_id AS idx, c.label AS label,
         |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS s
         |  FROM embeddings q CROSS JOIN embeddings c
         |), ranked AS (
         |  SELECT vec_id, idx, label, s,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, idx ASC) AS rank
         |  FROM scores
         |)
         |SELECT vec_id, rank, idx AS "index", label, round(s, 4) + 0.0 AS score
         |FROM ranked WHERE rank <= 5 ORDER BY vec_id, rank""".stripMargin,

    "matmul_flat" ->
      """SELECT q.vec_id AS vec_id, c.vec_id AS "index",
        |       round(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) + 0.0 AS score
        |FROM embeddings q CROSS JOIN embeddings c
        |WHERE q.vec_id < 100 ORDER BY vec_id, "index"""".stripMargin,

    "matmul_rows" ->
      """SELECT q.vec_id AS vec_id,
        |       list(round(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) + 0.0
        |            ORDER BY c.vec_id) AS scores
        |FROM embeddings q CROSS JOIN embeddings c
        |WHERE q.vec_id < 100 GROUP BY q.vec_id ORDER BY vec_id""".stripMargin,
  )
}
