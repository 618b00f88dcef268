package graft

import graft.operators.{CorpusIndex, Metric, Similarity}
import org.apache.spark.sql.DataFrame

/** Reference-shaped ergonomic surface. The reference exposes its two
  * kernels as an expression namespace —
  * `col("emb").pmm.topk(corpus, k, metric)` /
  * `.pmm.matmul(corpus, flatten)`
  * (/root/reference/python/polars_matmul/__init__.py:63,121). The
  * Spark analogue is an extension-method set on DataFrame so a
  * reference user's call sites translate one-to-one, with the same
  * defaults (metric = cosine, flatten = false) and the same
  * string-typed metric parsing (including its error message shape,
  * `Metric.fromString`):
  *
  * {{{
  * import graft.syntax._
  * val cx = Similarity.collectCorpus(corpusDF, "id", "embedding")
  * queries.pmmTopk("embedding", cx, k = 10)            // matches column
  * queries.pmmTopkFlat("embedding", cx, k = 10)        // exploded rows
  * queries.pmmMatmul("embedding", cx)                  // scores array
  * queries.pmmMatmul("embedding", cx, flatten = true)  // (index, score) rows
  * }}}
  */
object syntax {

  implicit class PmmOps(private val df: DataFrame) extends AnyVal {

    /** `pmm.topk`: per-row top-k matches against the held corpus index
      * as an `array<struct<index, score>>` column.
      */
    def pmmTopk(embCol: String, corpus: CorpusIndex, k: Int,
        metric: String = "cosine", outputCol: String = "matches"): DataFrame =
      Similarity.topk(df, embCol, corpus, k, Metric.fromString(metric), outputCol)

    /** `pmm.topk` + the reference's documented explode/unnest
      * consumption pattern: one row per (query, match) with
      * index/score/rank columns.
      */
    def pmmTopkFlat(embCol: String, corpus: CorpusIndex, k: Int,
        metric: String = "cosine"): DataFrame =
      Similarity.topkFlat(df, embCol, corpus, k, Metric.fromString(metric))

    /** `pmm.matmul`: all pairwise dot products — per-row `scores`
      * array by default, exploded (index, score) rows with
      * `flatten = true`. Same two-parameter surface as the reference;
      * use `Similarity.matmul(..., outputCol = ...)` directly to name
      * the array column (an outputCol here would be silently
      * meaningless in the flattened form, which has no array column).
      */
    def pmmMatmul(embCol: String, corpus: CorpusIndex,
        flatten: Boolean = false): DataFrame =
      if (flatten) Similarity.matmulFlat(df, embCol, corpus)
      else Similarity.matmul(df, embCol, corpus)
  }
}
