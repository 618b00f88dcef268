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

    // ------------------------------------------------------------------
    // DataFrame-accepting overloads: the reference binds the corpus
    // frame directly in the expression call
    // (python/polars_matmul/__init__.py:63) — these close that last
    // call-site gap by collecting internally, so a reference one-liner
    // ports verbatim. For repeated searches against the same corpus,
    // prefer collecting once via `Similarity.collectCorpus` and the
    // CorpusIndex overloads above — each call here re-collects and
    // re-broadcasts.
    // ------------------------------------------------------------------

    /** `pmm.topk` with a corpus DataFrame: collects (idCol, embCol)
      * internally, then searches. One-call ergonomics for one-shot use.
      */
    def pmmTopk(embCol: String, corpus: DataFrame, corpusIdCol: String,
        corpusEmbCol: String, k: Int, metric: String,
        outputCol: String): DataFrame =
      Similarity.topk(df, embCol,
        Similarity.collectCorpus(corpus, corpusIdCol, corpusEmbCol),
        k, Metric.fromString(metric), outputCol)

    def pmmTopk(embCol: String, corpus: DataFrame, corpusIdCol: String,
        corpusEmbCol: String, k: Int): DataFrame =
      pmmTopk(embCol, corpus, corpusIdCol, corpusEmbCol, k, "cosine", "matches")

    /** [[pmmTopkFlat]] with a corpus DataFrame — collects internally.
      * (No default arguments on these overloads: Scala forbids
      * defaults on more than one alternative of an overloaded method.)
      */
    def pmmTopkFlat(embCol: String, corpus: DataFrame, corpusIdCol: String,
        corpusEmbCol: String, k: Int): DataFrame =
      pmmTopkFlat(embCol, corpus, corpusIdCol, corpusEmbCol, k, "cosine")

    def pmmTopkFlat(embCol: String, corpus: DataFrame, corpusIdCol: String,
        corpusEmbCol: String, k: Int, metric: String): DataFrame =
      Similarity.topkFlat(df, embCol,
        Similarity.collectCorpus(corpus, corpusIdCol, corpusEmbCol),
        k, Metric.fromString(metric))

    /** [[pmmMatmul]] with a corpus DataFrame — collects internally. */
    def pmmMatmul(embCol: String, corpus: DataFrame, corpusIdCol: String,
        corpusEmbCol: String, flatten: Boolean): DataFrame = {
      val cx = Similarity.collectCorpus(corpus, corpusIdCol, corpusEmbCol)
      if (flatten) Similarity.matmulFlat(df, embCol, cx)
      else Similarity.matmul(df, embCol, cx)
    }
  }

  /** Pipeline-side ergonomics — the operators a curation job chains
    * most, as extension methods so a pipeline reads as one fluent
    * expression:
    *
    * {{{
    * import graft.syntax._
    * docs.hygiene("text")                       // mojibake → NFC → C4
    *   .dedupExact("doc_id", "text")
    *   .winsorize("source", "n_chars")
    *   .splitN("doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
    * }}}
    */
  implicit class PipelineOps(private val df: DataFrame) extends AnyVal {
    import org.apache.spark.sql.functions.col

    /** Normalization front door as one column rewrite: per-line
      * mojibake repair → NFC → C4 line rules; replaces `textCol` with
      * the cleaned text and appends the C4 `keep_doc` flag.
      */
    def hygiene(textCol: String, minWords: Int = 3): DataFrame = {
      val fixed = operators.TextAnalysis.normalizeUnicode(
        operators.TextAnalysis.fixMojibake(col(textCol)), "NFC")
      val c4 = operators.TextAnalysis.c4Struct(fixed, minWords)
      df.withColumn("__c4", c4)
        .withColumn(textCol, col("__c4.clean"))
        .withColumn("keep_doc", col("__c4.keep_doc"))
        .drop("__c4")
    }

    def dedupExact(idCol: String, textCol: String): DataFrame =
      operators.Dedup.exact(df, idCol, textCol)

    def winsorize(groupCol: String, valCol: String,
        pLo: Double = 0.05, pHi: Double = 0.95): DataFrame =
      operators.Curate.winsorize(df, groupCol, valCol, pLo, pHi)

    def splitN(idCol: String, slices: Seq[(String, Int)]): DataFrame =
      operators.Curate.splitN(df, idCol, slices)

    def pseudonymize(key: String, cols: Seq[String]): DataFrame =
      operators.TextAnalysis.pseudonymize(df, key, cols)

    def intervalJoin(pointTsCol: String, intervals: DataFrame,
        startCol: String, endCol: String, bucketWidthMicros: Long): DataFrame =
      operators.Relational.intervalJoin(
        df, pointTsCol, intervals, startCol, endCol, bucketWidthMicros)
  }
}
