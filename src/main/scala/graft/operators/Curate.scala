package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed curation job a training-data pipeline actually runs —
  * the individual operators (exact dedup, language ID, quality
  * scoring) wired into one end-to-end pass over the corpus:
  *
  *   keep a document iff it is the lowest-id representative of its
  *   exact-content group AND its predicted language is `lang` AND it
  *   clears the quality gates (word count, stopword ratio).
  *
  * Plan shape at scale: quality and language are one scan-stage
  * projection; the gates filter IN the scan stage (legal because exact
  * copies score identically — see [[curate]]); dedup is ONE shuffle on
  * the content hash (window row_number, equivalent to the groupBy
  * keep-min-id) over the gate survivors only. Nothing materializes
  * per-pair or per-token state.
  */
object Curate {

  def curate(
      s: SparkSession,
      dir: String,
      lang: String = "en",
      minWords: Long = 30L,
      minStopRatio: Double = 0.04): DataFrame = {
    val t = col("text")
    // ONE scan-stage projection computes every gate column (round 2
    // built tokens/normalize/bestLang in separate withColumns around
    // the window — the suite's worst data-moving ratio, 6.9× DuckDB).
    // Within the single select, `tokens(t)` and `tokens(normalize(t))`
    // each appear in several columns; whole-stage codegen's
    // subexpression elimination evaluates each once per row.
    val best = TextAnalysis.bestLang(t)
    val scored = Tables.documents(s, dir).select(
      col("doc_id"), t,
      best.getField("lang").as("pred_lang"),
      size(tokens(t)).cast("long").as("n_words"),
      (round(tokenListCount(tokens(normalize(t)), TextAnalysis.langMarkers.head._2)
        / size(tokens(t)), 4) + lit(0.0)).as("stop_ratio"))
    // gates run BEFORE the dedup window: exact copies share the text
    // byte-for-byte, hence identical pred_lang/n_words/stop_ratio — a
    // content group passes or fails as a whole, so its surviving
    // min-id representative is unchanged, while the window shuffle
    // now carries only gate-passing rows (~6 % of the corpus here)
    // instead of everything.
    val dedupW = Window.partitionBy(md5(t)).orderBy(col("doc_id"))
    scored
      .filter(col("pred_lang") === lang &&
        col("n_words") >= minWords && col("stop_ratio") >= minStopRatio)
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .select("doc_id", "pred_lang", "n_words", "stop_ratio")
      .orderBy("doc_id")
  }

  /** Deterministic bucket in [0, 100) from the md5 hex of the id —
    * computable identically in any engine with md5/ascii/substr, so
    * the split is reproducible across systems (and oracle-checkable).
    */
  def hashBucket(idCol: Column): Column =
    pmod(ascii(substring(md5(idCol.cast("string")), 1, 1)) * 31
      + ascii(substring(md5(idCol.cast("string")), 2, 1)), lit(100))

  /** Deterministic train/eval split: bucket < trainPct → "train".
    * Stable under reruns, engines, and partitioning — membership
    * depends only on the id.
    */
  def split(df: DataFrame, idCol: String, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100)
    df.withColumn("split",
      when(hashBucket(col(idCol)) < trainPct, "train").otherwise("eval"))
  }

  /** Split summary for the driver gate: per-split doc count + id range. */
  def splitSummary(s: SparkSession, dir: String, trainPct: Int = 80): DataFrame =
    split(Tables.documents(s, dir), "doc_id", trainPct)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split")
}
