package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting (SURVEY §2.3 #28-31).
  * Pure built-in column functions — everything runs in the scan stage
  * with whole-stage codegen, no shuffle except final ordering.
  */
object TextAnalysis {

  /** Stopword-marker sets per language. Deterministic heuristic: the
    * language with the highest marker-token count wins; ties (incl.
    * all-zero) go to the earlier entry. Accuracy is data-bound (the
    * synthetic corpus is English keyword soup under every lang tag) —
    * the operator contract is determinism + engine parity.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "fr" -> Seq("le", "la", "les", "et", "de"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "las", "y", "en"))

  /** struct(score, lang) of the winning language for a text column —
    * argmax of marker counts, earlier entry wins ties.
    *
    * Shape matters: the argmax is `array_max` over (score, negpos,
    * lang) structs — struct ordering gives highest score, then
    * earliest entry — NOT a `reduce(when(...))` chain. The reduce
    * form nests CASE WHEN combinatorially (every comparison re-states
    * both operand trees: ~20 copies of the tokenizer at 4 languages),
    * and codegen subexpression elimination cannot hoist from
    * conditional branches, so every copy actually ran. The array form
    * is branch-free: one tokenizer pass per evaluation site, CSE'd.
    * Null text keeps the old semantics: all-null scores compare on
    * negpos → ("en", null score), matching the SQL oracles' NULLS
    * LAST ranking.
    */
  def bestLang(textCol: Column): Column = {
    val toks = tokens(normalize(textCol))
    val cands = array(langMarkers.zipWithIndex.map { case ((lang, ws), i) =>
      struct(tokenListCount(toks, ws).cast("long").as("score"),
        lit(-i).as("negpos"), lit(lang).as("lang"))
    }: _*)
    val best = array_max(cands)
    struct(best.getField("score").as("score"), best.getField("lang").as("lang"))
  }

  /** (doc_id, pred_lang, score): winning marker count per doc. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val best = bestLang(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), best.getField("lang").as("pred_lang"),
        best.getField("score").as("score"))
      .orderBy("doc_id")
  }

  /** Quality features: length, word count, punctuation ratio, stopword
    * ratio, mean word length (ratios rounded to 4).
    */
  def quality(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val toks = tokens(t)
    val r4 = (c: Column) => round(c, 4) + lit(0.0)
    Tables.documents(s, dir).select(
        col("doc_id"),
        length(t).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_words"),
        r4(regexp_count(t, lit("[^\\w\\s]")) / length(t)).as("punct_ratio"),
        r4(tokenListCount(tokens(normalize(t)), langMarkers.head._2) / size(toks))
          .as("stop_ratio"),
        r4(aggregate(transform(toks, w => length(w)), lit(0), (acc, x) => acc + x)
          / size(toks)).as("avg_word_len"))
      .orderBy("doc_id")
  }

  /** Token counts: whitespace tokens + BPE-ish regex pieces
    * (word runs / single non-space symbols — the pre-tokenizer shape
    * BPE vocabularies split on).
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit("\\w+|[^\\w\\s]")).cast("long").as("n_bpe_pieces"))
      .orderBy("doc_id")

  /** Document fingerprint: md5 over normalized text (whitespace/case/
    * punctuation-insensitive identity), plus a 64-bit content hash.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
        col("doc_id"),
        md5(normalize(col("text"))).as("fp_md5"),
        length(normalize(col("text"))).cast("long").as("norm_len"))
      .orderBy("doc_id")

  /** Corpus heavy hitters: the `k` most frequent normalized tokens
    * with their occurrence counts (count desc, token asc tie-break) —
    * the vocabulary/stopword-discovery pass a pipeline runs before
    * tuning filters. Plan shape: tokens explode in the scan stage,
    * one hash-shuffle with map-side partial counts, TakeOrdered for
    * the top-k — no full sort of the vocabulary.
    */
  def topTokens(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    docs.select(explode(tokens(normalize(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
  }

  /** Winnowing fingerprints ([[graft.functions.WinnowFingerprints]]:
    * rolling-hash k-grams, window minima) exploded to one row per
    * selected fingerprint — the substring-level identity used for
    * overlap/plagiarism-style matching, where [[fingerprint]] is
    * whole-document identity. Scan-stage projection; matching
    * documents is then a plain equi-join on `fp`.
    */
  def winnow(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(graft.functions.SketchFunctions.winnow_fingerprints(
          normalize(col(textCol)), k, w)).as(Seq("pos", "fp")))
      .select(col("id"), col("pos"), col("fp"))
      .orderBy("id", "pos")
}
