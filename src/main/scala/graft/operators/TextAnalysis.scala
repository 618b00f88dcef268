package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Deterministic sentence segmentation: (doc_id, sent_idx,
    * sentence), sentences being maximal runs ending in terminal
    * punctuation (or the unterminated tail), trimmed, empties
    * dropped. The pattern avoids lookarounds on purpose — it runs
    * identically under Java regex and RE2, so the DuckDB oracle
    * replays it verbatim (the same Java∩RE2 discipline as the PII and
    * HTML chains). Scan-stage `regexp_extract_all` + posexplode, no
    * shuffle but the output order.
    */
  def sentences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"regexp_extract_all(`$textCol`, '[^.!?]+[.!?]+|[^.!?]+$$', 0)").as("ss"))
      .select(col("doc_id"), posexplode(col("ss")).as(Seq("sent_idx", "sentence")))
      .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
        trim(col("sentence")).as("sentence"))
      .filter(col("sentence") =!= "")
      .orderBy("doc_id", "sent_idx")

  /** Paragraph-level NEAR-dup pairs — the fuzzy rung the paragraph
    * granularity was missing ([[dedupParagraphs]] is exact-match
    * keep-first; boilerplate that varies by a date stamp or a domain
    * name escapes it). Paragraphs explode with a composite
    * (doc, position) key packed into one long (pos bounded to 2^20 —
    * a million paragraphs per doc — so doc ids keep 43 bits), then
    * ride the standard MinHash+banded-LSH pipeline unchanged: same
    * signatures, same threshold-adaptive banding, same capped
    * buckets, same exact-Jaccard verify. Output:
    * (doc1, pos1, doc2, pos2, jaccard), doc/pos decoded back.
    * A row outside the packable range (id ∉ [0, 2^43), pos ≥ 2^20 —
    * positions count BEFORE the minChars filter) fails with a named
    * raise_error instead of silently corrupting pair identities.
    */
  def paragraphNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, minChars: Int = 30,
      shingleN: Int = 5, numPerms: Int = 128): DataFrame = {
    val packed =
      when(col("id") < 0 || col("id") >= lit(1L << 43), raise_error(concat(
        lit("paragraphNearDupPairs: doc id outside packable [0, 2^43): "),
        col("id").cast("string"))))
      .when(col("pos") >= lit(1 << 20), raise_error(concat(
        lit("paragraphNearDupPairs: >= 2^20 paragraphs in doc "),
        col("id").cast("string"))))
      .otherwise(shiftLeft(col("id"), 20).bitwiseOR(col("pos")))
    val paras = docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n{2,}", -1)).as(Seq("pos", "p")))
      .filter(length(trim(col("p"))) >= minChars)
      .select(packed.as("pid"), col("p"))
    graft.operators.Dedup
      .minhashPairs(paras, "pid", "p", threshold, shingleN, numPerms)
      .select(
        shiftRight(col("id1"), 20).as("doc1"),
        (col("id1").bitwiseAND(lit((1L << 20) - 1))).as("pos1"),
        shiftRight(col("id2"), 20).as("doc2"),
        (col("id2").bitwiseAND(lit((1L << 20) - 1))).as("pos2"),
        col("jaccard"))
      .orderBy("doc1", "pos1", "doc2", "pos2")
  }

  /** Sketch form of [[topTokens]]: Misra-Gries frequent-items via the
    * native [[graft.functions.MisraGriesAgg]] aggregate. The exact
    * pass shuffles one row per DISTINCT token — the full vocabulary
    * crosses the exchange at 100 TB; the sketch is bounded state per
    * partial buffer (`capacity` counters, mergeable map-side), so the
    * shuffle carries ≤ `capacity` rows per partition whatever the
    * vocabulary. Output: (token, est, max_err), est the undercounting
    * estimate with `est ≤ true ≤ est + max_err`, and every token
    * whose true count exceeds max_err guaranteed present.
    * `text_top_tokens_approx_gate` pins those bounds against the
    * exact top-k on the driver's corpus.
    */
  def topTokensApprox(docs: DataFrame, idCol: String, textCol: String,
      k: Int, capacity: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => C, expression => E}
    val agg = graft.functions.MisraGriesAgg(E(col("token")), k, capacity)
    docs.select(explode(tokens(normalize(col(textCol)))).as("token"))
      .filter(col("token") =!= "")
      .agg(C(agg.toAggregateExpression()).as("sk"))
      .select(explode(col("sk.items")).as("it"), col("sk.max_err").as("max_err"))
      .select(col("it.token").as("token"), col("it.est").as("est"), col("max_err"))
  }

  /** Top word ASSOCIATIONS by pointwise mutual information — the
    * collocation detector of corpus analysis (Church & Hanks '90;
    * "new york" scores high because its parts rarely occur apart):
    *
    *   pmi(w1,w2) = ln( (c12/Nb) / ((c1/Nu)·(c2/Nu)) )
    *
    * with c12 the adjacent-bigram occurrence count (Nb total
    * bigrams), c(w) the unigram occurrence counts (Nu total tokens).
    * `minCount` suppresses the low-count PMI pathology (a hapax pair
    * of two hapax words scores ln(Nu²/Nb) — maximal — on one
    * observation). Rank on the 4-decimal-rounded score, ties by
    * gram, for cross-engine determinism.
    *
    * Plan shape: two occurrence counts (shuffles bounded by vocab /
    * distinct-bigram cardinality, with map-side partial aggregation),
    * the surviving ≥ minCount bigrams join their parts' unigram
    * counts, and the result is a TakeOrdered top-k — corpus text
    * crosses no exchange.
    */
  def pmiPairs(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Int = 5, k: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k > 0, s"k must be > 0, got $k")
    val toks = tokens(normalize(col(textCol)))
    val uni = docs.select(explode(toks).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = docs.select(explode(wordGramsAll(toks, 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val totals = docs.agg(
      sum(size(toks)).cast("double").as("nu"),
      sum(greatest(size(toks) - 1, lit(0))).cast("double").as("nb")).head()
    // empty corpus (or all-null text): sum aggregates to null — no
    // tokens means no collocations, not an NPE
    if (totals.isNullAt(0) || totals.getDouble(0) == 0.0 ||
        totals.isNullAt(1) || totals.getDouble(1) == 0.0)
      return bi.select(col("g").as("bigram"), col("c12"),
        col("c12").as("c1"), col("c12").as("c2"),
        lit(0.0).as("pmi")).limit(0)
    val nu = totals.getDouble(0); val nb = totals.getDouble(1)
    bi
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .select(col("g").as("bigram"), col("c12"), col("c1"), col("c2"),
        (round(log((col("c12") / nb) / ((col("c1") / nu) * (col("c2") / nu))), 4)
          + lit(0.0)).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)
  }

  /** PII patterns as (name, regex, replacement). Conservative,
    * lookaround-free character-class regexes chosen to mean the same
    * thing under Java (Spark) and RE2 (DuckDB/engines at large):
    * emails, dotted-quad IPs, and +international phone numbers.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9]{7,15}", "<PHONE>"))

  /** PII redaction: per-pattern match counts (on the original text)
    * plus the text with every match replaced, patterns applied in
    * [[piiPatterns]] order (email first, so its digits/dots can't be
    * half-eaten by the IP rule). Pure `regexp_count`/`regexp_replace`
    * built-ins — a scan-stage projection with no shuffle, which is
    * the whole design: redaction at 100 TB must be a map.
    */
  /** The redaction column alone — [[piiPatterns]] applied in order.
    * Stateless, so it serves batch and streaming identically.
    */
  def redactedText(t: Column): Column =
    piiPatterns.foldLeft(t) { case (c, (_, re, repl)) => regexp_replace(c, re, repl) }

  /** Keyed PSEUDONYMIZATION — the identifier-column companion to
    * [[redactPii]]'s free-text redaction: replace each value with
    * sha256(key ":" value), so the same user keeps ONE stable
    * pseudonym across every table (joins and per-user analyses still
    * work) while linkage back to the identity requires the key.
    * Rotate the key → a fresh unlinkable pseudonym universe. Pure
    * scan-stage built-ins, engine-portable (DuckDB sha256 replays
    * it); at 100 TB this must be — and is — a map.
    */
  def pseudonymize(df: DataFrame, key: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    require(key.nonEmpty, "pseudonymize needs a non-empty key")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null).cast("string"))
          .otherwise(sha2(concat(lit(key), lit(":"), col(c).cast("string")), 256)))
    }
  }

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = piiPatterns.map { case (name, re, _) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
    }
    docs.select(col(idCol) +: counts :+ redactedText(col(textCol)).as("text_redacted"): _*)
  }

  /** Corpus-wide EXACT-PARAGRAPH dedup, keep-first (the
    * RefinedWeb/MassiveText paragraph pass — between document-level
    * exact dedup and span-level ExactSubstr in granularity): every
    * paragraph (blank-line-separated block) that appeared earlier in
    * the corpus — lower (doc, pos) lexicographically — is removed;
    * the first occurrence and all unique paragraphs survive in
    * order. Output: (id, text_clean, n_paras, n_dropped).
    *
    * Plan shape — built to survive the skew that paragraph dedup
    * EXISTS to fix: the paragraphs that dominate a web corpus are
    * universal boilerplate (cookie banners, license footers), so the
    * hot key is the expected case. Winners are decided by
    * `groupBy(p).agg(min(struct(id, pos)))` — partial-aggregatable,
    * so a paragraph present in every document combines map-side and
    * crosses the exchange as one row per map partition (a
    * `row_number` window keyed on `p`, the round-6 shape, put the
    * entire occurrence set of the hot key in ONE task, and AQE
    * cannot split a window partition the way it splits a skewed
    * join). Each occurrence then decides keep/drop by joining its
    * paragraph's winner back — an AQE-splittable equi-join — and one
    * groupBy(id) rebuilds. Paragraph text rides two exchanges, the
    * [[removeBoilerplateLines]] trade at paragraph granularity. For
    * corpora where even paragraphs must not shuffle, the hash-only
    * df + broadcast-set rebuild of [[Dedup.removeDuplicatedSpans]]
    * is the same operation one granularity down.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n{2,}", -1)).as(Seq("pos", "p")))
      .filter(trim(col("p")) =!= "")
    val winners = ex.groupBy("p")
      .agg(min(struct(col("id"), col("pos"))).as("w"))
    val kept = ex.join(winners, Seq("p"))
      .withColumn("keep",
        col("id") === col("w.id") && col("pos") === col("w.pos"))
    val rebuilt = kept
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
        concat_ws("\n\n",
          transform(array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("p"))))),
            s => s.getField("p"))).as("text_clean"))
    docs.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** HTML → text extraction — the stage-zero of every web corpus
    * (C4/RefinedWeb start from markup, not text). A regex-chain
    * extractor in the [[piiPatterns]] tradition: every pattern is
    * written in the Java∩RE2 common dialect so Spark and any
    * RE2-based engine (DuckDB included) transform identically —
    * engine-parity IS the contract, the oracle replays this chain.
    *
    *  1. drop `<script>`/`<style>` elements wholesale ((?is) — their
    *     text is code, not content), then comments and doctypes;
    *  2. closing block tags (p, div, headings, li, tr, br) become
    *     newlines so block structure survives as line structure;
    *  3. every remaining tag is stripped;
    *  4. the five HTML entities that appear in real text unescape
    *     (amp last, so `&amp;lt;` → `&lt;` stays escaped once — the
    *     standard single-pass order);
    *  5. whitespace normalizes: runs of spaces/tabs collapse, blank
    *     lines drop, edges trim.
    *
    * Pure `regexp_replace` built-ins — a zero-shuffle scan-stage map,
    * the only admissible shape for "parse 100 TB of crawl".
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val noDoctype = regexp_replace(noComment, "(?i)<!doctype[^>]*>", "")
    val blocks = regexp_replace(noDoctype,
      "(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|tr)>|<br[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val unesc = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, r)) =>
      // entity strings contain no regex metacharacters — usable as
      // patterns verbatim in both dialects
      regexp_replace(c, e, r)
    }
    val collapsed = regexp_replace(unesc, "[ \\t]+", " ")
    val trimmed = regexp_replace(collapsed, "(?m)^ +| +$", "")
    trim(regexp_replace(trimmed, "\\n{2,}", "\n"), "\n ")
  }

  /** Per-doc HTML extraction: (id, text, n_lines) — text is the
    * extracted content, n_lines its block-line count.
    */
  def extractHtml(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.TextFunctions.letBound(htmlToText(col(htmlCol))) { t =>
        struct(t.as("text"),
          when(t === "", lit(0L))
            .otherwise(size(split(t, "\n", -1)).cast("long")).as("n_lines"))
      }.as("__h"))
      .select(col("id"), col("__h.text").as("text"), col("__h.n_lines").as("n_lines"))

  /** Most-frequent-element count of a string array, computed as the
    * longest run in the sorted array — one `array_sort` + one linear
    * `aggregate` pass, no explode/shuffle, so the whole repetition
    * profile stays a scan-stage projection.
    */
  private def maxRunCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Repetition signals (the Gopher-style repetition filters a
    * training pipeline gates on — Rae et al. 2021, §A1.1): per doc,
    * the fraction of tokens taken by the single most frequent token,
    * the duplicate-bigram fraction, and the most-frequent-bigram
    * fraction. High values mark degenerate/templated text (keyword
    * stuffing, boilerplate loops) that survives length and stopword
    * gates.
    *
    * Everything is per-row array math (no explode, no shuffle): a
    * corpus-scale scan emits 4 numbers per document regardless of
    * document size.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(normalize(col(textCol)))
    val nTok = size(toks)
    val bigrams = when(nTok >= 2,
        zip_with(slice(toks, lit(1), nTok - 1), slice(toks, lit(2), nTok - 1),
          (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    val nBg = size(bigrams)
    val r4 = (c: Column) => round(c, 4) + lit(0.0)
    docs.select(
        col(idCol),
        nTok.cast("long").as("n_tokens"),
        r4(maxRunCount(toks) / nTok).as("top_token_frac"),
        when(nBg > 0, r4(lit(1) - size(array_distinct(bigrams)) / nBg))
          .as("dup_2gram_frac"),
        when(nBg > 0, r4(maxRunCount(bigrams) / nBg)).as("top_2gram_frac"))
      .orderBy(idCol)
  }

  /** COMPRESSION-RATIO quality signal: deflated bytes / raw UTF-8
    * bytes of the RAW text, rounded to 4. Both tails of the ratio are
    * the classic cheap pre-training gates: templated/repeated spam
    * compresses far below normal prose, near-random gibberish barely
    * compresses at all. One codegen'd scan-stage expression
    * ([[graft.functions.DeflateStats]]) — zero shuffle, O(bytes) per
    * row; the 100 TB shape is identical to the other scan-stage
    * scorers (score while reading, gate inline). Ratios are
    * deterministic for a fixed JDK zlib but are only ever COMPARED
    * within a run — gates plant both group variants rather than
    * pinning absolute ratios across zlib versions.
    * Output: (id, n_bytes, comp_bytes, ratio).
    */
  def compressionRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        graft.functions.SketchFunctions.deflate_stats(col(textCol)).as("__c"))
      .select(col("id"),
        col("__c.n_bytes").cast("long").as("n_bytes"),
        col("__c.comp_bytes").cast("long").as("comp_bytes"),
        (round(col("__c.comp_bytes") /
          greatest(col("__c.n_bytes"), lit(1)), 4) + lit(0.0)).as("ratio"))
      .orderBy("id")

  /** Fixed-size token-window CHUNKING with overlap — the
    * context-window preparation step (RAG indexing, long-doc training
    * prep): each document explodes into windows of `chunkTokens`
    * whitespace tokens advancing by `chunkTokens - overlap`, so
    * consecutive chunks share `overlap` tokens and no token is
    * dropped. The final window may be shorter; a doc shorter than one
    * window yields exactly one chunk. Empty/null texts yield none.
    *
    * Scan-stage explode (the token array is [[graft.functions.TextFunctions.letBound]]
    * — chunk construction references it per window): at 100 TB this
    * is a map whose output rows feed directly into partitioned writes
    * or the embedding kernel, no shuffle of its own.
    * Output: (id, chunk_id, n_tokens, chunk).
    */
  def chunk(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    val chunks = letBound(tokens(col(textCol))) { t =>
      val n = size(t)
      // number of windows: 1 + ceil(max(0, n - chunkTokens) / step),
      // guarded against Spark's descending sequence(1, stop<1)
      val nw = lit(1) + ceil(greatest(n - chunkTokens, lit(0)) / lit(step)).cast("int")
      when(n >= 1 && trim(col(textCol)) =!= "",
          transform(sequence(lit(0), nw - 1),
            w => array_join(slice(t, w * step + 1, lit(chunkTokens)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    docs.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(tokens(col("chunk"))).cast("long").as("n_tokens"), col("chunk"))
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

  /** Line-level BOILERPLATE removal (CCNet / RefinedWeb style): drop
    * every line that occurs in more than `maxDocFreq` distinct
    * documents — site-wide footers, cookie banners, nav text — while
    * keeping every other line in place, order and duplicates intact.
    *
    * Plan shape (the "train small, scrub 100 TB" split every scorer
    * here uses): pass 1 aggregates per-doc-distinct lines to doc
    * frequencies — the ONLY corpus shuffle, carrying (line, count)
    * with map-side combine — and collects just the frequent
    * survivors, which are SMALL by definition (boilerplate is what
    * repeats; `maxBoilerplate` guards the degenerate corpus where
    * everything does). Pass 2 rebuilds each document inside its scan
    * stage via the broadcast exact-membership set
    * ([[graft.functions.FilterBoilerplateLines]] — codegen'd, no
    * join, no second shuffle; PlanAuditSpec asserts the rebuild side
    * is exchange-free). Output: (id, text_clean, n_removed).
    */
  def removeBoilerplateLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Long,
      maxBoilerplate: Int = 1 << 20): DataFrame = {
    val bc = trainBoilerplateSet(docs, textCol, maxDocFreq, maxBoilerplate)
    docs
      .select(col(idCol).as("id"),
        graft.functions.SketchFunctions.filter_boilerplate_lines(col(textCol), bc).as("__f"))
      .select(col("id"), col("__f.clean").as("text_clean"),
        col("__f.n_removed").cast("long").as("n_removed"))
  }

  /** The frequent-line set behind [[removeBoilerplateLines]], exposed
    * so a STREAMING pipeline can train it once on the landed corpus
    * and scrub arriving batches against it
    * ([[graft.streaming.EventStream.cleanLines]]).
    *
    * OWNERSHIP: the returned `Broadcast` belongs to the caller. It is
    * reclaimed by the ContextCleaner once unreachable (the one-shot
    * batch path holds it only through the returned plan), but a
    * long-running STREAMING driver that RETRAINS periodically must
    * `destroy()` the previous handle when swapping in a new one —
    * otherwise each retrain leaks a set on the driver and every
    * executor for as long as the old handle stays referenced
    * (round-5 advice).
    */
  def trainBoilerplateSet(
      reference: DataFrame,
      textCol: String,
      maxDocFreq: Long,
      maxBoilerplate: Int = 1 << 20): org.apache.spark.broadcast.Broadcast[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]] = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val frequent = reference
      .select(explode(array_distinct(split(col(textCol), "\n", -1))).as("line"))
      .groupBy("line").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("line")
      .collect()
    require(frequent.length <= maxBoilerplate,
      s"${frequent.length} boilerplate lines exceed maxBoilerplate=$maxBoilerplate — " +
        "raise maxDocFreq (the corpus repeats more than boilerplate)")
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      frequent.length * 2)
    frequent.foreach(r =>
      set.add(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
    reference.sparkSession.sparkContext.broadcast(set)
  }

  /** WITHIN-document duplicate-line removal — the intra-doc half of
    * the RefinedWeb/CCNet line cleanup ([[removeBoilerplateLines]] is
    * the cross-doc half): each line keeps its FIRST occurrence, later
    * repeats are dropped, everything else stays in order. One
    * scan-stage codegen expression
    * ([[graft.functions.DedupLinesWithinDoc]] — no UDF, no shuffle,
    * nothing leaves the document), O(lines) per document via a
    * per-row hash set: the earlier `filter(.., array_position)`
    * lambda form was O(lines²) per document, which a pathological
    * many-line document could turn into a single stalled task
    * (round-5 advice). Output: (id, text_clean, n_removed).
    */
  def dedupLinesWithinDoc(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        graft.functions.SketchFunctions.dedup_lines_within_doc(col(textCol)).as("__d"))
      .select(col("id"), col("__d.clean").as("text_clean"),
        col("__d.n_removed").cast("long").as("n_removed"))

  /** BM25 keyword search (Robertson/Spärck Jones, the Lucene-style
    * `ln(1 + (N − df + ½)/(df + ½))` idf — always positive): top-N
    * documents for a bag of query terms. One corpus pass computes
    * (N, avgdl, per-term df) in a single aggregation COLLECTED to
    * literals (a handful of doubles — embedding them keeps the scoring
    * plan join-free; a broadcast cross join of the 1-row stats frame
    * plans as a nested-loop join, which the plan audit bans); scoring
    * is then pure scan-stage array math per document (a
    * `size(filter(tokens))` tf per term — terms are few), so the only
    * shuffle is the global top-N sort, whose volume the `score > 0`
    * filter cuts to matching docs only. Ordering is on the ROUNDED
    * score (ties by id) so ranks are reproducible across engines.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 100): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct.length == terms.length, "bm25 terms must be distinct")
    // per-term tf/idf terms inline into ONE scan expression — that is
    // the join-free plan's whole point, and it is sized for QUERY
    // terms (a handful), not a vocabulary. Past a few hundred terms
    // the generated expression tree degrades (codegen splits, then
    // JaninoRuntimeException-style failures) with an opaque error;
    // name the contract instead.
    require(terms.length <= 256,
      s"bm25 inlines per-term scoring into the scan plan — ${terms.length} terms " +
        "exceed the 256-term query contract; for vocabulary-scale scoring use an " +
        "explode + join on a term table instead")
    bm25WithStats(docs, idCol, textCol, terms,
      bm25Stats(docs, textCol, terms), k1, b, topN)
  }

  /** Corpus-level BM25 statistics: doc count, mean doc length, and
    * per-query-term document frequency — ONE tokenizing scan + agg.
    * These are a trained artifact of the corpus (deterministic per
    * (corpus, terms), independent of k1/b/topN), so a caller scoring
    * many queries — or the same query repeatedly — should compute
    * them once and pass them to [[bm25WithStats]] (the
    * DSIR/LM/codebook train-once convention); [[bm25]] recomputes
    * them per call.
    */
  final case class Bm25Stats(nDocs: Double, avgdl: Double, df: Map[String, Double])

  def bm25Stats(docs: DataFrame, textCol: String, terms: Seq[String]): Bm25Stats = {
    val base = docs.select(tokens(normalize(col(textCol))).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (avg(col("dl")).as("avgdl") +: dfCols): _*).collect().head
    val nDocs = stats.getDouble(0)
    Bm25Stats(nDocs,
      if (nDocs == 0.0) 0.0 else stats.getDouble(1),
      terms.zipWithIndex.map { case (t, i) =>
        t -> stats.getLong(2 + i).toDouble }.toMap)
  }

  /** BM25 scoring against precomputed [[Bm25Stats]] — one tokenizing
    * scan + the top-N sort, no stats job.
    */
  def bm25WithStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      stats: Bm25Stats,
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 100): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct.length == terms.length, "bm25 terms must be distinct")
    require(terms.length <= 256,
      s"bm25 inlines per-term scoring into the scan plan — ${terms.length} terms " +
        "exceed the 256-term query contract; for vocabulary-scale scoring use an " +
        "explode + join on a term table instead")
    require(terms.forall(stats.df.contains),
      s"stats are missing df for ${terms.filterNot(stats.df.contains)} — " +
        "compute bm25Stats over the same term list")
    val base = docs.select(col(idCol).as("id"),
        tokens(normalize(col(textCol))).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    // empty corpus: avgdl is degenerate and nothing can match
    if (stats.nDocs == 0.0)
      return base.select(col("id"), lit(0.0).as("score")).limit(0)
    val score = terms.map { t =>
      val tf = size(filter(col("toks"), x => x === t)).cast("double")
      val dfT = stats.df(t)
      val idf = math.log((stats.nDocs - dfT + 0.5) / (dfT + 0.5) + 1.0)
      lit(idf) * tf * lit(k1 + 1) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(stats.avgdl)))
    }.reduce(_ + _)
    base
      .select(col("id"), score.as("score"))
      .filter(col("score") > 0)
      .withColumn("score", round(col("score"), 4) + lit(0.0))
      .orderBy(col("score").desc, col("id").asc)
      .limit(topN)
  }

  /** Train a BPE vocabulary on a corpus: one distributed
    * word-frequency aggregation (capped at `maxWords` rows by
    * count-desc/word-asc — BPE statistics need only word counts, so
    * the driver loop is corpus-size-independent), then
    * [[graft.functions.BpeEncoder.trainMerges]]. Returns the ordered
    * merge list (index = rank).
    */
  def trainBpe(
      corpus: DataFrame, textCol: String,
      numMerges: Int = 200, maxWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 1 && maxWords >= 1)
    val wc = corpus
      .select(explode(tokens(normalize(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.BpeEncoder.trainMerges(wc, numMerges)
  }

  /** Apply a trained BPE vocabulary: (id, n_pieces, pieces) per doc.
    * The encoder broadcasts once; encoding is a scan-stage expression
    * ([[graft.functions.BpeEncode]]).
    */
  def bpePieces(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(
      graft.functions.BpeEncoder.fromMerges(merges))
    val pieces = graft.functions.Bpe.bpe_encode(tokens(normalize(col(textCol))), bc)
    docs.select(col(idCol).as("id"),
        pieces.as("pieces"))
      .select(col("id"), size(col("pieces")).cast("long").as("n_pieces"), col("pieces"))
      .orderBy("id")
  }

  /** Feature columns for [[trainQualityClassifier]]. */
  val qualityFeatureCols: Seq[String] =
    Seq("punct_ratio", "stop_ratio", "avg_word_len", "log_n_words")

  /** Raw (unrounded) per-document quality features for model-based
    * filtering — scan-stage column math, zero-guarded so empty/null
    * texts featurize to 0 instead of NaN.
    */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = tokens(t)
    val nToks = greatest(size(toks), lit(1)).cast("double")
    docs.select(col(idCol).as("id"),
      (regexp_count(t, lit("[^\\w\\s]")) / greatest(length(t), lit(1))).as("punct_ratio"),
      (tokenListCount(tokens(normalize(t)), langMarkers.head._2) / nToks).as("stop_ratio"),
      (aggregate(transform(toks, w => length(w)), lit(0), (acc, x) => acc + x) / nToks)
        .as("avg_word_len"),
      log1p(size(toks)).as("log_n_words"))
  }

  /** MODEL-BASED quality filtering, the GPT-3/CCNet pattern (public:
    * GPT-3 appendix A trains a classifier with curated text as
    * positives and raw crawl as negatives, then filters on its
    * score): train a logistic regression on the cheap scan-stage
    * features against weak labels. Training runs on the LABELED frame
    * (small — labels are expensive); scoring (the 100 TB side) does
    * NOT use the model object at all: [[scoreQualityModel]] extracts
    * the coefficients into a plain sigmoid Column expression, so the
    * whole-corpus pass is codegen'd scan-stage math with no UDF and
    * no per-row MLlib dispatch.
    *
    * `labeled` must carry `textCol` and a 0/1 `labelCol`.
    */
  def trainQualityClassifier(
      labeled: DataFrame, idCol: String, textCol: String, labelCol: String)
      : org.apache.spark.ml.classification.LogisticRegressionModel = {
    val feats = qualityFeatures(labeled, idCol, textCol)
      .join(labeled.select(col(idCol).as("id"), col(labelCol).cast("double").as("label")), Seq("id"))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(qualityFeatureCols.toArray).setOutputCol("features")
      .transform(feats)
    new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(100).setRegParam(0.01).setStandardization(true)
      .fit(assembled)
  }

  /** Score every document with a trained quality model:
    * (id, quality_prob) via the coefficient-inlined sigmoid — see
    * [[trainQualityClassifier]] for why no MLlib transform runs here.
    */
  def scoreQualityModel(
      docs: DataFrame, idCol: String, textCol: String,
      model: org.apache.spark.ml.classification.LogisticRegressionModel): DataFrame = {
    val ws = model.coefficients.toArray
    require(ws.length == qualityFeatureCols.length,
      s"model has ${ws.length} coefficients, expected ${qualityFeatureCols.length}")
    val margin = qualityFeatureCols.zip(ws)
      .map { case (c, w) => col(c) * lit(w) }
      .reduce(_ + _) + lit(model.intercept)
    qualityFeatures(docs, idCol, textCol)
      .withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-margin)))
      .select("id", "quality_prob")
  }

  /** Unigram language model trained on a reference corpus — the
    * CCNet-style perplexity filter's model side (Wenzek et al. 2020
    * score documents against a clean-corpus LM; public literature).
    * Add-one smoothing over the reference's token counts:
    *
    *   p(t) = (c_t + 1) / (N + V + 1)   for the top-`vocabSize` tokens
    *   p(oov) = 1 / (N + V + 1)
    *
    * where N = total reference tokens, V = distinct reference tokens
    * (cut tokens still count toward N and V — the cut changes only
    * which tokens keep a dedicated probability, so scores are
    * monotone in vocabSize and the uncut model is exactly add-one).
    * Returns the per-token COST map in bits (-log2 p) plus the OOV
    * cost. The training aggregation is one distributed token count;
    * only the top-V (count desc, token asc — deterministic) vocab is
    * collected, bounded by `vocabSize` regardless of corpus size.
    */
  def unigramModel(
      reference: DataFrame,
      textCol: String,
      vocabSize: Int = 1 << 20,
      requireUncut: Boolean = false): (java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double], Double) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    // persisted across the two actions (totals agg + top-V collect) —
    // otherwise the full reference-corpus token count runs twice
    val counts = reference
      .select(explode(tokens(normalize(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .persist()
    try {
      val Array(totals) = counts.agg(
        sum("c").as("n"), count(lit(1)).as("v")).collect()
      require(!totals.isNullAt(0), "unigramModel: reference corpus has no tokens")
      val n = totals.getLong(0); val v = totals.getLong(1)
      // oracle-parity guard (round-4 advisor): the text_perplexity
      // DuckDB oracle models the FULL reference vocabulary, which only
      // matches this model while no token is cut. The gate query opts
      // in; production callers scoring against a capped vocab don't.
      if (requireUncut) require(v <= vocabSize,
        s"unigramModel: $v distinct reference tokens exceed vocabSize=$vocabSize — " +
          "the uncut-vocabulary oracle no longer matches; raise vocabSize or drop the oracle row")
      val denom = (n + v + 1).toDouble
      val log2 = (x: Double) => math.log(x) / math.log(2.0)
      val vocab = counts.orderBy(col("c").desc, col("tok").asc).limit(vocabSize).collect()
      val map = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double](
        vocab.length * 2)
      vocab.foreach { r =>
        map.put(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
          java.lang.Double.valueOf(-log2((r.getLong(1) + 1).toDouble / denom)))
      }
      (map, -log2(1.0 / denom))
    } finally counts.unpersist()
  }

  /** Per-document bits/token under a broadcast [[unigramModel]] — the
    * perplexity-style quality score (low = fluent under the reference
    * distribution, high = noise/OOV soup). Zero shuffle: the model
    * broadcasts once and every document scores in its scan stage via
    * [[graft.functions.TokenNll]]; output is
    * (id, n_tokens, bits_per_token) with empty documents scoring
    * NULL bits. Perplexity = 2^bits if a caller wants it.
    */
  def unigramNll(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: (java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double], Double)): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model._1)
    val toks = tokens(normalize(col(textCol)))
    docs.select(col(idCol).as("id"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.SketchFunctions.token_nll(toks, bc, model._2).as("bits_per_token"))
      .orderBy("id")
  }

  /** Interpolated-BIGRAM language model trained on a reference corpus
    * — the n-gram upgrade of [[unigramModel]] (CCNet's actual filter
    * is a 5-gram KenLM; same family, two distributed counts instead
    * of one). Per-token probability while scoring:
    *
    *   p(t₁)        = p_uni(t₁)
    *   p(tᵢ | tᵢ₋₁) = λ·p_bi(tᵢ | tᵢ₋₁) + (1−λ)·p_uni(tᵢ)
    *
    * with p_uni add-one smoothed exactly as [[unigramModel]] and
    * p_bi = c(h,t)/Σc(h,·) the MLE conditional (unseen bigram → 0;
    * the unigram floor keeps the log finite, so no bigram smoothing
    * constant to tune). Training is two distributed counts (tokens,
    * space-joined 2-grams of
    * [[graft.functions.TextFunctions.wordGramsAll]] — the
    * WITH-multiplicity form: c(h,t) is how often the bigram was said,
    * not its doc frequency, so the distinct [[wordGrams]] would bias
    * every repeated bigram's conditional);
    * both collected sides are bounded — unigrams by `vocabSize`, the
    * bigram table by `maxBigrams` (top by count desc, gram asc,
    * deterministic). `requireUncut` opts the oracle gate into the
    * uncut-model guard, like [[unigramModel]]. Returns
    * (bigram prob map, unigram prob map, oov probability).
    */
  def bigramModel(
      reference: DataFrame,
      textCol: String,
      vocabSize: Int = 1 << 20,
      maxBigrams: Int = 1 << 22,
      requireUncut: Boolean = false): (
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double],
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double],
      Double) = {
    require(vocabSize >= 1 && maxBigrams >= 1)
    val toks = tokens(normalize(col(textCol)))
    // ONE training aggregation over the corpus (round-7 verdict #2):
    // unigrams and bigrams share the same scan+tokenize, so counting
    // them in two separate jobs paid the corpus read twice. The fused
    // pass explodes the concatenated gram arrays and groups once; the
    // split downstream is a filter on the CACHED |vocab|+|bigrams|
    // aggregate, not on the corpus. Disambiguation is structural:
    // tokens are whitespace-split, so a unigram can never contain the
    // ' ' every 2-gram carries.
    val grams = reference
      .select(explode(graft.functions.TextFunctions.letBound(toks) { t =>
        concat(wordGramsAll(t, 1), wordGramsAll(t, 2))
      }).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .persist()
    val uniCounts = grams.filter(!col("g").contains(" "))
      .select(col("g").as("tok"), col("c"))
    val biProbs = grams.filter(col("g").contains(" "))
      .withColumn("h", substring_index(col("g"), " ", 1))
      .withColumn("p", col("c") / sum("c").over(Window.partitionBy("h")))
    try {
      val Array(totals) = uniCounts.agg(
        sum("c").as("n"), count(lit(1)).as("v")).collect()
      require(!totals.isNullAt(0), "bigramModel: reference corpus has no tokens")
      val n = totals.getLong(0); val v = totals.getLong(1)
      if (requireUncut) {
        require(v <= vocabSize,
          s"bigramModel: $v distinct tokens exceed vocabSize=$vocabSize — uncut oracle breaks")
        val nBi = biProbs.count()
        require(nBi <= maxBigrams,
          s"bigramModel: $nBi distinct bigrams exceed maxBigrams=$maxBigrams — uncut oracle breaks")
      }
      val denom = (n + v + 1).toDouble
      val U = org.apache.spark.unsafe.types.UTF8String.fromString _
      val vocab = uniCounts.orderBy(col("c").desc, col("tok").asc).limit(vocabSize).collect()
      val uniMap = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double](
        vocab.length * 2)
      vocab.foreach(r => uniMap.put(U(r.getString(0)),
        java.lang.Double.valueOf((r.getLong(1) + 1).toDouble / denom)))
      val bigrams = biProbs.orderBy(col("c").desc, col("g").asc).limit(maxBigrams)
        .select("g", "p").collect()
      val biMap = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double](
        bigrams.length * 2)
      bigrams.foreach(r => biMap.put(U(r.getString(0)),
        java.lang.Double.valueOf(r.getDouble(1))))
      (biMap, uniMap, 1.0 / denom)
    } finally grams.unpersist()
  }

  /** Per-document bits/token under a broadcast [[bigramModel]] —
    * zero-shuffle scoring via [[graft.functions.TokenNll2]], same
    * 100 TB shape as [[unigramNll]] (train on the clean reference,
    * score the dirty corpus while reading it). `lambda` is the
    * bigram interpolation weight, required < 1 so the unigram floor
    * keeps every token's probability positive. Output:
    * (id, n_tokens, bits_per_token).
    */
  def bigramNll(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: (
          java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double],
          java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double],
          Double),
      lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0.0 && lambda < 1.0, s"lambda must be in [0, 1), got $lambda")
    val sc = docs.sparkSession.sparkContext
    val biBc = sc.broadcast(model._1)
    val uniBc = sc.broadcast(model._2)
    val toks = tokens(normalize(col(textCol)))
    docs.select(col(idCol).as("id"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.SketchFunctions.token_nll2(toks, biBc, uniBc, model._3, lambda)
          .as("bits_per_token"))
      .orderBy("id")
  }

  /** URL canonicalization — the first-stage key of every web-corpus
    * dedup (RefinedWeb/C4 dedupe by URL before any content pass):
    * lowercase scheme and host, strip a leading `www.`, drop default
    * ports (:80 http, :443 https), strip trailing slashes off the
    * path (bare or emptied path → `/`), drop the fragment, and keep
    * only non-tracking query params (`utm_*` and
    * empties dropped) SORTED so param order doesn't split a key.
    * Pure built-in column functions end to end — regexp parts +
    * array `filter`/`array_sort` — so the whole key derivation stays
    * inside whole-stage codegen and the only shuffle a URL-dedup pays
    * is its final groupBy on the canonical key.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val noSlash = regexp_replace(rawPath, "/+$", "")
    val path = when(noSlash === "", lit("/")).otherwise(noSlash)
    // query = between the FIRST '?' and the fragment, extracted from
    // the pre-fragment substring: a bare `\?([^#]*)` would match a
    // '?' living inside the fragment and resurrect it as a query
    // (http://h/p#sec?x=1 must canonicalize with no query at all)
    val rawQuery = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val query = concat_ws("&", params)
    when(scheme === "" || rawHost === "", lower(url)) // unparseable: degrade, don't null out
      .otherwise(concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** URL-keyed duplicate groups: canonicalize, group, keep groups of
    * ≥ 2 — the "same page fetched under tracking-param / www / port
    * variants" report. One shuffle (the groupBy on the canonical
    * key); min id is the kept representative, the rest are the drop
    * candidates. Output: (canon_url, n_docs, keep_id).
    */
  def urlDuplicates(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      // docs with NO url are not duplicates of each other — a null
      // key must not form a group
      .filter(col(urlCol).isNotNull)
      .select(col(idCol).as("id"), canonicalUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min("id").as("keep_id"))
      .filter(col("n_docs") >= 2)
      .orderBy("canon_url")

  /** Unicode NFC/NFKC normalization of a text column — the hygiene
    * pass every web pipeline runs BEFORE hashing/dedup (CCNet §3,
    * OSCAR): composed vs combining-mark spellings of the same glyph
    * ("é" U+00E9 vs "e"+U+0301) must not fingerprint as different
    * documents. Codegen'd expression with an `isNormalized`
    * zero-allocation fast path, so on a mostly-ASCII crawl the cost
    * is one scan per row inside the parquet scan stage — no shuffle.
    */
  def normalizeUnicode(textCol: Column, form: String = "NFC"): Column =
    graft.functions.NormalizeFunctions.unicode_normalize(textCol, form)

  /** Character-entropy quality signal:
    * (id, char_entropy bits, n_distinct_chars). Very high entropy =
    * binary/random spill; very low = repetition spam — both tails are
    * drop candidates (Gopher's frequency heuristics, char-level).
    * Single-pass codegen'd expression, scan stage, no shuffle.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = graft.functions.NormalizeFunctions.char_entropy_stats(col(textCol))
    docs.select(col(idCol).as("doc_id"), st.as("st"))
      .select(col("doc_id"),
        (round(col("st.entropy"), 4) + lit(0.0)).as("char_entropy"),
        col("st.n_distinct").cast("long").as("n_distinct_chars"))
      .orderBy("doc_id")
  }

  /** Mojibake repair (ftfy's core fix): text whose UTF-8 bytes were
    * once decoded as windows-1252 and re-encoded ("Ã©" → "é",
    * "â€”" → "—"). Applied only when the cp1252→UTF-8 round trip is
    * exact AND shrinks the string — the provable lossless case — so
    * clean text (and all-ASCII text, via a byte-scan fast path)
    * passes through untouched. Scan stage, no shuffle.
    */
  def fixMojibake(textCol: Column): Column =
    graft.functions.NormalizeFunctions.fix_mojibake(textCol)

  /** C4-style line-level cleanup (Raffel et al. 2020 §2.2, the
    * "colossal clean" rules, deterministic subset): keep a line only
    * if it (a) ends in terminal punctuation (. ! ? "), (b) has ≥
    * `minWords` words, (c) doesn't contain "lorem ipsum"
    * (case-insensitive), and (d) has no curly brace (code spill).
    * Output: (id, clean text, n_lines, n_kept, keep_doc = kept ≥ 3
    * lines — C4 drops pages with < 3 surviving sentences).
    * Pure built-in array functions (split / transform / filter) —
    * whole-stage codegen, scan stage, no shuffle.
    */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), c4Struct(col(textCol), minWords).as("c4"))
      .select(col("doc_id"), col("c4.clean").as("clean"),
        col("c4.n_lines").as("n_lines"), col("c4.n_kept").as("n_kept"),
        col("c4.keep_doc").as("keep_doc"))
      .orderBy("doc_id")

  /** Column form of the C4 rules — struct<clean, n_lines, n_kept,
    * keep_doc>. A pure projection, so it drops into a streaming
    * select unchanged (EventStream.hygiene reuses it verbatim).
    */
  def c4Struct(textCol: Column, minWords: Int = 3): Column = {
    val lines = transform(split(textCol, "\n"), l => trim(l))
    val keepLine = (l: Column) =>
      l.rlike("[.!?\"]$") &&
      size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWords &&
      !lower(l).contains("lorem ipsum") &&
      !l.contains("{")
    val kept = filter(lines, keepLine)
    struct(
      concat_ws("\n", kept).as("clean"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      (size(kept) >= 3).as("keep_doc"))
  }
}
