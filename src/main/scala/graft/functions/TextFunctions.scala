package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators — built-in
  * (codegen'd) functions only, no UDFs, so they stay inside
  * whole-stage codegen and push into the scan stage. Every helper has
  * an exact DuckDB-SQL counterpart (documented inline) so oracle
  * parity holds: the data is ASCII, where Java and RE2 regex
  * semantics agree.
  */
object TextFunctions {

  /** lowercase, non-alphanumeric → space, trim.
    * DuckDB: trim(regexp_replace(lower(t), '[^a-z0-9]+', ' ', 'g'))
    */
  def normalize(t: Column): Column =
    trim(regexp_replace(lower(t), "[^a-z0-9]+", " "))

  /** whitespace tokens of trimmed text.
    * DuckDB: regexp_split_to_array(trim(t), '\s+')
    */
  def tokens(t: Column): Column = split(trim(t), "\\s+")

  /** character n-gram shingles (distinct), defined for any length ≥ 1
    * (texts shorter than n shingle to [t] itself).
    * DuckDB: list_distinct([t[i : i + n - 1] FOR i IN
    *           range(1, greatest(length(t) - n + 1, 1) + 1)])
    *
    * One single-pass codegen expression ([[graft.functions.CharShingles]]);
    * the composed-builtin form (`array_distinct(transform(sequence,
    * substr))`) computes the same set but rescans the string per
    * shingle for code-point offsets — O(chars²) per doc, which
    * dominated text dedup at the 200k-doc scale smoke.
    */
  def charShingles(t: Column, n: Int): Column =
    graft.functions.SketchFunctions.char_shingles(t, n)

  /** Evaluate `f` with `c` bound to a lambda variable — a SQL-level
    * `let`: `c` computes exactly ONCE per row no matter how many
    * times `f`'s body references it. Catalyst has no sharing
    * construct, and a higher-order-function lambda body RE-EVALUATES
    * every non-lambda-variable expression it references once per
    * produced element (the SURVEY §3 pitfall), so binding the shared
    * subtree structurally is the only way to pin its evaluation
    * count. Pure built-ins — no UDF.
    */
  def letBound(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** word n-gram shingles (distinct, space-joined) over the
    * whitespace tokens of normalized text; texts with fewer than n
    * tokens produce the empty list (NOT a short gram — a partial
    * n-gram can't witness an n-gram match).
    * DuckDB: list_distinct([array_to_string(tk[i : i + n - 1], ' ')
    *           FOR i IN range(1, greatest(len(tk) - n + 1, 0) + 1)])
    *
    * Two footguns handled here: Spark's `sequence(1, stop)` DESCENDS
    * when stop < 1 (sequence(1,0) = [1,0]), which would fabricate
    * grams for short texts, so the bound is guarded; and `toks` is
    * [[letBound]] — referenced bare from the transform lambda, the
    * whole tokenizer subtree would re-run once PER GRAM (measured 10×
    * on the decontamination scan at sf0.1).
    */
  def wordGrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    letBound(toks) { t =>
      when(size(t) >= n,
          array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
            i => array_join(slice(t, i, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
    }
  }

  /** word n-grams with MULTIPLICITY (every occurrence, in order) —
    * [[wordGrams]] without the `array_distinct`. Language-model
    * counts need occurrences (c(h,t) is how often the bigram was
    * SAID, not in how many docs it appears); dedup/decontamination
    * want the distinct form (a window matches or it doesn't).
    * DuckDB: [array_to_string(tk[i : i + n - 1], ' ')
    *           FOR i IN range(1, greatest(len(tk) - n + 1, 0) + 1)]
    */
  def wordGramsAll(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    letBound(toks) { t =>
      when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => array_join(slice(t, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
  }

  /** count of tokens from `list` present in `toks`.
    * DuckDB: len(list_filter(toks, x -> list_contains([...], x)))
    */
  def tokenListCount(toks: Column, list: Seq[String]): Column =
    size(filter(toks, x => array_contains(lit(list.toArray), x)))
}
