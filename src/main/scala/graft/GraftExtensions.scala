package graft

import graft.functions.{ArrayCosine, ArrayDot, ArrayEuclidean, CharEntropyStats, CharShingles, FixMojibake, SimHash64, UnicodeNormalize, WinnowFingerprints}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension — the standard way to enable graft's SQL surface
  * on any cluster without code changes:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * then `SELECT array_cosine(a.embedding, b.embedding) ...` works in
  * plain SQL (Thrift server, notebooks, `spark.sql`). The injected
  * functions are native codegen expressions, not UDFs, so they inline
  * into whole-stage codegen like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("array_dot", "array_dot(a, b) - dot product of two float/double arrays") {
      es => ArrayDot(es.head, es(1))
    }
    inject("array_cosine",
      "array_cosine(a, b) - cosine similarity; 0.0 when either norm <= 1e-10") {
      es => ArrayCosine(es.head, es(1))
    }
    inject("array_euclidean", "array_euclidean(a, b) - L2 distance (lower = more similar)") {
      es => ArrayEuclidean(es.head, es(1))
    }
    inject("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string> token multiset") {
      es => SimHash64(es.head)
    }
    // sketch constructors whose scalar parameters arrive as SQL
    // literals (the standard pattern for parameterized expressions)
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    inject("char_shingles",
      "char_shingles(text, n) - distinct character n-gram shingles, single pass") {
      es => CharShingles(es.head, intLit(es(1), "shingle length"))
    }
    inject("winnow_fingerprints",
      "winnow_fingerprints(text, k, w) - winnowing fingerprints (k-gram rolling hashes, window-w minima)") {
      es => WinnowFingerprints(es.head, intLit(es(1), "k"), intLit(es(2), "w"))
    }
    def strLit(e: Expression, what: String): String = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    inject("unicode_normalize",
      "unicode_normalize(text, 'NFC'|'NFKC'|'NFD'|'NFKD') - Unicode normalization") {
      es => UnicodeNormalize(es.head, strLit(es(1), "form"))
    }
    inject("char_entropy_stats",
      "char_entropy_stats(text) - struct<entropy: double, n_distinct: int> over codepoints") {
      es => CharEntropyStats(es.head)
    }
    inject("fix_mojibake",
      "fix_mojibake(text) - repair UTF-8 mis-decoded as windows-1252 (lossless provable case only)") {
      es => FixMojibake(es.head)
    }
    // aggregate: the analyzer wraps a bare AggregateFunction in an
    // AggregateExpression, so the builder returns it directly.
    // NOT named approx_top_k: Spark 4 ships a builtin of that name
    // (sketch-summable, but with no deterministic error bound in its
    // output) which wins name resolution over session extensions
    inject("mg_top_k",
      "mg_top_k(token, k, capacity) - Misra-Gries frequent items: struct<items: array<struct<token, est>>, max_err>") {
      es => graft.functions.MisraGriesAgg(es.head,
        intLit(es(1), "k"), intLit(es(2), "capacity"))
    }
  }
}
