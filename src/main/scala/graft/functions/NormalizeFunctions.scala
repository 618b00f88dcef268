package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene for web-crawl corpora, as single-pass codegen'd
  * scan-stage expressions (the CCNet/OSCAR preprocessing front door):
  *
  *  - [[UnicodeNormalize]] — NFC/NFKC/NFD/NFKD normalization. Every
  *    serious pipeline canonicalizes before hashing/dedup, otherwise
  *    "é" (U+00E9) and "e"+U+0301 fingerprint as different documents.
  *  - [[CharEntropyStats]] — character-level Shannon entropy +
  *    distinct-char count, a gibberish/binary-spill quality signal.
  *  - [[FixMojibake]] — repairs UTF-8 text that was mis-decoded as
  *    windows-1252 and re-encoded ("Ã©" → "é"), the classic ftfy
  *    fix, restricted to the lossless provable case.
  *
  * All three are per-row projections: at 100 TB they run inside the
  * parquet scan with whole-stage codegen; no shuffle ever carries the
  * text (same contract as the sketch expressions in this package).
  */
object UnicodeNorm {
  // Declaration order of java.text.Normalizer.Form: NFD, NFC, NFKD, NFKC.
  private val forms = java.text.Normalizer.Form.values()

  def formIndex(name: String): Int = {
    val f = java.text.Normalizer.Form.valueOf(name.toUpperCase)
    forms.indexOf(f)
  }

  /** Normalize to the given form. Fast path: `isNormalized` scans
    * without allocating — on mostly-ASCII corpora (quick-check YES)
    * the common row costs one pass and zero copies.
    */
  def normalize(s: UTF8String, formIdx: Int): UTF8String = {
    val str = s.toString
    val f = forms(formIdx)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** Scan-stage Unicode normalization. `form` ∈ NFC|NFKC|NFD|NFKD. */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  private val formIdx = UnicodeNorm.formIndex(form)
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.normalize(v.asInstanceOf[UTF8String], formIdx)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNorm.normalize($c, $formIdx);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codepoint-frequency entropy behind [[CharEntropyStats]] — static so
  * codegen is a one-line call (the LineFilter pattern).
  */
object CharEntropyCalc {
  /** Shannon entropy (bits) of the codepoint distribution + distinct
    * codepoint count, one pass. Matches DuckDB's `entropy()` aggregate
    * over per-character rows: -Σ p·log2(p), empty string → 0.0.
    */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val c = counts.get(cp)
      if (c == null) counts.put(cp, Array(1)) else c(0) += 1
    }
    var h = 0.0
    if (n > 0) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next()(0).toDouble / n
        h -= p * (Math.log(p) / Math.log(2.0))
      }
    }
    new GenericInternalRow(Array[Any](h, counts.size()))
  }
}

/** Scan-stage char-entropy quality signal:
  * struct<entropy: double, n_distinct: int>. High-entropy rows are
  * random/binary spill; very-low-entropy rows are repetition spam —
  * both ends are drop candidates in a quality gate.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_entropy_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("entropy", DoubleType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    CharEntropyCalc.stats(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyCalc.stats($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** windows-1252 double-encoding repair behind [[FixMojibake]]. */
object MojibakeRepair {
  private val cp1252 = Charset.forName("windows-1252")

  /** Repair text whose UTF-8 bytes were once decoded as windows-1252
    * and re-encoded as UTF-8 ("Ã©" for "é", "â€”" for "—"). The fix
    * re-encodes through cp1252 and re-decodes strict UTF-8; it is
    * applied ONLY when both conversions are exact (no unmappable
    * chars, no malformed sequences), so a false positive requires a
    * document that legitimately spells a valid multi-byte UTF-8
    * sequence in cp1252 high-range letters — the same provable-case
    * restriction ftfy's default mode uses. Up to two rounds handles
    * the doubly-mangled case; all-ASCII rows exit on a scan.
    *
    * Repair is PER LINE: one non-cp1252-encodable char (an emoji, a
    * CJK quote, a combining mark) must not veto repair of mangled
    * segments elsewhere in the doc — mixed-content pages are the
    * common case in a crawl. Splitting on '\n' is lossless for this
    * transform because UTF-8 continuation bytes are ≥ 0x80, so no
    * mangled multi-byte sequence can span a newline.
    */
  def fix(s: UTF8String): UTF8String = {
    // fast path: pure-ASCII bytes cannot be mojibake
    val bytes = s.getBytes
    var ascii = true
    var j = 0
    while (ascii && j < bytes.length) { if (bytes(j) < 0) ascii = false; j += 1 }
    if (ascii) return s

    val lines = s.toString.split("\n", -1)
    var changed = false
    var i = 0
    while (i < lines.length) {
      val repaired = fixSegment(lines(i))
      if (repaired ne lines(i)) { lines(i) = repaired; changed = true }
      i += 1
    }
    if (changed) UTF8String.fromString(lines.mkString("\n")) else s
  }

  /** Up-to-two-round repair of one newline-free segment; returns the
    * same object when nothing provably repairs (ASCII exits early).
    */
  private def fixSegment(seg: String): String = {
    var k = 0
    var segAscii = true
    while (segAscii && k < seg.length) { if (seg.charAt(k) >= 0x80) segAscii = false; k += 1 }
    if (segAscii) return seg
    var cur = seg
    var changed = false
    var rounds = 0
    var continue = true
    while (continue && rounds < 2) {
      val repaired = repairOnce(cur)
      if (repaired == null || repaired == cur) continue = false
      else { cur = repaired; changed = true; rounds += 1 }
    }
    if (changed) cur else seg
  }

  /** One repair round; null when the text is not provably mojibake. */
  private def repairOnce(str: String): String = {
    val enc = cp1252.newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val b: ByteBuffer = enc.encode(java.nio.CharBuffer.wrap(str))
      val out = dec.decode(b).toString
      // require the repair to SHRINK (mojibake always does: k-byte
      // sequences collapse to one char) — guards pathological cycles
      if (out.length < str.length) out else null
    } catch {
      case _: CharacterCodingException => null
    }
  }
}

/** Scan-stage mojibake repair: the repaired string (identical object
  * when no provable repair applies).
  */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def prettyName: String = "fix_mojibake"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    MojibakeRepair.fix(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MojibakeRepair.fix($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeFunctions {
  import ColumnBridge.{column => C, expression => E}

  def unicode_normalize(t: Column, form: String): Column =
    C(UnicodeNormalize(E(t), form))
  def char_entropy_stats(t: Column): Column = C(CharEntropyStats(E(t)))
  def fix_mojibake(t: Column): Column = C(FixMojibake(E(t)))
}
