package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Document-sketch signatures as single-pass Catalyst expressions.
  *
  * Both sketches are pure per-row projections, so at scale they run in
  * the parquet scan stage: NO shuffle ever carries shingle or token
  * rows (SURVEY §4). The earlier formulation (explode + groupBy(id))
  * shuffled every (doc, shingle) pair; at 100 TB that shuffle would
  * dwarf the actual dedup joins.
  *
  * Hash seeds deliberately match Spark's built-ins (`hash()` = murmur3
  * seed 42, `xxhash64()` = xxh64 seed 42L) so signatures are
  * bit-identical to the composed-builtin formulation.
  */
object Sketch {
  /** uint32 murmur3 of a UTF8String — same value as Spark `hash(s)`
    * masked to 32 bits.
    */
  def murmurU32(s: UTF8String): Long =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong & 0xFFFFFFFFL

  /** xxh64 of a UTF8String — same value as Spark `xxhash64(s)`. */
  def xxh64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** Distinct character n-gram shingles of `t` in ONE pass — the
    * engine room of every text-dedup operator. Semantics identical to
    * `array_distinct(transform(sequence(1, max(len-n+1, 1)),
    * i -> substr(t, i, n)))` (first-occurrence order; a text shorter
    * than n, including "", shingles to [t] itself) — but O(bytes)
    * instead of O(chars²): the composed form rescans from the string
    * start on every `substr` to find the code-point offset, which
    * dominated the 200k-doc scale smoke. Code-point boundaries are
    * walked once; each shingle is one bounded byte copy.
    */
  /** Code-point start offsets of `bytes` (plus a final sentinel at
    * `bytes.length`); returns (starts, count). Boundaries delegate to
    * UTF8String's own lead-byte table so they — including its
    * treatment of INVALID lead bytes (continuation bytes advance 1) —
    * match `substr` exactly; a hand-rolled 2/3/4-byte ladder diverged
    * from the composed-builtin form on malformed UTF-8. Shared by
    * [[charShingles]] and [[Winnow.fingerprints]] so the two can never
    * disagree on where characters begin.
    */
  def codePointStarts(bytes: Array[Byte]): (Array[Int], Int) = {
    val len = bytes.length
    val starts = new Array[Int](len + 1)
    var nChars = 0
    var i = 0
    while (i < len) {
      starts(nChars) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    starts(nChars) = len
    (starts, nChars)
  }

  def charShingles(t: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = t.getBytes
    val (starts, nChars) = codePointStarts(bytes)
    val m = nChars - n + 1
    if (m < 1) return new GenericArrayData(Array[Any](t.clone()))
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val out = new java.util.ArrayList[UTF8String](m)
    var k = 0
    while (k < m) {
      val from = starts(k)
      val s = UTF8String.fromBytes(bytes, from, starts(k + n) - from)
      if (seen.add(s)) out.add(s)
      k += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03 — the MOSS algorithm; public literature): Rabin-Karp
  * ROLLING hash over character k-grams (base-B polynomial in 64-bit
  * wraparound arithmetic, each step O(1) — not a re-hash per gram),
  * then the minimum hash of every window of `w` consecutive k-gram
  * hashes is selected (rightmost minimum on ties), consecutive
  * duplicates collapsed. Guarantee (for texts of length ≥ k): any
  * shared substring of length ≥ w + k − 1 between two documents
  * yields at least one shared fingerprint, and no substring shorter
  * than k is detected. Texts SHORTER than k fall back to a single
  * whole-text fingerprint (tagged into a disjoint hash family so it
  * cannot collide with a k-gram hash) — identical short docs match,
  * nothing else about them does.
  * Output: array<long> of selected fingerprint hashes, in document
  * order. Operates on code points so multibyte text fingerprints
  * consistently.
  */
object Winnow {
  final val B = 1000003L // polynomial base (odd, large — 64-bit wraparound)
  /** xor-tag separating whole-short-text hashes from k-gram hashes. */
  final val ShortTextTag = 0x9E3779B97F4A7C15L

  def fingerprints(t: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = t.getBytes
    val (starts, nChars) = Sketch.codePointStarts(bytes)
    val m = nChars - k + 1
    if (m < 1) { // too short for one k-gram: fingerprint = hash of whole text
      return new GenericArrayData(Array[Any](Sketch.xxh64(t) ^ ShortTextTag))
    }
    // code point value at char index c (the polynomial symbol)
    def cp(c: Int): Long = {
      var v = 0L
      var j = starts(c)
      while (j < starts(c + 1)) { v = (v << 8) | (bytes(j) & 0xFF); j += 1 }
      v
    }
    // rolling k-gram hashes
    val hs = new Array[Long](m)
    var pow = 1L // B^(k-1)
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    var h = 0L
    var c = 0
    while (c < k) { h = h * B + cp(c); c += 1 }
    hs(0) = h
    var g = 1
    while (g < m) {
      h = (h - cp(g - 1) * pow) * B + cp(g + k - 1)
      hs(g) = h
      g += 1
    }
    // winnow: rightmost minimum of each window of w hashes
    val out = new java.util.ArrayList[Any]()
    var lastSel = -1
    var win = 0
    val nWin = math.max(m - w + 1, 1)
    val ww = math.min(w, m)
    while (win < nWin) {
      var best = win
      var x = win
      while (x < win + ww) {
        if (hs(x) <= hs(best)) best = x
        x += 1
      }
      if (best != lastSel) { out.add(hs(best)); lastSel = best }
      win += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Column form of [[Winnow.fingerprints]]. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
  override def prettyName: String = "winnow_fingerprints"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    Winnow.fingerprints(v.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Winnow.fingerprints($t, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column form of [[Sketch.charShingles]] — the per-row work is heavy
  * enough that codegen simply calls the shared helper.
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")
  override def prettyName: String = "char_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    Sketch.charShingles(v.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Sketch.charShingles($t, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

abstract class StringArraySketch extends UnaryExpression {
  protected def elemT: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemT == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
}

/** MinHash signature over a shingle set: `sig[p] = min over shingles of
  * (a_p · murmur32(s) + b_p) mod prime`. Output array<long>(numPerms);
  * an empty input yields the identity (all `prime`), which no
  * non-empty set produces. Multipliers < 2^30 keep a·h below 2^62 —
  * no overflow.
  *
  * The modulus MUST stay near 2^32 (it is 2^32 + 15): the universal
  * hash only mixes because a·h wraps the modulus many (up to a) times.
  * A "faster" large modulus (tried: Mersenne 2^61−1 with shift-add
  * fold) makes a·h+b wrap at most once for 32-bit h, so every
  * permutation's min degenerates to a monotone function of the doc's
  * minimum murmur value — unrelated docs collide into the same LSH
  * buckets at birthday rate (measured: 49k docs → 14k distinct sig
  * components, 3M false candidate pairs at 200k docs). The division
  * is NOT the hot path — shingle construction is ([[CharShingles]]).
  */
object MinHashPrime {
  final val prime = 4294967311L
}

case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long])
    extends StringArraySketch {
  require(as.length == bs.length && as.nonEmpty)
  private val numPerms = as.length
  final val prime = MinHashPrime.prime

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numPerms)(prime)
    var i = 0
    while (i < n) {
      val h = Sketch.murmurU32(arr.getUTF8String(i))
      var p = 0
      while (p < numPerms) {
        val x = (as(p) * h + bs(p)) % prime
        if (x < sig(p)) sig(p) = x
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("mhA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
      val Seq(sig, i, n, h, p, x, r) = Seq("sig", "i", "n", "h", "p", "x", "r").map(ctx.freshName)
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numPerms];
         |java.util.Arrays.fill($sig, ${prime}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = graft.functions.Sketch.murmurU32($a.getUTF8String($i));
         |  for (int $p = 0; $p < $numPerms; $p++) {
         |    long $x = ($aRef[$p] * $h + $bRef[$p]) % ${prime}L;
         |    if ($x < $sig[$p]) $sig[$p] = $x;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash banded-LSH hashes in one pass: the signature of
  * [[MinHashSignature]] chopped into `bands` equal blocks, each block
  * folded to one 64-bit hash (xxh64 chain, seed 42). Exists because
  * `posexplode` (GenerateExec) and lambda bodies re-evaluate their
  * input expression per produced row — referencing a sig column from
  * a collapsed projection recomputed normalize+shingle+minhash up to
  * `bands` times per document. One opaque expression is evaluated
  * exactly once per row.
  */
case class MinHashBandHashes(child: Expression, as: Array[Long], bs: Array[Long], bands: Int)
    extends StringArraySketch {
  require(as.length == bs.length && bands > 0 && as.length % bands == 0,
    "bands must divide numPerms")
  private val numPerms = as.length
  private val rpb = numPerms / bands
  final val prime = MinHashPrime.prime

  override def prettyName: String = "minhash_band_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numPerms)(prime)
    var i = 0
    while (i < n) {
      val h = Sketch.murmurU32(arr.getUTF8String(i))
      var p = 0
      while (p < numPerms) {
        val x = (as(p) * h + bs(p)) % prime
        if (x < sig(p)) sig(p) = x
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var bd = 0
    while (bd < bands) {
      var hh = 42L
      var r = 0
      while (r < rpb) {
        hh = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sig(bd * rpb + r), hh)
        r += 1
      }
      out(bd) = hh
      bd += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("mhA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
      val Seq(sig, i, n, h, p, x, fx, out, bd, r, hh) =
        Seq("sig", "i", "n", "h", "p", "x", "fx", "out", "bd", "r", "hh").map(ctx.freshName)
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numPerms];
         |java.util.Arrays.fill($sig, ${prime}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = graft.functions.Sketch.murmurU32($a.getUTF8String($i));
         |  for (int $p = 0; $p < $numPerms; $p++) {
         |    long $x = ($aRef[$p] * $h + $bRef[$p]) % ${prime}L;
         |    if ($x < $sig[$p]) $sig[$p] = $x;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $bd = 0; $bd < $bands; $bd++) {
         |  long $hh = 42L;
         |  for (int $r = 0; $r < $rpb; $r++)
         |    $hh = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($sig[$bd * $rpb + $r], $hh);
         |  $out[$bd] = $hh;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a token multiset (duplicates count): bit j of
  * the output is set iff tokens whose xxh64 has bit j set outnumber
  * those that don't (ties → set, matching `sum(±1) >= 0`).
  */
case class SimHash64(child: Expression) extends StringArraySketch {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = Sketch.xxh64(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) >= 0) out |= 1L << j; j += 1 }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val Seq(counts, i, n, h, j, out) =
        Seq("counts", "i", "n", "h", "j", "out").map(ctx.freshName)
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = graft.functions.Sketch.xxh64($a.getUTF8String($i));
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) if ($counts[$j] >= 0) $out |= 1L << $j;
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** |A ∩ B| for two SORTED, distinct array<string> columns via a linear
  * merge — replaces `size(array_intersect(...))`, whose per-row hash
  * set dominated the dedup verify stages. Sort once at set-build time
  * (`array_sort`), merge per candidate pair.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType

  private def elemT(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemT(left) == StringType && elemT(right) == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(n, m, i, j, c, cmp) = Seq("n", "m", "i", "j", "c", "cmp").map(ctx.freshName)
      s"""
         |int $n = $a.numElements(), $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Single-pass text-gate statistics: per-language marker-token counts
  * over NORMALIZED tokens plus the whitespace-token count — the exact
  * quantities `Curate`'s gates need, in one byte scan instead of two
  * regex tokenizer passes producing intermediate arrays.
  *
  * Semantics replicated bit-for-bit from the composed form:
  * - counts(i) = size(filter(split(trim(regexp_replace(lower(t),
  *   "[^a-z0-9]+", " ")), "\\s+"), x -> x IN markers(i))) — i.e.
  *   maximal lowercased [a-z0-9] runs, each occurrence counted.
  *   Multi-byte / non-ASCII bytes (> 0x7f) are never [a-z0-9], so the
  *   byte-level scan and the codepoint-level regex agree on run
  *   boundaries — EXCEPT the two Unicode codepoints whose lowercase
  *   IS an ASCII letter, which lower() maps into [a-z] before the
  *   regex runs: U+212A KELVIN SIGN → 'k', and U+0130 İ → 'i' +
  *   U+0307 (the combining dot then becomes a separator). (U+017F ſ
  *   is already lowercase — lower() leaves it non-ASCII, a
  *   separator.) The scan special-cases the two UTF-8 sequences so
  *   parity is exact on arbitrary Unicode, not just ASCII.
  * - n_words = size(split(trim(t), "\\s+")). Exact split semantics:
  *   Spark's split is Pattern.split(str, -1), which KEEPS leading and
  *   trailing empty fields, and trim removes ONLY spaces (0x20), not
  *   tabs/newlines — so field count = (maximal `\s`-run count in the
  *   space-trimmed string) + 1 ("" → 1, "\t\n" → 2, "a\t" → 2).
  * Marker words must be <= 8 ASCII bytes (packed into a long for the
  * comparison); the built-in marker lists are all <= 5.
  */
object LangStats {
  /** markers packed: one sorted long[] per language. */
  def pack(markers: Seq[Seq[String]]): Array[Array[Long]] =
    markers.map { ws =>
      val a = ws.map { w =>
        val b = w.getBytes("UTF-8")
        require(b.length >= 1 && b.length <= 8, s"marker '$w' must be 1-8 bytes")
        b.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xFFL))
      }.toArray
      java.util.Arrays.sort(a)
      a
    }.toArray

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def stats(t: UTF8String, packed: Array[Array[Long]]): InternalRow = {
    val bytes = t.getBytes
    val n = bytes.length
    val counts = new Array[Long](packed.length)
    // pass 1: lowercased [a-z0-9] runs, packed into a long while short
    // enough to possibly match a marker
    var i = 0
    var run = 0L
    var runLen = 0
    def flush(): Unit = {
      if (runLen >= 1 && runLen <= 8) {
        var l = 0
        while (l < packed.length) {
          if (java.util.Arrays.binarySearch(packed(l), run) >= 0) counts(l) += 1
          l += 1
        }
      }
      run = 0L; runLen = 0
    }
    def append(c: Byte): Unit = {
      if (runLen < 8) run = (run << 8) | (c & 0xFFL)
      runLen += 1
      if (runLen > 8) runLen = 9 // too long to match any packed marker
    }
    while (i < n) {
      var c = bytes(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { append(c); i += 1 }
      // the two codepoints lower() maps INTO ASCII [a-z] (scaladoc)
      else if (i + 2 < n && bytes(i) == 0xE2.toByte && bytes(i + 1) == 0x84.toByte &&
        bytes(i + 2) == 0xAA.toByte) { append('k'.toByte); i += 3 } // U+212A
      else if (i + 1 < n && bytes(i) == 0xC4.toByte && bytes(i + 1) == 0xB0.toByte) {
        append('i'.toByte); flush(); i += 2 // U+0130 → i + combining dot (separator)
      }
      else { flush(); i += 1 }
    }
    flush()
    // pass 2: split-field count of the space-trimmed string (see
    // scaladoc: fields = \s-run count + 1, empty fields included)
    var lo = 0
    var hi = n
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var sepRuns = 0L
    var inSep = false
    i = lo
    while (i < hi) {
      if (isWs(bytes(i))) { if (!inSep) sepRuns += 1; inSep = true }
      else inSep = false
      i += 1
    }
    val nWords = sepRuns + 1L
    new GenericInternalRow(Array[Any](new GenericArrayData(counts.map(x => x: Any)), nWords))
  }
}

/** Column form of [[LangStats.stats]]:
  * struct<counts: array<long>, n_words: long>.
  */
case class LangMarkerStats(child: Expression, markers: Seq[Seq[String]])
  extends UnaryExpression {
  override def prettyName: String = "lang_marker_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n_words", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  @transient private lazy val packed = LangStats.pack(markers)

  override def nullSafeEval(v: Any): Any =
    LangStats.stats(v.asInstanceOf[UTF8String], packed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packedMarkers", packed, "long[][]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.LangStats.stats($t, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Membership test against a BROADCAST Bloom filter (the landed
  * corpus's content-hash sketch). The expression holds only the
  * broadcast HANDLE — the filter's bytes ship to each executor once
  * via the broadcast machinery, never inside the task binary (a 1 GB
  * filter inside the expression tree would re-serialize per task).
  * Codegen'd. What the bloom buys (per Dedup.exactIncrementalBloom's
  * plan): the batch's definitely-new rows SKIP THE ANTI-JOIN PROBE
  * against the landed hash set — they are filtered out of the probe
  * side inside a scan-stage Filter. The batch's own within-batch
  * dedup window still sees every row (the bloom can't adjudicate
  * within-batch duplicates), so the exchange it pays is the batch's,
  * never the corpus's.
  *
  * Equivalence note: Spark's `BloomFilter.putString`/`mightContainString`
  * hash the UTF-8 bytes, so testing `UTF8String.getBytes` matches a
  * filter built by `DataFrameStatFunctions.bloomFilter` over the same
  * string column.
  */
case class BloomMightContain(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference as the concrete Broadcast class; value() is generic
    // (erased to Object), so the result needs an explicit cast for
    // janino to resolve mightContainBinary
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainBinary($c.getBytes())")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Average negative log2-likelihood (bits/token) of a token array
  * under a BROADCAST unigram language model — the CCNet-style
  * "perplexity against a reference corpus" quality signal, zero
  * shuffle: the vocab ships once per executor via the broadcast and
  * every document scores inside its scan stage. Tokens absent from
  * the vocab (and null elements) cost `oovNll` bits. Empty token
  * arrays score NULL (no evidence), matching SQL `avg` over zero
  * rows.
  */
case class TokenNll(
    tokens: Expression,
    vocab: org.apache.spark.broadcast.Broadcast[java.util.HashMap[UTF8String, java.lang.Double]],
    oovNll: Double) extends UnaryExpression {
  override def child: Expression = tokens
  override def prettyName: String = "token_nll"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      val map = vocab.value
      var i = 0; var sum = 0.0
      while (i < n) {
        if (arr.isNullAt(i)) sum += oovNll
        else {
          val nll = map.get(arr.getUTF8String(i))
          sum += (if (nll == null) oovNll else nll.doubleValue())
        }
        i += 1
      }
      sum / n
    }
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    val mapVar = ctx.addMutableState("java.util.HashMap", "tokenNllVocab",
      v => s"$v = (java.util.HashMap) $ref.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val Seq(n, i, sum, o) = Seq("n", "i", "sum", "o").map(ctx.freshName)
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($c.isNullAt($i)) { $sum += ${oovNll}D; } else {
         |      Object $o = $mapVar.get($c.getUTF8String($i));
         |      $sum += ($o == null) ? ${oovNll}D : ((java.lang.Double) $o).doubleValue();
         |    }
         |  }
         |  ${ev.value} = $sum / $n;
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

/** Byte-level line filter behind [[FilterBoilerplateLines]] — static
  * so codegen is a one-line call (the LangStats pattern).
  */
object LineFilter {
  /** Split `t` on '\n' (byte-safe: 0x0A can't occur inside a UTF-8
    * multi-byte sequence), drop lines present in `set`, re-join the
    * survivors with '\n'. Returns struct(clean, n_removed). An empty
    * input is one empty line — same contract as SQL string_split.
    */
  def filter(t: UTF8String, set: java.util.HashSet[UTF8String]): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = t.getBytes
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(n)
    var removed = 0
    var kept = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        val line = UTF8String.fromBytes(bytes, start, i - start)
        if (set.contains(line)) removed += 1
        else {
          if (kept > 0) out.write('\n')
          out.write(bytes, start, i - start)
          kept += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(out.toByteArray), removed))
  }
}

/** Byte-level keep-first line scan behind [[DedupLinesWithinDoc]] —
  * static so codegen is a one-line call (the LineFilter pattern).
  */
object LineKeepFirst {
  /** Split `t` on '\n' (byte-safe), keep each line's FIRST occurrence,
    * drop later repeats, re-join survivors with '\n' — O(lines) via a
    * per-row HashSet, replacing the `filter(.., array_position)`
    * lambda whose O(lines²) scan could stall a task on a pathological
    * many-line document (round-5 advice). Returns
    * struct(clean, n_removed).
    */
  def keepFirst(t: UTF8String): InternalRow = {
    val bytes = t.getBytes
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(n)
    val seen = new java.util.HashSet[UTF8String]()
    var removed = 0
    var kept = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        val line = UTF8String.fromBytes(bytes, start, i - start)
        if (!seen.add(line)) removed += 1
        else {
          if (kept > 0) out.write('\n')
          out.write(bytes, start, i - start)
          kept += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(out.toByteArray), removed))
  }
}

/** Scan-stage WITHIN-document duplicate-line removal (keep-first,
  * order intact) — the intra-doc half of the RefinedWeb/CCNet line
  * cleanup. Output: struct<clean: string, n_removed: int>.
  */
case class DedupLinesWithinDoc(child: Expression) extends UnaryExpression {
  override def prettyName: String = "dedup_lines_within_doc"
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    LineKeepFirst.keepFirst(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LineKeepFirst.keepFirst($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-level duplicated-span scrub behind [[RemoveDupSpans]] —
  * static so codegen is a one-line call (the LineFilter pattern).
  */
object SpanScrub {
  /** `t` is NORMALIZED text (single-space separated). Every token
    * covered by ANY L-token window present in `set` is dropped; the
    * survivors re-join with ' '. Window strings are rebuilt with a
    * reused builder — O(tokens·L) bytes hashed per document, the
    * honest cost of exact string membership (a rolling-hash prefilter
    * would still need the string to confirm). Returns
    * struct(clean, n_tokens, n_dropped).
    */
  def scrub(t: UTF8String, l: Int, set: java.util.HashSet[UTF8String]): InternalRow = {
    val s = t.toString
    val toks = s.split(" ", -1)
    val n = toks.length
    if (n < l || set.isEmpty)
      return new GenericInternalRow(Array[Any](t, n, 0))
    val covered = new Array[Boolean](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + l <= n) {
      sb.setLength(0)
      var j = 0
      while (j < l) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      if (set.contains(UTF8String.fromString(sb.toString))) {
        var c = i; while (c < i + l) { covered(c) = true; c += 1 }
      }
      i += 1
    }
    val out = new java.lang.StringBuilder(s.length)
    var kept = 0
    var dropped = 0
    i = 0
    while (i < n) {
      if (covered(i)) dropped += 1
      else { if (kept > 0) out.append(' '); out.append(toks(i)); kept += 1 }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(out.toString), n, dropped))
  }
}

/** Scan-stage duplicated-span removal (the ExactSubstr rebuild pass):
  * drop every token covered by an L-token window in the BROADCAST
  * duplicated-window set. Like [[FilterBoilerplateLines]], the
  * expression holds only the broadcast handle and membership is
  * EXACT. Output: struct<clean: string, n_tokens: int, n_dropped: int>.
  */
case class RemoveDupSpans(
    child: Expression,
    l: Int,
    wins: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]])
    extends UnaryExpression {
  override def prettyName: String = "remove_dup_spans"
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    SpanScrub.scrub(v.asInstanceOf[UTF8String], l, wins.value)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winsBc", wins,
      "org.apache.spark.broadcast.Broadcast")
    val setVar = ctx.addMutableState("java.util.HashSet", "dupWins",
      v => s"$v = (java.util.HashSet) $ref.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanScrub.scrub($c, $l, $setVar);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deflate size probe behind [[DeflateStats]] — static for codegen. */
object DeflateProbe {
  /** raw UTF-8 length + deflate(default level, raw mode) output length.
    * Deterministic for a fixed JDK zlib level/strategy — ratios are
    * compared WITHIN a run (gates plant both group variants), never
    * pinned as absolute constants across JVM versions.
    */
  def stats(t: UTF8String): InternalRow = {
    val bytes = t.getBytes
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      new GenericInternalRow(Array[Any](bytes.length, total.toInt))
    } finally d.end()
  }
}

/** Scan-stage compression probe: struct<n_bytes: int, comp_bytes: int>
  * of the UTF-8 text under raw deflate. The compression RATIO is the
  * classic cheap quality signal (used alongside the Gopher gates):
  * near-random gibberish compresses badly, templated/repetitive spam
  * compresses extremely well — both tails are worth gating before
  * training. Zero shuffle; the deflate cost is O(bytes) per row and
  * stays in the scan stage.
  */
case class DeflateStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "deflate_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("comp_bytes", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    DeflateProbe.stats(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateProbe.stats($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Interpolated-bigram scoring loop behind [[TokenNll2]] — static so
  * codegen is a one-line call (the LineKeepFirst pattern).
  */
object BigramScore {
  /** Average bits/token of `arr` under λ·p_bi + (1−λ)·p_uni.
    * `uni` maps token → PROBABILITY (add-one smoothed); `bi` maps the
    * space-joined bigram "head tail" → MLE conditional probability
    * c(h,t)/Σ_t c(h,·). The first token (no left context) and any
    * token after a null scores unigram-only; unseen bigrams
    * contribute 0 to the interpolation (the unigram floor keeps the
    * log finite — λ < 1 is required by the caller). Empty arrays
    * score null, matching SQL `avg` over zero rows.
    */
  def score(
      arr: ArrayData,
      bi: java.util.HashMap[UTF8String, java.lang.Double],
      uni: java.util.HashMap[UTF8String, java.lang.Double],
      oovProb: Double,
      lambda: Double): Any = {
    val n = arr.numElements()
    if (n == 0) return null
    // -log(p)/log(2), matching unigramModel's bit convention (and the
    // DuckDB oracle's log2) to the ulp behavior that already
    // round-trips the text_perplexity gate
    val ln2 = math.log(2.0)
    var sum = 0.0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { sum += -math.log(oovProb) / ln2; prev = null }
      else {
        val tok = arr.getUTF8String(i)
        val up = uni.get(tok)
        val puni = if (up == null) oovProb else up.doubleValue()
        val p =
          if (prev == null) puni
          else {
            val bp = bi.get(UTF8String.fromString(prev.toString + " " + tok.toString))
            lambda * (if (bp == null) 0.0 else bp.doubleValue()) + (1.0 - lambda) * puni
          }
        sum += -math.log(p) / ln2
        prev = tok
      }
      i += 1
    }
    java.lang.Double.valueOf(sum / n)
  }
}

/** Average bits/token under a BROADCAST interpolated-bigram language
  * model — the n-gram upgrade of [[TokenNll]] (CCNet filters with a
  * 5-gram KenLM; a bigram with unigram backoff is the same family,
  * built from two distributed counts). Zero shuffle at scoring time:
  * both maps ship once per executor and every document scores inside
  * its scan stage.
  */
case class TokenNll2(
    tokens: Expression,
    bi: org.apache.spark.broadcast.Broadcast[java.util.HashMap[UTF8String, java.lang.Double]],
    uni: org.apache.spark.broadcast.Broadcast[java.util.HashMap[UTF8String, java.lang.Double]],
    oovProb: Double,
    lambda: Double) extends UnaryExpression {
  override def child: Expression = tokens
  override def prettyName: String = "token_nll2"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    BigramScore.score(v.asInstanceOf[ArrayData], bi.value, uni.value, oovProb, lambda)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val biRef = ctx.addReferenceObj("biBc", bi,
      "org.apache.spark.broadcast.Broadcast")
    val uniRef = ctx.addReferenceObj("uniBc", uni,
      "org.apache.spark.broadcast.Broadcast")
    val biVar = ctx.addMutableState("java.util.HashMap", "biMap",
      v => s"$v = (java.util.HashMap) $biRef.value();")
    val uniVar = ctx.addMutableState("java.util.HashMap", "uniMap",
      v => s"$v = (java.util.HashMap) $uniRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      val o = ctx.freshName("o")
      s"""
         |Object $o = graft.functions.BigramScore.score($c, $biVar, $uniVar, ${oovProb}D, ${lambda}D);
         |if ($o == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $o).doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

/** Scan-stage line-level boilerplate removal: drop every line of the
  * text that appears in the BROADCAST frequent-line set (the
  * CCNet/RefinedWeb "remove lines shared by many documents" op).
  * Like [[BloomMightContain]], the expression holds only the
  * broadcast handle — the set ships once per executor — and unlike a
  * bloom filter membership is EXACT (a false positive would delete a
  * good line). Output: struct<clean: string, n_removed: int>.
  */
case class FilterBoilerplateLines(
    child: Expression,
    lines: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]])
    extends UnaryExpression {
  override def prettyName: String = "filter_boilerplate_lines"
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    LineFilter.filter(v.asInstanceOf[UTF8String], lines.value)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("linesBc", lines,
      "org.apache.spark.broadcast.Broadcast")
    val setVar = ctx.addMutableState("java.util.HashSet", "boilerLines",
      v => s"$v = (java.util.HashSet) $ref.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LineFilter.filter($c, $setVar);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchFunctions {
  import ColumnBridge.{column => C, expression => E}

  def char_shingles(t: Column, n: Int): Column = C(CharShingles(E(t), n))
  def winnow_fingerprints(t: Column, k: Int, w: Int): Column =
    C(WinnowFingerprints(E(t), k, w))
  def minhash_signature(shingles: Column, as: Array[Long], bs: Array[Long]): Column =
    C(MinHashSignature(E(shingles), as, bs))
  def minhash_band_hashes(shingles: Column, as: Array[Long], bs: Array[Long], bands: Int): Column =
    C(MinHashBandHashes(E(shingles), as, bs, bands))
  def simhash64(tokens: Column): Column = C(SimHash64(E(tokens)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    C(SortedIntersectCount(E(a), E(b)))
  def lang_marker_stats(t: Column, markers: Seq[Seq[String]]): Column =
    C(LangMarkerStats(E(t), markers))
  def token_nll(
      tokens: Column,
      vocab: org.apache.spark.broadcast.Broadcast[java.util.HashMap[UTF8String, java.lang.Double]],
      oovNll: Double): Column =
    C(TokenNll(E(tokens), vocab, oovNll))
  def token_nll2(
      tokens: Column,
      bi: org.apache.spark.broadcast.Broadcast[java.util.HashMap[UTF8String, java.lang.Double]],
      uni: org.apache.spark.broadcast.Broadcast[java.util.HashMap[UTF8String, java.lang.Double]],
      oovProb: Double,
      lambda: Double): Column =
    C(TokenNll2(E(tokens), bi, uni, oovProb, lambda))
  def bloom_might_contain(
      c: Column,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    C(BloomMightContain(E(c), bloom))
  def filter_boilerplate_lines(
      c: Column,
      lines: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]]): Column =
    C(FilterBoilerplateLines(E(c), lines))
  def dedup_lines_within_doc(c: Column): Column = C(DedupLinesWithinDoc(E(c)))
  def remove_dup_spans(
      c: Column,
      l: Int,
      wins: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]]): Column =
    C(RemoveDupSpans(E(c), l, wins))
  def deflate_stats(c: Column): Column = C(DeflateStats(E(c)))
}
