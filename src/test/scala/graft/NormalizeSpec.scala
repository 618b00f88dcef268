package graft

import graft.functions.{CharEntropyStats, FixMojibake, MojibakeRepair, NormalizeFunctions, UnicodeNormalize}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.create("local[4]", 4)
  import spark.implicits._

  // -------- Unicode normalization --------

  test("NFC composes combining marks; NFKC also folds compat chars; idempotent") {
    val df = Seq(
      (1L, "cafe\u0301"),        // e + combining acute -> é
      (2L, "A\u030A"),           // A + combining ring -> Å
      (3L, "ﬁx"),           // fi ligature: NFC keeps, NFKC folds to "fix"
      (4L, "plain ascii")).toDF("id", "t")
    val out = df.select(col("id"),
        TextAnalysis.normalizeUnicode(col("t"), "NFC").as("nfc"),
        TextAnalysis.normalizeUnicode(col("t"), "NFKC").as("nfkc"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L) == (("café", "café")))
    assert(out(2L) == (("Å", "Å")))
    assert(out(3L) == (("ﬁx", "fix")))
    assert(out(4L) == (("plain ascii", "plain ascii")))
    // idempotence: normalizing the normalized form is identity
    val twice = df.select(TextAnalysis.normalizeUnicode(
      TextAnalysis.normalizeUnicode(col("t"), "NFC"), "NFC").as("x"),
      TextAnalysis.normalizeUnicode(col("t"), "NFC").as("y"))
      .collect()
    assert(twice.forall(r => r.getString(0) == r.getString(1)))
  }

  test("NFD decomposes; null text passes through null-safe") {
    val df = Seq((1L, "café"), (2L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select(col("id"),
        TextAnalysis.normalizeUnicode(col("t"), "NFD").as("nfd"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("cafe\u0301"))
    assert(out(2L).isEmpty)
  }

  // -------- char entropy --------

  test("char entropy: hand-computed values, empty/single/uniform, supplementary chars") {
    val df = Seq(
      (1L, "aabbc"),     // -(0.4lg0.4*2 + 0.2lg0.2) = 1.521928...
      (2L, ""),          // empty -> 0 bits, 0 distinct
      (3L, "zzzz"),      // single symbol -> 0 bits, 1 distinct
      (4L, "abcd"),      // uniform 4 -> exactly 2 bits
      (5L, "😀😀a")) // 2x emoji (surrogate PAIR = ONE codepoint) + a
      .toDF("doc_id", "t")
    val out = TextAnalysis.charEntropy(df, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1.5219, 3L)))
    assert(out(2L) == ((0.0, 0L)))
    assert(out(3L) == ((0.0, 1L)))
    assert(out(4L) == ((2.0, 4L)))
    // 😀×2 + a: n=3 codepoints (not 5 UTF-16 units) ->
    // -(2/3·lg(2/3) + 1/3·lg(1/3)) = 0.9183, distinct 2
    assert(out(5L) == ((0.9183, 2L)))
  }

  // -------- mojibake --------

  test("mojibake: classic cp1252 mis-decode repairs exactly") {
    val clean = "café — “naïve ñ ü …"
    val mangled = new String(clean.getBytes("UTF-8"), "windows-1252")
    assert(mangled != clean)
    val out = Seq((1L, mangled)).toDF("id", "t")
      .select(TextAnalysis.fixMojibake(col("t"))).as[String].head()
    assert(out == clean)
  }

  test("mojibake: double-mangled text repairs in two rounds") {
    val clean = "naïve café"
    val once = new String(clean.getBytes("UTF-8"), "windows-1252")
    val twice = new String(once.getBytes("UTF-8"), "windows-1252")
    val out = Seq((1L, twice)).toDF("id", "t")
      .select(TextAnalysis.fixMojibake(col("t"))).as[String].head()
    assert(out == clean)
  }

  test("mojibake: clean text (ASCII and real accents) is untouched") {
    // "café" encodes to cp1252 fine (é -> 0xE9) but 0xE9 + ' ' is NOT
    // valid UTF-8, so the strict decode refuses — no false repair
    for (s <- Seq("plain ascii text", "café au lait", "ééé"))
      assert(Seq((1L, s)).toDF("id", "t")
        .select(TextAnalysis.fixMojibake(col("t"))).as[String].head() == s)
  }

  test("mojibake: cp1252-unencodable text (CJK, emoji) passes through") {
    for (s <- Seq("日本語 text", "emoji 😀 here"))
      assert(Seq((1L, s)).toDF("id", "t")
        .select(TextAnalysis.fixMojibake(col("t"))).as[String].head() == s)
  }

  test("mojibake: mixed doc — ASCII body with a mangled suffix repairs the suffix only") {
    val clean = "header line ok café — end"
    val mangled = new String(clean.getBytes("UTF-8"), "windows-1252")
    val out = Seq((1L, mangled)).toDF("id", "t")
      .select(TextAnalysis.fixMojibake(col("t"))).as[String].head()
    assert(out == clean)
  }

  test("mojibake: repair is per line — an emoji/CJK line does not veto the mangled line") {
    val clean = "café — naïve suffix sentence here."
    val mangled = new String(clean.getBytes("UTF-8"), "windows-1252")
    // U+0301 (combining mark), emoji, CJK: all cp1252-unencodable —
    // under whole-string repair any of these would block the fix
    val doc = "ascii header line\n" + mangled + "\ncafé stays\n😀 emoji\n中文 line"
    val out = Seq((1L, doc)).toDF("id", "t")
      .select(TextAnalysis.fixMojibake(col("t"))).as[String].head()
    assert(out == "ascii header line\n" + clean + "\ncafé stays\n😀 emoji\n中文 line")
  }

  test("mojibake: a truncated mangled tail fails the strict decode and stays untouched") {
    // chop the final byte of a mangled sequence: the cp1252 re-encode
    // then yields an invalid UTF-8 tail, the strict decoder REPORTs,
    // and the provable-case rule keeps the text as-is (no partial fix)
    val clean = "café"
    val mangled = new String(clean.getBytes("UTF-8"), "windows-1252")
    val truncated = mangled.substring(0, mangled.length - 1)
    val out = Seq((1L, "body " + truncated)).toDF("id", "t")
      .select(TextAnalysis.fixMojibake(col("t"))).as[String].head()
    assert(out == "body " + truncated)
  }

  // -------- C4 line filter --------

  test("c4 line filter: each rule drops exactly its line; keep_doc at the 3-line bar") {
    val text = Seq(
      "This line is properly terminated.",   // kept
      "short.",                              // < 3 words -> dropped
      "No terminal punctuation on this one", // no punct -> dropped
      "This has { a brace } in it.",         // brace -> dropped
      "Lorem Ipsum dolor sit amet today.",   // lorem ipsum -> dropped
      "Quoted lines are fine too she said!", // kept
      "Is this a kept question?"             // kept
    ).mkString("\n")
    val out = TextAnalysis.c4LineFilter(
        Seq((1L, text)).toDF("id", "t"), "id", "t").collect().head
    assert(out.getAs[String]("clean") ==
      Seq("This line is properly terminated.",
        "Quoted lines are fine too she said!",
        "Is this a kept question?").mkString("\n"))
    assert(out.getAs[Long]("n_lines") == 7L)
    assert(out.getAs[Long]("n_kept") == 3L)
    assert(out.getAs[Boolean]("keep_doc"))
    // 2 kept lines -> doc dropped
    val two = TextAnalysis.c4LineFilter(
      Seq((1L, "Good sentence number one.\nGood sentence number two.")).toDF("id", "t"),
      "id", "t").collect().head
    assert(two.getAs[Long]("n_kept") == 2L && !two.getAs[Boolean]("keep_doc"))
  }

  test("c4 line filter: minWords is configurable; whitespace-only lines never count") {
    val out = TextAnalysis.c4LineFilter(
        Seq((1L, "Tiny one.\n   \nA B.")).toDF("id", "t"), "id", "t", minWords = 2)
      .collect().head
    assert(out.getAs[String]("clean") == "Tiny one.\nA B.")
    assert(out.getAs[Long]("n_kept") == 2L)
  }

  // -------- codegen-compile regression guard (the Sq8CosineAt lesson:
  // a janino error silently interprets; generating directly throws) --------

  test("new expressions generate COMPILABLE code — no silent interpreted fallback") {
    import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    val s = BoundReference(0, StringType, nullable = true)
    for (expr <- Seq(UnicodeNormalize(s, "NFC"), CharEntropyStats(s), FixMojibake(s)))
      assert(GenerateUnsafeProjection.generate(Seq(Alias(expr, "x")())) != null)
  }

  test("null text: entropy/mojibake/c4 propagate nulls, never crash") {
    val docs = Seq((1L, "Real sentence here."), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "t")
    val ent = TextAnalysis.charEntropy(docs, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!ent(1L) && ent(2L))
    val fx = docs.select(TextAnalysis.fixMojibake(col("t")))
      .collect().map(r => Option(r.get(0)))
    assert(fx.count(_.isEmpty) == 1)
    val c4 = TextAnalysis.c4LineFilter(docs, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(c4(1L).getAs[Long]("n_kept") == 1L)
    assert(c4(2L).isNullAt(c4(2L).fieldIndex("n_lines"))) // null in, null out
  }

  test("MojibakeRepair direct: repair only when the round trip shrinks and is exact") {
    // a plausible-looking but invalid sequence: lone 'Ã' + ASCII —
    // 0xC3 0x20 is malformed UTF-8, must NOT repair
    assert(MojibakeRepair.fix(UTF8String.fromString("Ã alone")).toString == "Ã alone")
    // Ã© -> é does shrink and decode exactly
    assert(MojibakeRepair.fix(UTF8String.fromString("Ã©")).toString == "é")
  }
}
