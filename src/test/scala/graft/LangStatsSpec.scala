package graft

import graft.functions.SketchFunctions.lang_marker_stats
import graft.functions.TextFunctions._
import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass [[graft.functions.LangMarkerStats]] expression must
  * be bit-identical to the composed-builtin form it replaces (the
  * oracle SQL mirrors the composed form, so any divergence here is an
  * oracle red row waiting to happen at another SF).
  */
class LangStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private val markers = TextAnalysis.langMarkers.map(_._2)

  private def composed(t: org.apache.spark.sql.Column) = struct(
    array(markers.map(ws => tokenListCount(tokens(normalize(t)), ws).cast("long")): _*)
      .as("counts"),
    size(tokens(t)).cast("long").as("n_words"))

  test("matches the composed tokenizer form on generated text incl. edge cases") {
    val rnd = new scala.util.Random(17)
    val vocab = Seq("the", "la", "und", "y", "robot", "Zebra", "42", "de",
      "ein", "to", "of", "los", "THE", "e,n", "a.b", "und!")
    val gen = (0 until 300).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", "  ", "\t", ", ", " -- ")(rnd.nextInt(5))))
    }
    val edge = Seq(
      300L -> "", 301L -> "   ", 302L -> "\t\n\r", 303L -> "the",
      304L -> "the the THE tHe", 305L -> "...!!!", 306L -> "ab the",
      307L -> " leading and trailing  ", 308L -> "naïve café the résumé",
      309L -> "der die das den dem", 310L -> "thethethe the-the",
      311L -> "a\t", 312L -> "\ta", 313L -> " a b\t ", 314L -> "thede",
      315L -> "\t \n the \r\n",
      // codepoints whose LOWERCASE is ASCII: U+212A (→k), U+017F (→s),
      // U+0130 (→ i + combining dot); lower() maps them into [a-z]
      // before the regex, so they join/split runs in subtle ways
      316L -> "Kthe y K den", 317L -> "loſ the",
      318L -> "İ the el", 319L -> "eİn the", 320L -> "KK the")
    val df = (gen ++ edge).toDF("id", "t")
    val rows = df.select($"id",
        lang_marker_stats($"t", markers).as("fast"), composed($"t").as("slow"))
      .collect()
    rows.foreach { r =>
      val f = r.getStruct(1); val s = r.getStruct(2)
      assert(f.getSeq[Long](0) == s.getSeq[Long](0),
        s"counts differ for id=${r.getLong(0)}: ${f.getSeq[Long](0)} vs ${s.getSeq[Long](0)}")
      assert(f.getLong(1) == s.getLong(1),
        s"n_words differ for id=${r.getLong(0)}: ${f.getLong(1)} vs ${s.getLong(1)}")
    }
    assert(rows.length == 321)
  }

  test("null text propagates null") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "the end")).toDF("id", "t")
    val got = df.select($"id", lang_marker_stats($"t", markers).as("s"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(1L) && !got(2L))
  }
}
