package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprint properties (Schleimer et al. SIGMOD'03): the
  * guarantee is that any shared substring of length ≥ w + k − 1
  * produces at least one shared fingerprint, and nothing shorter than
  * k is ever detected. Asserted over randomized corpora.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private val k = 8
  private val w = 4

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[Long]] =
    TextAnalysis.winnow(rows.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }

  private def randText(rnd: scala.util.Random, n: Int): String =
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  test("guarantee: docs sharing a substring of length >= w+k-1 share a fingerprint") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 20) {
      val common = randText(rnd, w + k - 1) // exactly the guarantee threshold
      val a = randText(rnd, 60) + common + randText(rnd, 60)
      val b = randText(rnd, 40) + common + randText(rnd, 80)
      val m = fps(Seq((1L, a), (2L, b)))
      assert((m(1L) & m(2L)).nonEmpty, s"trial $trial: no shared fingerprint")
    }
  }

  test("unrelated random docs share no fingerprints") {
    val rnd = new scala.util.Random(23)
    val m = fps(Seq((1L, randText(rnd, 300)), (2L, randText(rnd, 300))))
    assert((m(1L) & m(2L)).isEmpty)
  }

  test("identical docs fingerprint identically; output is deterministic") {
    val rnd = new scala.util.Random(29)
    val t = randText(rnd, 200)
    val m = fps(Seq((1L, t), (2L, t)))
    assert(m(1L) == m(2L) && m(1L).nonEmpty)
    assert(fps(Seq((1L, t))) == fps(Seq((1L, t))))
  }

  test("text shorter than k yields exactly one whole-text fingerprint") {
    val m = fps(Seq((1L, "abc"), (2L, "abc"), (3L, "abd")))
    assert(m(1L).size == 1 && m(1L) == m(2L) && m(1L) != m(3L))
  }
}
