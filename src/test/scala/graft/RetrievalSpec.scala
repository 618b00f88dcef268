package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RRF fusion contract: hand-computable fused scores, the missing-
  * from-one-list convention, per-query isolation, deterministic tie
  * order, and the malformed-input refusals (0-based ranks, duplicate
  * candidates within one list).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.create("local[4]", 4)
  import spark.implicits._

  test("rrfFuse: hand-computed scores for two overlapping lists") {
    // list A: d1@1 d2@2 d3@3 ; list B: d2@1 d4@2
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val eps = 1e-12
    assert(math.abs(out(1L) - 1.0 / 61) < eps)
    assert(math.abs(out(2L) - (1.0 / 62 + 1.0 / 61)) < eps) // both lists
    assert(math.abs(out(3L) - 1.0 / 63) < eps)
    assert(math.abs(out(4L) - 1.0 / 62) < eps)
    // d2 fuses highest: present in both lists
    val top = Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 1)
      .collect().head.getLong(0)
    assert(top == 2L)
  }

  test("rrfFuse: k cuts per query and ties break by id ascending") {
    // two docs with identical fused score (each alone at rank 1 of one
    // list) — the smaller id must survive a k=1 cut
    val a = Seq((10L, 1)).toDF("id", "rank")
    val b = Seq((7L, 1)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L))
  }

  test("rrfFuse: multi-query fusion keeps queries independent") {
    val a = Seq(("q1", 1L, 1), ("q1", 2L, 2), ("q2", 2L, 1))
      .toDF("q", "id", "rank")
    val b = Seq(("q1", 2L, 1), ("q2", 9L, 1)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), Seq("q"), "id", "rank", k = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // q1: d2 in both lists beats d1; q2: d2 and d9 tie at 1/61 → id 2
    assert(out == Map("q1" -> 2L, "q2" -> 2L))
  }

  test("rrfFuse: custom c shifts weights but keeps rank-1 dominance") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a), Nil, "id", "rank", k = 10, c = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 0.5) < 1e-12)
    assert(math.abs(out(2L) - 1.0 / 3) < 1e-12)
  }

  test("rrfFuse: per-list weights scale contributions; bad weights refuse") {
    val a = Seq((1L, 1)).toDF("id", "rank") // only in A
    val b = Seq((2L, 1)).toDF("id", "rank") // only in B
    // 2:1 weights — candidate 1 must now outrank candidate 2 despite
    // identical ranks, with hand-computable scores
    val out = Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 10,
        weights = Seq(2.0, 1.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 2.0 / 61) < 1e-12)
    assert(math.abs(out(2L) - 1.0 / 61) < 1e-12)
    // all-1.0 weights are exactly the unweighted fusion
    val w1 = Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 10,
        weights = Seq(1.0, 1.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w0 = Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1 == w0)
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 5, weights = Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 5,
        weights = Seq(1.0, 0.0))
    }
  }

  test("rrfFuse: refuses non-positive and null ranks") {
    val bad = Seq((1L, 0)).toDF("id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(bad), Nil, "id", "rank", k = 5).collect()
    }
    assert(e.getMessage.contains("1-based"), e.getMessage)
    val nul = Seq((1L, Some(2)), (2L, None)).toDF("id", "rank")
    val e2 = intercept[Exception] {
      Retrieval.rrfFuse(Seq(nul), Nil, "id", "rank", k = 5).collect()
    }
    assert(e2.getMessage.contains("1-based"), e2.getMessage)
  }

  test("rrfFuse: refuses a candidate listed twice in one ranking") {
    val dup = Seq((1L, 1), (1L, 3)).toDF("id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(dup), Nil, "id", "rank", k = 5).collect()
    }
    assert(e.getMessage.contains("more than once"), e.getMessage)
  }

  test("rrfFuse: refuses missing columns and bad arguments eagerly") {
    val a = Seq((1L, 1)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Nil, Nil, "id", "rank", k = 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), Nil, "id", "rank", k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), Nil, "id", "rank", k = 5, c = 0.0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), Seq("missing_q"), "id", "rank", k = 5)
    }
  }

  test("rrfFuse: both aggregations are partial (map-side combine) in-plan") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1)).toDF("id", "rank")
    val plan = Retrieval.rrfFuse(Seq(a, b), Nil, "id", "rank", k = 5)
      .queryExecution.executedPlan.toString
    // HashAggregate pairs (partial + final) — not a single-stage sort
    // aggregate that would ship every pre-agg row
    assert(plan.contains("HashAggregate"), plan)
  }
}
