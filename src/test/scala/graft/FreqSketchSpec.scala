package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries guarantees are deterministic, so the spec asserts them
  * exactly: sketch == exact when the vocabulary fits the counters;
  * under eviction every retained estimate undercounts by at most
  * max_err; any item with true count > max_err is retained; results
  * respect the bounds across partitionings (merge order may change
  * WHICH low-mass items survive — never whether the bounds hold).
  */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  private def docsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("vocabulary within capacity: sketch equals exact counts, max_err = 0") {
    val docs = docsOf(Seq((1L, "a a a b b c"), (2L, "b c d d d d")))
    val got = TextAnalysis.topTokensApprox(docs, "doc_id", "text", k = 10, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(_._3 == 0L))
    assert(got.map(t => t._1 -> t._2).toMap == Map("a" -> 3L, "b" -> 3L, "c" -> 2L, "d" -> 4L))
    // deterministic order: est desc, token asc
    assert(got.map(_._1).toSeq == Seq("d", "a", "b", "c"))
  }

  test("under eviction: undercount bound holds and heavy items are guaranteed present") {
    // 40 distinct fillers once each + two heavy tokens, capacity 8:
    // heavy counts far exceed any achievable err (err <= N/(cap+1))
    val filler = (0 until 40).map(i => s"f$i").mkString(" ")
    val docs = docsOf(Seq(
      (1L, ("heavy " * 30) + filler),
      (2L, ("dense " * 25) + filler)))
    val exact = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val got = TextAnalysis.topTokensApprox(
          docs.repartition(parts), "doc_id", "text", k = 8, capacity = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val err = got.head._3
      val n = exact.values.sum
      assert(err <= n / 9, s"parts=$parts: err $err exceeds N/(cap+1)")
      got.foreach { case (tok, est, _) =>
        val truth = exact(tok)
        assert(est <= truth && truth <= est + err, s"parts=$parts $tok est=$est true=$truth err=$err")
      }
      val retained = got.map(_._1).toSet
      exact.filter(_._2 > err).keys.foreach { heavy =>
        assert(retained.contains(heavy), s"parts=$parts: heavy '$heavy' evicted")
      }
    }
  }

  test("k truncates the emitted items but not the sketch") {
    val docs = docsOf(Seq((1L, "x x x y y z w v u t")))
    val got = TextAnalysis.topTokensApprox(docs, "doc_id", "text", k = 2, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("x", 3L), ("y", 2L)))
  }

  test("serde round-trip: empty and populated states survive the aggregate's own serialize") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = graft.functions.MisraGriesAgg(
      BoundReference(0, StringType, nullable = true), k = 4, capacity = 8)
    val empty = agg.createAggregationBuffer()
    val emptyBack = agg.deserialize(agg.serialize(empty))
    assert(emptyBack.counts.isEmpty && emptyBack.err == 0L)
    val st = agg.createAggregationBuffer()
    st.counts.put(UTF8String.fromString("a"), Array(5L))
    st.counts.put(UTF8String.fromString("ü"), Array(2L))  // multi-byte key
    st.err = 3L
    val back = agg.deserialize(agg.serialize(st))
    assert(back.err == 3L && back.counts.size == 2)
    assert(back.counts.get(UTF8String.fromString("a"))(0) == 5L)
    assert(back.counts.get(UTF8String.fromString("ü"))(0) == 2L)
    // merging a deserialized state behaves like the original
    val merged = agg.merge(agg.createAggregationBuffer(), back)
    assert(merged.counts.size == 2 && merged.err == 3L)
  }

  test("nulls and empty input: no entries, zero err") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.topTokensApprox(empty, "doc_id", "text", 5, 8).count() == 0L)
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(TextAnalysis.topTokensApprox(nulls, "doc_id", "text", 5, 8).count() == 0L)
  }
}
