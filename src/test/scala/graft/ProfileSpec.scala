package graft

import graft.operators.Profile
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  test("profile: nulls, distincts, min/max, numeric-only mean") {
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), None),
      (3L, None, Some(30.0)),
      (4L, Some("a"), Some(20.0))).toDF("id", "s", "x")
    val p = Profile.profile(df, Seq("id", "s", "x")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "x"))
    val id = p("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 4L)
    assert(id.getString(4) == "1" && id.getString(5) == "4")
    assert(id.getDouble(6) == 2.5)
    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    assert(s.isNullAt(6), "mean must be null for non-numeric columns")
    val x = p("x")
    assert(x.getLong(2) == 1L && x.getLong(3) == 3L && x.getDouble(6) == 20.0)
  }

  test("approx profile: no Expand in the plan, distincts within HLL++ error") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cols = Seq("doc_id", "lang", "n_chars")
    val exact = Profile.profile(docs, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approxDf = Profile.profile(docs, cols, approx = true)
    // the exact path pays an Expand of k+1 rows per input row; the
    // approx path must keep the single-pass partial-agg shape
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must not plan an Expand")
    assert(Profile.profile(docs, cols).queryExecution.executedPlan.toString
      .contains("Expand"), "exact profile should use Expand (sanity)")
    val approx = approxDf.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for (c <- cols) {
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) / e <= 0.1, s"$c: approx $a vs exact $e")
    }
  }

  test("profile rejects unknown columns and empty column lists") {
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
    intercept[IllegalArgumentException](Profile.profile(df, Seq.empty))
  }
}
