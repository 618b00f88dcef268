package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  val dir = "/root/testdata/sf0.01"

  test("approx count-distinct lands within the 1% rsd envelope of the exact counts") {
    val exact = Relational.distinctCounts(spark, dir).head()
    val approx = Relational.approxDistinctCounts(spark, dir).head()
    // HLL++ rsd 1%: allow 5 sigma
    for (i <- 0 to 1) {
      val (e, a) = (exact.getLong(i).toDouble, approx.getLong(i).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"col $i: approx $a vs exact $e")
    }
    assert(exact.getLong(2) == approx.getLong(2)) // plain count is exact
  }

  test("sessionize and sessionizeWindow agree on (user, start, end, count)") {
    val a = Relational.sessionize(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val b = Relational.sessionizeWindow(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)
  }
}
