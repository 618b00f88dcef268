package graft

import graft.operators.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  test("salted join equals the plain join on skewed data, and shuffles on (key, salt)") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 5000).map(i => (if (i <= 4500) 1L else i.toLong % 37, i.toLong))
      .toDF("k", "lv")
    val right = (0 to 40).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

    val plain = left.join(right, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(salted == plain)
    assert(plain.nonEmpty)

    // the shuffle key must include the salt: that's the whole point
    val p = Skew.saltedJoin(left, right, Seq("k"), 8).queryExecution.executedPlan.toString
    assert(p.contains("__graft_salt"), "salt column absent from the physical plan")
  }

  test("saltFactor = 1 degenerates to the plain join") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
    val right = Seq((1L, "x"), (3L, "y")).toDF("k", "rv")
    val got = Skew.saltedJoin(left, right, Seq("k"), 1).collect()
    assert(got.length == 1 && got.head.getString(1) == "a" && got.head.getString(2) == "x")
  }
}
