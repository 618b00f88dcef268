package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join story from SURVEY §4: pre-bucketing both sides
  * of a recurring join on the join key removes the shuffle entirely —
  * at 100 TB that is the difference between re-shuffling the fact
  * table per query and reading it join-ready. Asserted on the plan,
  * not assumed.
  */
class BucketingSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  private val t1 = "graft_bucket_left"
  private val t2 = "graft_bucket_right"

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t1")
    spark.sql(s"DROP TABLE IF EXISTS $t2")
  }

  test("join of two tables bucketed on the key runs with zero shuffle exchanges") {
    import spark.implicits._
    val left = (1 to 10000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "lv")
    val right = (1 to 5000).map(i => (i.toLong % 97, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(t1)
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(t2)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the no-shuffle plan can only come from bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table(t1).join(spark.table(t2), "k")
      val n = j.count()
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // same join without bucketing DOES shuffle — the control
      val ctrl = left.join(right, "k")
      ctrl.count()
      assert(ctrl.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
