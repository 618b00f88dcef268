package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  val dir = "/root/testdata/sf0.001"

  test("binary feature pipeline: schema, md5 parity, feature shape") {
    val out = Multimodal.features(spark, dir)
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.limit(20).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getSeq[Double](3).length == 4))
    // md5 over payload bytes == Spark's md5 over the same utf-8 text
    val expected = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("m")).limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(r.getString(2) == expected(r.getLong(0))))
    // byte_len consistent with the first feature component
    rows.foreach(r => assert(r.getSeq[Double](3).head == r.getLong(1).toDouble))
  }
}
