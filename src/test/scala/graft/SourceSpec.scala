package graft

import graft.sources.{Sink, Source}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonl round-trip via Sink.writeJsonl is lossless, no corrupt rows") {
    val out = tmpDir("src-jsonl")
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    Sink.writeJsonl(df, out, numFiles = 2)
    val back = Source.jsonl(spark, out, docSchema)
    val (good, bad) = Source.quarantine(back)
    assert(bad.isEmpty, "round-trip must not produce corrupt rows")
    assert(good.count() == df.count())
    assert(good.join(df, Seq("doc_id", "text", "lang"), "left_anti").isEmpty)
  }

  test("jsonl: malformed lines quarantine whole, clean lines parse; failFast throws") {
    val out = tmpDir("src-badjson")
    Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en"}""",
      """{"doc_id": broken!!""",
      """{"doc_id": 2, "text": "also ok", "lang": "de"}""").toDF("value")
      .coalesce(1).write.text(out)
    val (good, bad) = Source.quarantine(Source.jsonl(spark, out, docSchema))
    assert(good.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(bad.count() == 1)
    assert(bad.head.getString(0).contains("broken"))
    val ex = intercept[org.apache.spark.SparkException] {
      Source.jsonl(spark, out, docSchema, failFast = true).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("csv: schema-explicit parse, bad row quarantines, projection prunes columns") {
    val out = tmpDir("src-csv")
    Seq(
      "doc_id,text,lang",
      "1,hello world,en",
      "not_a_number,oops,xx",
      "2,zweite zeile,de").toDF("value").coalesce(1).write.text(out)
    val (good, bad) = Source.quarantine(
      Source.csv(spark, out, docSchema, header = true))
    assert(good.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(bad.count() == 1)
    // projection pushdown: a 1-column select reads a 1-column schema
    val pruned = Source.csv(spark, out, docSchema).select("lang")
    assert(pruned.queryExecution.executedPlan.toString.contains("ReadSchema: struct<lang:string>"),
      s"csv scan did not prune columns:\n${pruned.queryExecution.executedPlan}")
  }

  test("parquet: predicate pushdown and column pruning reach the scan") {
    val df = Source.parquet(spark, "/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") > 100L).select("doc_id", "lang")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
  }

  test("orc: partitioned round-trip is lossless; pushdown and pruning reach the scan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("orc-rt").toString + "/out"
    graft.sources.Sink.writePartitioned(docs, out, Seq("lang"),
      sortCols = Seq("doc_id"), format = "orc")
    val back = Source.orc(spark, out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.sameElements(
        docs.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect().sorted))
    val q = back.filter(col("doc_id") > 100L && col("lang") === "en")
      .select("doc_id", "source")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"), p)
    // lang is a partition column: pruned at planning, not scanned
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p)
  }
}
