package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Curate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: time the decontamination sub-stages at an SF dir. */
object DecontProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[decont] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val isTrain = Curate.hashBucket(col("doc_id")) < 80
    val grams = wordGrams(tokens(normalize(col("text"))), 5)
    time("warm-read")(docs.count())
    time("train-grams-explode")(
      docs.filter(isTrain).select(col("doc_id"), explode(grams).as("g")).count())
    val evalG = docs.filter(!isTrain).select(explode(grams).as("g")).distinct()
    time("eval-grams-distinct")(evalG.count())
    time("semi-join")(
      docs.filter(isTrain).select(col("doc_id"), explode(grams).as("g"))
        .join(broadcast(evalG), Seq("g"), "left_semi")
        .select("doc_id").distinct().count())
    time("full-query")(
      graft.SparkEntry.queries("dedup_decontaminate")(spark, dir).count())
    time("full-query-2")(
      graft.SparkEntry.queries("dedup_decontaminate")(spark, dir).count())
    spark.stop()
  }
}
