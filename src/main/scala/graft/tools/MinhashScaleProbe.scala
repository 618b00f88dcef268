package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve probe for the minhash+LSH pair stage (capstone 1/4):
  * measures signatures-only, banding+candidates, and the full verified
  * pass at a ladder of corpus sizes, so a superlinear wall (like the
  * 10M capstone's 402 s vs 1M's 8.9 s) can be attributed to a specific
  * sub-stage instead of guessed at.
  *
  *   sbt "runMain graft.tools.MinhashScaleProbe 1000000 2000000 4000000"
  */
object MinhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong) else Array(1000000L, 2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out rows)")
    }

    for (n <- sizes) {
      val docs = synth(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      timed(s"[$n] exact dedup (md5 groupBy), smoke warm stage") {
        Dedup.exact(docs, "doc_id", "text").count()
      }
      timed(s"[$n] signatures only (scan, no shuffle)") {
        Dedup.minhashSignatures(docs, "doc_id", "text")
          .agg(max(hash(col("sig")))).head
        n
      }
      if (sys.env.get("SPARK_GRAFT_PROBE_EXPLAIN").contains("1"))
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8).explain("formatted")
      if (sys.env.get("SPARK_GRAFT_PROBE_HIST").contains("1")) {
        // (band, bh) bucket-size histogram: where do the candidates
        // actually come from? log2 bucket sizes, weighted pair counts.
        val banded = Dedup.minhashBanded(docs, "doc_id", "text")
        banded.groupBy("band", "bh").agg(count(lit(1)).as("sz"))
          .filter(col("sz") > 1)
          .groupBy(floor(log2(col("sz"))).as("log2_sz"))
          .agg(count(lit(1)).as("n_buckets"), sum(col("sz")).as("n_members"),
            sum(col("sz") * (col("sz") - 1) / 2).as("allpairs"))
          .orderBy("log2_sz")
          .show(40, false)
      }
      timed(s"[$n] candidates only (band + window cap + pair dedup)") {
        Dedup.minhashCandidates(docs, "doc_id", "text", threshold = 0.8).count()
      }
      timed(s"[$n] full minhashPairs (band + cap + verify)") {
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8).count()
      }
      docs.unpersist(true)
    }
    spark.stop()
  }

  // identical corpus shape to ScaleSmoke.synth + the capstone's
  // function-word tail (SPARK_GRAFT_PROBE_TAIL=0 drops the tail, the
  // round-6 1M-smoke shape, to isolate the shared-suffix effect)
  private def synth(spark: SparkSession, nDocs: Long): DataFrame = {
    val tail =
      if (sys.env.get("SPARK_GRAFT_PROBE_TAIL").contains("0")) ""
      else " the of and to in is that it was"
    val seed = when(col("id") % 100 === 7, col("id") - lit(7))
      .when(col("id") % 100 === 13, col("id") - lit(13))
      .otherwise(col("id"))
    val mutate = col("id") % 100 === 13
    val base = spark.range(nDocs).toDF("id")
      .withColumn("__seed", seed)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(30)), w =>
          when(mutate && w === 15, lit("mutated"))
            .otherwise(substring(md5(concat(col("__seed"), lit("-"), w)), 1, 6))))
          .as("text"))
    if (tail.isEmpty) base
    else base.select(col("doc_id"), concat(col("text"), lit(tail)).as("text"))
  }
}
