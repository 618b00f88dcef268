package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the round-8 union-fused DSIR training: times the
  * fused single-job form (Curate.dsirLogRatios) against the old
  * two-separate-jobs shape on the same cached synthetic corpus, plus
  * the scoring scan, so a cross-round smoke move can be attributed to
  * the code or exonerated as host drift.
  *
  *   SPARK_GRAFT_SMOKE_DOCS=1000000 sbt "runMain graft.tools.DsirAbProbe"
  */
object DsirAbProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DOCS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.ScaleSmoke.synth(spark, nDocs).cache()
    println(s"corpus: ${docs.count()} docs")
    val target = docs.filter(pmod(xxhash64(col("doc_id")), lit(10)) === 0)

    // OLD shape: two separate bucket-count jobs (pre round-8)
    def oldRatios(nBuckets: Int = 4096): Array[Double] = {
      def bucketCounts(df: DataFrame): Map[Int, Long] =
        df.select(explode(graft.operators.Curate.featureGrams(col("text"))).as("g"))
          .select(graft.operators.Curate.featureBucket(col("g"), nBuckets).as("b"))
          .groupBy("b").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val tc = bucketCounts(target)
      val rc = bucketCounts(docs)
      val tN = tc.values.sum.toDouble + nBuckets
      val rN = rc.values.sum.toDouble + nBuckets
      Array.tabulate(nBuckets) { b =>
        math.log((tc.getOrElse(b, 0L) + 1) / tN) -
          math.log((rc.getOrElse(b, 0L) + 1) / rN)
      }
    }

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // interleave 2 reps of each so a drifting host cannot bias one arm
    var newR: Array[Double] = null
    var oldR: Array[Double] = null
    for (rep <- 1 to 2) {
      time(s"train NEW union-fused (rep $rep)") {
        newR = graft.operators.Curate.dsirLogRatios(target, docs, "text")
      }
      time(s"train OLD two-jobs (rep $rep)") { oldR = oldRatios() }
    }
    require(newR.sameElements(oldR), "fused and two-job ratios must be identical")
    println("ratio tables identical: true")
    time("score all docs (shared scan form)") {
      graft.operators.Curate.dsirWeights(docs, "doc_id", "text", newR)
        .agg(sum("log_w")).head
    }
    spark.stop()
  }
}
