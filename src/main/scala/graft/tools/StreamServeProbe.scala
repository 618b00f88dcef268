package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the bounded streaming serve's memory/IO trade at sf0.1:
  * the same persisted sharded IVF+PQ index serves a MULTI-BATCH
  * query stream (MemoryStream, several micro-batches — residency
  * only matters across batches) once with ZERO residency (every
  * shard re-read from parquet each wave of each batch — the strict
  * one-wave memory bound) and once FULLY PINNED (each shard loads
  * once, on its first wave; broadcasts still wave-bounded). The wall
  * difference is the per-batch paging cost `residentShards` exists
  * to dial down — measured, not asserted (BENCH_NOTES round 12).
  *
  * Usage: `sbt "runMain graft.tools.StreamServeProbe [sfDir]"`
  */
object StreamServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val build = Similarity.buildIvfPqShardedWithLayout(
      q, "vec_id", "embedding", numShards = 8, nCells = 8, m = 16)
    val ixDir = java.nio.file.Files
      .createTempDirectory("probe-stream-serve").toString + "/ix"
    graft.sources.Sink.writeIvfPqShardedIndex(spark, build, ixDir, overwrite = false)
    // query batches: 4 micro-batches x 1500 queries off the corpus
    val batches: Seq[Seq[(Long, Seq[Double])]] = q.limit(6000).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .grouped(1500).map(_.toSeq).toSeq
    def serveOnce(resident: Int, label: String): Unit = {
      var n = 0L
      val meter = new Similarity.ShardedServeMeter
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val writer = graft.streaming.EventStream.topkServeIvfPqShardedWaves(
        mem.toDF.toDF("vec_id", "embedding"),
        "embedding", "vec_id", ixDir,
        k = 10, nProbe = 4, shortlist = 100, waveSize = 2,
        residentShards = resident, meter = meter) { (out, _) =>
        n += out.count(); ()
      }
      val t0 = System.nanoTime()
      val sq = writer.start()
      try batches.foreach { b => mem.addData(b); sq.processAllAvailable() }
      finally sq.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"stream serve [$label]: $sec%.2f s over ${batches.size} " +
        f"micro-batches, $n rows, " +
        f"peak live broadcast ${meter.peakLiveBroadcastBytes / 1e6}%.1f MB")
    }
    serveOnce(0, "residentShards=0, strict one-wave bound, pages 8 shards/batch")
    serveOnce(8, "residentShards=8, each shard loaded once across the stream")
    spark.stop()
  }
}
