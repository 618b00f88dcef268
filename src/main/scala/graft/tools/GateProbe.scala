package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Metric, Similarity}

/** Diagnostic: per-PHASE wall times inside the heaviest lifecycle
  * gates (build / persist / delete / read / serve / compact /
  * stream-replay), which the per-query bench cannot see. Mirrors the
  * SparkEntry gate bodies phase for phase; used to decide WHERE the
  * optimization effort goes (guide §1 — measure first). Usage:
  *   runMain graft.tools.GateProbe <sfDir> <gate>[,gate…]
  * gates: ivfpq_delete, bq_stream_waves, bq_dist, ivfbq_append,
  *        bq_filtered
  */
object GateProbe {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[gate-phase] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val gates = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one throwaway pass so JIT/codegen warmup doesn't land in phase 1
    graft.SparkEntry.queries("ann_sq8_recall")(spark, sfDir).count()
    gates.foreach {
      case "ivfpq_delete" => ivfpqDelete(spark, sfDir)
      case "bq_stream_waves" => bqStreamWaves(spark, sfDir)
      case g => println(s"[gate-phase] unknown gate: $g")
    }
    spark.stop()
  }

  private def ivfpqDelete(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    println("[gate-phase] == ann_ivfpq_delete_gate ==")
    val emb = graft.Tables.embeddings(s, dir)
    val q = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val base = java.nio.file.Files
      .createTempDirectory("probe-ivfpq-delete").toString
    val build = t("build sharded ivfpq") {
      Similarity.buildIvfPqShardedWithLayout(q, "vec_id",
        "embedding", numShards = 4, nCells = 8, m = 16)
    }
    t("write index") {
      graft.sources.Sink.writeIvfPqShardedIndex(s, build, s"$base/ix",
        overwrite = false)
    }
    t("delete third") {
      graft.sources.Sink.deleteFromIvfPqShardedIndex(s,
        emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id",
        s"$base/ix", s"$base/del")
    }
    t("refusal probe") {
      try { graft.sources.Source.readIvfPqShardedIndex(s, s"$base/del"); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("tombstoned") }
    }
    val (shards, ts) = t("read with tombstones") {
      graft.sources.Source.readIvfPqShardedIndexWithTombstones(s, s"$base/del")
    }
    def rows(df: DataFrame) = df.select("vec_id", "rank", "index", "score")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val served = t("serve tombstoned") {
      rows(Similarity.topkIvfPqShardedTombstoned(q, "embedding",
        "vec_id", shards, ts, 10, nProbe = 4, shortlist = 100))
    }
    val complement = shards.flatMap(_.ids).filter(_ % 3 != 0).toArray
    t("serve filtered (parity)") {
      served == rows(Similarity.topkIvfPqShardedFiltered(q,
        "embedding", "vec_id", shards, complement, 10, nProbe = 4,
        shortlist = 100))
    }
    t("compact") {
      graft.sources.Sink.compactIvfPqShardedIndex(s, s"$base/del", s"$base/comp")
    }
    val cShards = t("read compacted") {
      graft.sources.Source.readIvfPqShardedIndex(s, s"$base/comp")
    }
    t("serve compacted (parity)") {
      served == rows(Similarity.topkIvfPqSharded(q, "embedding", "vec_id",
        cShards, 10, nProbe = 4, shortlist = 100))
    }
  }

  private def bqStreamWaves(s: SparkSession, dir: String): Unit = {
    println("[gate-phase] == ann_bq_stream_waves_gate ==")
    val emb = graft.Tables.embeddings(s, dir)
    val q = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val build = t("build sharded bq") {
      Similarity.buildBqShardedWithLayout(q, "vec_id", "embedding", numShards = 4)
    }
    val base = java.nio.file.Files
      .createTempDirectory("probe-bq-stream-waves").toString
    t("write index") {
      graft.sources.Sink.writeBqShardedIndex(s, build, s"$base/ix",
        overwrite = false)
    }
    t("delete third") {
      graft.sources.Sink.deleteFromBqShardedIndex(s,
        emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id",
        s"$base/ix", s"$base/del")
    }
    val (dShards, ts) = t("read with tombstones") {
      graft.sources.Source.readBqShardedIndexWithTombstones(s, s"$base/del")
    }
    t("batch serve (expected)") {
      Similarity.topkBqShardedTombstoned(
          emb.select("vec_id", "embedding"), "vec_id", "embedding",
          dShards, ts, 10, Metric.Cosine, shortlist = 200)
        .select("vec_id", "rank", "index").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }
    val embSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.IntegerType)))
    val results = scala.collection.mutable.Set.empty[(Long, Int, Long)]
    val meter = new Similarity.ShardedServeMeter
    val writer = graft.streaming.EventStream.topkServeBqShardedWaves(
      s.readStream.schema(embSchema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(dir),
      "vec_id", "embedding", s"$base/del",
      k = 10, metric = Metric.Cosine, shortlist = 200, waveSize = 2,
      meter = meter) { (out, _) =>
      val rows = out.select("vec_id", "rank", "index").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      results.synchronized { results ++= rows }
      ()
    }
    t("stream replay") {
      val sq = writer.start()
      try sq.processAllAvailable() finally sq.stop()
    }
    t("size estimate (bounded check)") {
      graft.sources.Source
        .readBqShardedIndexWithTombstones(s, s"$base/del")._1
        .map(ix => org.apache.spark.util.SizeEstimator.estimate(ix))
    }
    t("q.count()") { q.count() }
  }
}
