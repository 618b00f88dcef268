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
  * gates: ivfpq_delete, bq_stream_waves, fuzzy, fuzzy2, fuzzy3, cc,
  * paras, curate
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
      case "fuzzy" => fuzzy(spark, sfDir)
      case "fuzzy2" => fuzzy2(spark, sfDir)
      case "fuzzy3" => fuzzy3(spark, sfDir)
      case "cc" => cc(spark, sfDir)
      case "paras" => paras(spark, sfDir)
      case "curate" => curate(spark, sfDir)
      case g => println(s"[gate-phase] unknown gate: $g")
    }
    spark.stop()
  }

  private def fuzzy(s: SparkSession, dir: String): Unit = {
    println("[gate-phase] == q_fuzzy_join phases ==")
    val c = graft.Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("id"),
        lower(col("c_name")).as("name"))
    t("candidates only") {
      graft.operators.Relational.fuzzyJoinCandidates(
        c, "id", "name", maxDist = 1, q = 3, maxGramDf = 20000).count()
    }
    t("full pairs (cand + verify)") {
      graft.operators.Relational.fuzzyJoinPairs(
        c, "id", "name", maxDist = 1).count()
    }
  }

  private def fuzzy2(s: SparkSession, dir: String): Unit = {
    import graft.functions.TextFunctions.charShingles
    val q = sys.env.getOrElse("FUZZY_Q", "3").toInt
    val maxDist = 1
    println(s"[gate-phase] == fuzzy candidate volumetrics (maxDist=1, q=$q) ==")
    val base = graft.Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("id"),
        lower(col("c_name")).as("s"))
      .withColumn("len", length(col("s")))
    val minLen = q * (maxDist + 1)
    val long = base.filter(col("len") >= minLen)
    val sh = long.select(col("id"), explode(charShingles(col("s"), q)).as("g"))
    println(s"[gate-phase] n=${base.count()} sh_rows=${sh.count()}")
    val dfs = sh.groupBy("g").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("g").asc)
    val prefix = sh.join(dfs, Seq("g"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= q * maxDist + 1)
      .join(long.select(col("id"), col("len")), Seq("id"))
      .select(col("id"), col("g"), col("len"))
    println(s"[gate-phase] prefix_rows=${prefix.count()}")
    val fanout = prefix.groupBy("g").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    println(s"[gate-phase] prefix_selfjoin_fanout=$fanout")
    val candPre = prefix.select(col("id").as("id1"), col("g"), col("len").as("l1"))
      .join(prefix.select(col("id").as("id2"), col("g"), col("len").as("l2")), Seq("g"))
      .filter(col("id1") < col("id2") && abs(col("l1") - col("l2")) <= maxDist)
    println(s"[gate-phase] cand_rows_pre_distinct=${candPre.count()}")
    println(s"[gate-phase] cand_rows_distinct=${candPre.select("id1", "id2").distinct().count()}")
  }

  /** Positional Ed-Join filter selectivity (round-17 verdict #5): if
    * candidate pairs' shared prefix grams sit at positions differing
    * by > maxDist, the positional filter would cut the fan-out before
    * the distinct; on the zero-padded fixed-width name keyspace the
    * prediction is that positions align and the filter passes ~all of
    * it. Measures pass-rate on min-occurrence positions (the lossless
    * variant can only pass MORE).
    */
  private def fuzzy3(s: SparkSession, dir: String): Unit = {
    import graft.functions.TextFunctions.charShingles
    val q = 3; val maxDist = 1
    println(s"[gate-phase] == fuzzy positional-filter selectivity (q=$q, d=$maxDist) ==")
    val base = graft.Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("id"),
        lower(col("c_name")).as("s"))
      .withColumn("len", length(col("s")))
    val minLen = q * (maxDist + 1)
    val long = base.filter(col("len") >= minLen)
    // distinct grams with their FIRST occurrence position (1-based)
    val sh = long.select(col("id"), col("s"), col("len"),
        explode(charShingles(col("s"), q)).as("g"))
      .withColumn("p", expr("locate(g, s)"))
    val dfs = sh.groupBy("g").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("g").asc)
    val prefix = sh.join(dfs, Seq("g"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= q * maxDist + 1)
      .select(col("id"), col("g"), col("len"), col("p"))
    val candPre = prefix.select(col("id").as("id1"), col("g"),
        col("len").as("l1"), col("p").as("p1"))
      .join(prefix.select(col("id").as("id2"), col("g"),
        col("len").as("l2"), col("p").as("p2")), Seq("g"))
      .filter(col("id1") < col("id2") && abs(col("l1") - col("l2")) <= maxDist)
    val stats = candPre.agg(count(lit(1)).as("all"),
      count(when(abs(col("p1") - col("p2")) <= maxDist, 1)).as("pass"))
      .head()
    val all = stats.getLong(0); val pass = stats.getLong(1)
    println(f"[gate-phase] fan-out rows=$all pass_positional=$pass " +
      f"(${100.0 * pass / math.max(1L, all)}%.1f%% pass rate)")
  }

  private def cc(s: SparkSession, dir: String): Unit = {
    println("[gate-phase] == dedup_clusters phases ==")
    val docs = graft.Tables.documents(s, dir).filter(col("doc_id") < 500)
    val pairs = t("ngram pairs (count)") {
      val p = graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = 0.7)
      p.count(); p
    }
    t("clusterPairs (min-label CC)") {
      graft.operators.Dedup.clusterPairs(
        docs.select("doc_id"), "doc_id", pairs).count()
    }
    t("clusterPairsStars") {
      graft.operators.Dedup.clusterPairsStars(
        docs.select("doc_id"), "doc_id", pairs).count()
    }
  }

  /** dedup_paragraphs_near_recall phase breakdown (round-17 verdict
    * #6): planted corpus → paragraph explode → minhash pipeline —
    * which stage owns the 4.6 s?
    */
  private def paras(s: SparkSession, dir: String): Unit = {
    println("[gate-phase] == dedup_paragraphs_near_recall phases ==")
    val d = graft.Tables.documents(s, dir)
    val g = floor(col("doc_id") / 2).cast("long").cast("string")
    def para(word: String) = concat(
      lit("notice "), md5(g), lit(" "),
      md5(concat(g, lit("b"))), lit(" "),
      md5(concat(g, lit("c"))),
      lit(s" $word shared closing words"))
    val variant = when(pmod(col("doc_id"), lit(2)) === 0,
      para("with")).otherwise(para("plus"))
    val planted = d.select(col("doc_id"),
      concat(col("text"), lit("\n\n"), variant).as("text"))
    t("planted corpus count") { planted.count() }
    val paras = planted
      .select(col("doc_id").cast("long").as("id"),
        posexplode(split(col("text"), "\n{2,}", -1)).as(Seq("pos", "p")))
      .filter(length(trim(col("p"))) >= 30)
    t("paragraph explode count") { paras.count() }
    t("minhash signatures (over paras)") {
      graft.operators.Dedup.minhashSignatures(
        paras.select((shiftLeft(col("id"), 20).bitwiseOR(col("pos"))).as("pid"),
          col("p")), "pid", "p")
        .agg(max(hash(col("sig")))).head()
    }
    t("minhashPairs (band+verify)") {
      graft.operators.Dedup.minhashPairs(
        paras.select((shiftLeft(col("id"), 20).bitwiseOR(col("pos"))).as("pid"),
          col("p")), "pid", "p", threshold = 0.7).count()
    }
    t("full paragraphNearDupPairs") {
      graft.operators.TextAnalysis.paragraphNearDupPairs(
        planted, "doc_id", "text", threshold = 0.7).count()
    }
    t("full declared query") {
      graft.SparkEntry.queries("dedup_paragraphs_near_recall")(s, dir).count()
    }
  }

  /** curate_full phase breakdown (round-17 verdict #6): pair graph →
    * CC dedup → gates+split — which stage owns the 5.0 s?
    */
  private def curate(s: SparkSession, dir: String): Unit = {
    println("[gate-phase] == curate_full phases ==")
    val docs = graft.Tables.documents(s, dir).filter(col("doc_id") < 500)
    val pairs = t("ngramJaccardPairs count") {
      val p = graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = 0.7)
      p.count(); p
    }
    t("dropDuplicatesByPairs (pairs re-derived + CC)") {
      graft.operators.Dedup.dropDuplicatesByPairs(docs, "doc_id",
        graft.operators.Dedup.ngramJaccardPairs(
          docs, "doc_id", "text", n = 3, threshold = 0.7)).count()
    }
    t("gates+split on pre-deduped (isolated)") {
      val deduped = graft.operators.Dedup.dropDuplicatesByPairs(docs, "doc_id", pairs)
        .localCheckpoint()
      graft.operators.Curate.gateDocs(deduped, "doc_id").count()
    }
    t("full curate_full") {
      graft.operators.Curate.curateFull(s, dir).count()
    }
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
    // per-batch duration breakdown straight from the streaming
    // engine: triggerExecution = whole batch, with addBatch (the
    // foreachBatch body), getBatch/latestOffset (source), walCommit/
    // commitOffsets (offset+commit logs), queryPlanning
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val d = e.progress.durationMs
        println(s"[gate-phase]   batch ${e.progress.batchId} rows=" +
          s"${e.progress.numInputRows} durationMs=$d")
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    s.streams.addListener(listener)
    t("stream replay") {
      val sq = writer.start()
      try sq.processAllAvailable() finally sq.stop()
    }
    s.streams.removeListener(listener)
    t("size estimate (bounded check)") {
      graft.sources.Source
        .readBqShardedIndexWithTombstones(s, s"$base/del")._1
        .map(ix => org.apache.spark.util.SizeEstimator.estimate(ix))
    }
    t("q.count()") { q.count() }
  }
}
