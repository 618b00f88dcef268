package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — the driver's throughput gate (BENCH_r{N}.json).
  *
  * Times every SparkEntry query at `SPARK_GRAFT_SF_DIR`. Each query is
  * first run once at sf0.001 (same plan shape → warms whole-stage
  * codegen + JIT without touching the timed data), then timed at the
  * target SF. Emits exactly one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    val doWarm = new java.io.File(warmDir).isDirectory && warmDir != sfDir
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (doWarm)
        try fn(spark, warmDir).count()
        catch { case e: Throwable => System.err.println(s"[bench-warm] $name: ${e.getMessage}") }
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val kernel = kernelHeadline(spark)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"kernel":$kernel,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Kernel headlines. First: the reference's README benchmark shape —
    * topk over 1000 queries × 10000 corpus × 256 dims, cosine, k=10
    * (reference README.md:160-168 reports ≈45 ms single-node). At that
    * size a Spark job's fixed scheduling cost (~40 ms for 32 tasks) is
    * a large fraction of the wall time, so a second, 16× larger query
    * batch shows the amortized throughput — the regime that matters at
    * scale. Seeded synthetic data; corpus index built once (the
    * reference also pre-holds both frames); best of 3 timed runs.
    */
  private def kernelHeadline(spark: SparkSession): String = {
    import graft.operators.{Metric, Similarity}
    val (nC, dim, k) = (10000, 256, 10)
    val rnd = new scala.util.Random(7)
    def mat(n: Int) =
      (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    val corpusDF = spark.createDataFrame(mat(nC)).toDF("id", "emb")
    val cx = Similarity.collectCorpus(corpusDF, "id", "emb")
    def bestOf3(nQ: Int): Double = {
      val queriesDF = spark.createDataFrame(mat(nQ)).toDF("id", "emb")
        .repartition(spark.sparkContext.defaultParallelism).cache()
      queriesDF.count()
      def run(): Double = {
        val t0 = System.nanoTime()
        Similarity.topkFlat(queriesDF, "emb", cx, k, Metric.Cosine).count()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val best = (1 to 3).map(_ => run()).min
      queriesDF.unpersist()
      best
    }
    val ref = bestOf3(1000)
    val big = bestOf3(16000)
    // f32 variant of the big batch (the reference's memory-efficiency
    // case; both sides f32 → sgemm fast path)
    val corpusF = spark.createDataFrame(
      (0 until nC).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))).toDF("id", "emb")
    val cxF = Similarity.collectCorpus(corpusF, "id", "emb")
    val qF = spark.createDataFrame(
      (0 until 16000).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))).toDF("id", "emb")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    qF.count()
    def runF(): Double = {
      val t0 = System.nanoTime()
      Similarity.topkFlat(qF, "emb", cxF, k, Metric.Cosine).count()
      (System.nanoTime() - t0) / 1e9
    }
    runF()
    val bigF = (1 to 3).map(_ => runF()).min
    qF.unpersist()
    s"""{"shape":"1000x${nC}x$dim","k":$k,"metric":"cosine","sec":$ref,""" +
      s""""big_shape":"16000x${nC}x$dim","big_sec":$big,""" +
      s""""big_qps":${16000.0 / big},""" +
      s""""big_f32_sec":$bigF,"big_f32_qps":${16000.0 / bigF}}"""
  }
}
