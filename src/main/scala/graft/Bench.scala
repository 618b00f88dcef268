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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
