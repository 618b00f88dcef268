package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Diagnostic: time one or more SparkEntry queries at a given SF dir
  * (median of 3 after one warm run), optionally printing the formatted
  * plan. Usage: runMain graft.tools.QueryProbe <sfDir> <query>[,query…]
  * [explain]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      fn(spark, sfDir).count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name: median ${ts(1)}%.3f s  (min ${ts.head}%.3f, max ${ts.last}%.3f)")
    }
    spark.stop()
  }
}
