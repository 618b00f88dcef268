package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the round-16 open item: does the eager-checkpointed
  * edge set's `repartition(id2)` (Dedup.clusterPairs) actually elide
  * the per-round edges⋈labels exchange under AQE, or is the
  * checkpoint surfacing as `UnknownPartitioning` so the repartition
  * is a pure extra shuffle? Mirrors the clusterPairs loop body
  * exactly, runs TWO propagation rounds on the bench pair graph, and
  * prints the round-2 join's FINAL (post-AQE) plan for both variants
  * (with / without the pre-partition), plus wall times for the edge
  * materialization and each round. Usage:
  *   runMain graft.tools.CcPlanProbe <sfDir> [nDocs]
  */
object CcPlanProbe {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[cc-plan] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  private def finalPlan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nDocs = if (args.length > 1) args(1).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < nDocs)
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.7)
      .localCheckpoint() // isolate: the probe prices the CC loop only
    val ids = docs.select(col("doc_id").as("id")).localCheckpoint()

    Seq(true, false).foreach { prePartition =>
      println(s"[cc-plan] ===== prePartition=$prePartition =====")
      val bidir = pairs.select(col("id1"), col("id2"))
        .unionAll(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      val edges = t(s"edges checkpoint (prePartition=$prePartition)") {
        (if (prePartition) bidir.repartition(col("id2")) else bidir)
          .localCheckpoint()
      }
      println(s"[cc-plan] edges partitions: ${edges.rdd.getNumPartitions}")
      val nbrMin = edges.groupBy(col("id1").as("id")).agg(min("id2").as("nmin"))
      var labels = ids
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(coalesce(col("nmin"), col("id")), col("id")).as("cluster"))
        .localCheckpoint()
      (1 to 2).foreach { round =>
        val viaEdges = edges.join(labels, edges("id2") === labels("id"))
          .select(edges("id1").as("id"), col("cluster"), lit(null).as("old"))
        val agged = labels.select(col("id"), col("cluster"), col("cluster").as("old"))
          .unionAll(viaEdges)
          .groupBy("id").agg(min("cluster").as("cluster"), min("old").as("old"))
        val next = agged.localCheckpoint(eager = false)
        val changed = t(s"round $round (join+agg action)") {
          next.agg(count(when(col("cluster") =!= col("old"), 1))).head.getLong(0)
        }
        println(s"[cc-plan] round $round changed=$changed")
        if (round == 2) {
          // the lazy checkpoint's own plan is just a scan node — to
          // see the JOIN's final adaptive plan, execute the same
          // aggregation through its own QueryExecution and explain
          // it post-execution (isFinalPlan=true)
          agged.collect()
          val plan = finalPlan(agged)
          println(s"[cc-plan] ---- round-$round FINAL plan (prePartition=$prePartition) ----")
          println(plan)
        }
        labels = next.select("id", "cluster")
      }
    }
    spark.stop()
  }
}
