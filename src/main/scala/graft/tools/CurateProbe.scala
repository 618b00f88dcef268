package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: decompose curate's wall time into its stages. */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = col("text")
    val best = TextAnalysis.bestLang(t)
    val nWords = size(tokens(t)).cast("long")
    val stopRatio = round(
      tokenListCount(tokens(normalize(t)), TextAnalysis.langMarkers.head._2)
        / size(tokens(t)), 4) + lit(0.0)
    val passes = (best.getField("lang") === lit("en")).cast("int") +
      (nWords >= 30L).cast("int") + (stopRatio >= 0.04).cast("int") === lit(3)
    def time(label: String)(body: => Unit): Unit = {
      body
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[curate-probe] $label: ${ts(1)}%.3f s")
    }
    val docs = Tables.documents(spark, dir)
    time("scan only")(docs.count())
    time("langid projection")(docs.select(best.getField("lang")).count())
    time("tn tokenizer only")(docs.select(tokens(normalize(t))).count())
    time("tw tokenizer only")(docs.select(tokens(t)).count())
    time("gate filter (old arith)")(docs.filter(passes).count())
    // letBound gate — mirror of Curate.gateStruct
    def letBound(c: org.apache.spark.sql.Column)(
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      element_at(transform(array(c), f), 1)
    val g = letBound(struct(tokens(normalize(t)).as("tn"), tokens(t).as("tw"))) { s =>
      val tn = s.getField("tn"); val tw = s.getField("tw")
      letBound(struct(
          array(TextAnalysis.langMarkers.zipWithIndex.map { case ((l, ws), i) =>
            struct(tokenListCount(tn, ws).cast("long").as("score"),
              lit(-i).as("negpos"), lit(l).as("lang"))
          }: _*).as("cands"),
          size(tw).cast("long").as("nw"))) { b =>
        val cands = b.getField("cands"); val nw = b.getField("nw")
        struct(array_max(cands).getField("lang").as("pred_lang"), nw.as("n_words"),
          (round(element_at(cands, 1).getField("score") / nw, 4) + lit(0.0)).as("stop_ratio"))
      }
    }
    val passes2 = letBound(g) { gs =>
      gs.getField("pred_lang") === lit("en") &&
        gs.getField("n_words") >= 30L && gs.getField("stop_ratio") >= 0.04
    }
    time("gate filter (letBound)")(docs.filter(passes2).count())
    time("filter+window")(
      docs.filter(passes)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5(t)).orderBy(col("doc_id"))))
        .filter(col("rn") === 1).count())
    time("full curate")(graft.operators.Curate.curate(spark, dir).count())
    spark.stop()
  }
}
