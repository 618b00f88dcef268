package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: measured recall of [[Dedup.semanticPairs]] vs the
  * exact all-pairs form per SF dir — used to pin the
  * dedup_semantic_recall gate floor with real margin, not hope.
  * Usage: runMain graft.tools.SemanticProbe <sfDir> [<sfDir>…]
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nCells = sys.env.getOrElse("SEM_CELLS", "16").toInt
    val assign = sys.env.getOrElse("SEM_ASSIGN", "2").toInt
    println(s"[semprobe] nCells=$nCells assign=$assign")
    args.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      val exact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", threshold = 0.3)
      val sem = Dedup.semanticPairs(emb, "vec_id", "embedding", threshold = 0.3,
        nCells = nCells, assign = assign)
      val row = exact.select(col("id1"), col("id2"))
        .join(sem.select(col("id1"), col("id2"), lit(1).as("hit")),
          Seq("id1", "id2"), "left")
        .agg(count(lit(1)).as("n_exact"), sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .head()
      val nExact = row.getLong(0)
      val nHit = if (row.isNullAt(1)) 0L else row.getLong(1)
      val nSem = sem.count()
      println(f"[semprobe] $dir: n_exact=$nExact n_hit=$nHit n_sem=$nSem " +
        f"recall=${if (nExact == 0) 1.0 else nHit.toDouble / nExact}%.4f")
    }
    spark.stop()
  }
}
