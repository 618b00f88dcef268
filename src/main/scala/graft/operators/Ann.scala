package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbour over embedding columns.
  *
  * Brute force = Similarity.topk (broadcast + GEMM): the exact
  * baseline. This file adds the scale path: random-hyperplane LSH —
  * sign-bit signatures per table bucket queries and corpus together,
  * so candidate generation is a plain equi-join on (table, bucket)
  * with no all-pairs stage; exact cosine re-ranks candidates only.
  * Recall grows with `tables`; bucket width with `bits`. Defaults
  * (16 tables × 6 bits) give ~0.56 recall@10 on the synthetic corpus —
  * unclustered gaussian vectors are LSH's worst case; on real
  * (clustered) embedding corpora raise `bits` for tighter buckets.
  */
object Ann {

  /** Deterministic gaussian hyperplanes: tables × bits × dim. */
  private def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Bucket id per table: sign-bit signature of the hyperplane dots.
    * Pure column expressions — no UDF; the dot products inline into
    * codegen via ArrayDot.
    */
  private def bucketCols(embCol: Column, planes: Array[Array[Array[Double]]]): Seq[Column] =
    planes.toIndexedSeq.map { table =>
      table.toIndexedSeq.zipWithIndex.map { case (plane, j) =>
        shiftleft(when(array_dot(embCol, lit(plane)) >= 0, 1L).otherwise(0L), j)
      }.reduce((a, b) => a.bitwiseOR(b))
    }

  /** LSH cosine top-k: per query, the k most-cosine-similar corpus
    * rows among LSH candidates. Output: (qid, rank, index, score) —
    * same shape as Similarity.topkFlat for recall comparison.
    */
  def lshCosineTopK(
      queries: DataFrame,
      qIdCol: String,
      corpus: DataFrame,
      cIdCol: String,
      embCol: String,
      k: Int,
      tables: Int = 16,
      bits: Int = 6,
      seed: Long = 42L): DataFrame = {
    val dim = queries.select(size(col(embCol))).head.getInt(0)
    val planes = hyperplanes(tables, bits, dim, seed)
    def withBuckets(df: DataFrame, idOut: String, embOut: String) = {
      val e = col(embCol).cast("array<double>")
      df.select(col(idOut), e.as(embOut),
        posexplode(array(bucketCols(e, planes): _*)).as(Seq("table", "bucket")))
    }
    val qb = withBuckets(queries.select(col(qIdCol), col(embCol)), qIdCol, "qe")
    val cb = withBuckets(
      corpus.select(col(cIdCol).as("index"), col(embCol)), "index", "ce")
    val cand = qb.join(cb, Seq("table", "bucket"))
      .select(col(qIdCol), col("index"), col("qe"), col("ce"))
      .dropDuplicates(qIdCol, "index")
      .withColumn("score", array_cosine(col("qe"), col("ce")))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("score").desc, col("index").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col("index"),
        (round(col("score"), 4) + lit(0.0)).as("score"))
      .orderBy(qIdCol, "rank")
  }
}
