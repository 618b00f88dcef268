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

  /** Bucket ids for all tables in ONE codegen'd expression
    * ([[graft.functions.LshBuckets]]): a tables×bits tree of ArrayDot
    * nodes with per-plane literals made Catalyst planning itself the
    * bottleneck (~3 s per analysis of a 576-node tree); one expression
    * holding the flattened plane matrix plans in O(1) and runs as a
    * single tight loop.
    */
  private def bucketArray(embCol: Column, planes: Array[Array[Array[Double]]]): Column =
    lsh_buckets(embCol, planes.flatten.flatten, planes.length, planes.head.length)

  /** LSH cosine top-k: per query, the k most-cosine-similar corpus
    * rows among LSH candidates. Output: (qid, rank, index, score) —
    * same shape as Similarity.topkFlat for recall comparison.
    *
    * Plan shape (the part that matters at 100 TB): the bucket
    * equi-join and the candidate-pair distinct carry ONLY ids — the
    * embedding vectors never ride through the high-fan-out stages.
    * Embeddings are attached once per unique pair afterwards: the
    * corpus side by broadcast (it is the small "index" side), the
    * query side by a hash join on the query id whose partitioning the
    * ranking window then reuses. Shuffle volume is O(unique pairs) ×
    * 16 bytes instead of × 2·dim·8 bytes.
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
    val e = col(embCol).cast("array<double>")
    // (id, table, bucket) signature rows — ids only past this point
    def signatures(df: DataFrame, idOut: String) =
      df.select(col(idOut),
        posexplode(bucketArray(col(embCol), planes)).as(Seq("table", "bucket")))
    val qb = signatures(queries.select(col(qIdCol), col(embCol)), qIdCol)
    val cb = signatures(
      corpus.select(col(cIdCol).as("index"), col(embCol)), "index")
    val pairs = qb.join(cb, Seq("table", "bucket"))
      .select(col(qIdCol), col("index"))
      .distinct()
    val ce = corpus.select(col(cIdCol).as("index"), e.as("ce"))
    val qe = queries.select(col(qIdCol), e.as("qe"))
    val cand = pairs
      .join(broadcast(ce), Seq("index"))
      .join(qe, Seq(qIdCol))
      .withColumn("score", array_cosine(col("qe"), col("ce")))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("score").desc, col("index").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col("index"),
        (round(col("score"), 4) + lit(0.0)).as("score"))
      .orderBy(qIdCol, "rank")
  }
}
