package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Corpus profiling — the "know your training data" pass every
  * pipeline runs before and after curation: per-column row/null/
  * distinct counts, min/max, and numeric means, in ONE aggregation
  * over the data (reference analogue: the describe/summary surface of
  * the host DataFrame library; this is the engine-side, oracle-checked
  * form).
  *
  * Output is LONG format, one row per profiled column:
  * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val, mean) —
  * min/max cast to string so heterogeneous columns share a schema,
  * mean only for numeric columns (null otherwise), rounded to 4
  * decimals for cross-engine comparability.
  *
  * Scale shape: everything is a partial-aggregatable expression, so
  * the corpus crosses ONE exchange carrying a single pre-aggregated
  * row per partition — except exact distinct counts, where Spark
  * plans an Expand of k+1 rows per input row (k = distinct aggs).
  * At 100 TB pass `approx = true`: HyperLogLog++ sketches
  * (`approx_count_distinct`, rsd 2.5 %) keep the single-pass no-Expand
  * shape, the standard profiling trade (asserted against the exact
  * path in ProfileSpec).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    for (c <- cols) require(types.contains(c), s"no such column: $c")
    val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approx) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        (if (numeric) round(avg(col(c)), 4) + lit(0.0)
         else lit(null).cast("double")).as(s"__mean_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"),
        col(s"__mean_$c").as("mean"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("col_name")
  }

  /** Embedding-column profile — the vector-side "know your data"
    * pass: row/null counts, dim range (a ragged corpus breaks every
    * kernel downstream), norm stats, and zero-norm count (rows the
    * cosine contract scores 0). One partial-aggregatable pass; the
    * norm is computed in DOUBLE regardless of the stored element type
    * so the oracle comparison is exact.
    */
  def profileEmbeddings(df: DataFrame, embCol: String): DataFrame = {
    val nrm = sqrt(aggregate(col(embCol).cast("array<double>"),
      lit(0.0), (acc, x) => acc + x * x))
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(embCol).isNull, 1L).otherwise(0L)).as("n_null_vecs"),
      min(size(col(embCol))).cast("long").as("min_dim"),
      max(size(col(embCol))).cast("long").as("max_dim"),
      (round(min(nrm), 4) + lit(0.0)).as("min_norm"),
      (round(max(nrm), 4) + lit(0.0)).as("max_norm"),
      (round(avg(nrm), 4) + lit(0.0)).as("mean_norm"),
      sum(when(nrm < lit(1e-10), 1L).otherwise(0L)).as("n_zero_norm"))
  }
}
