package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose hot keys AQE can't fix (e.g. a
  * skewed equi-join where neither side broadcasts and single keys
  * overflow one task).
  *
  * AQE's skew-join handling (enabled in GraftSession) already splits
  * oversized SHUFFLE PARTITIONS; salting goes further and splits a
  * single oversized KEY: left rows take a deterministic salt in
  * [0, saltFactor), the right side is replicated saltFactor times, and
  * the join key becomes (key, salt) — each hot key's work lands on up
  * to saltFactor tasks. Output is exactly the plain inner join.
  */
object Skew {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // Deterministic spread: hash of the full left row mod saltFactor.
    // Any per-row value works — correctness only needs each left row
    // to meet every matching right row exactly once, which holds
    // because the right side carries all saltFactor values.
    val salted = left.withColumn("__graft_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__graft_salt").drop("__graft_salt")
  }
}
