package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items state: at most `capacity` counters plus
  * the accumulated decrement mass. Counters UNDERcount: for every
  * retained item, `est ≤ true ≤ est + err`, and any item whose true
  * count exceeds `err` is guaranteed retained (err ≤ N/(capacity+1)
  * for a stream of N updates — the classic deterministic bound, which
  * the mergeable-summaries construction of Agarwal et al. preserves
  * under arbitrary merge trees).
  */
final class MisraGriesState(
    val counts: java.util.HashMap[UTF8String, Array[Long]],
    var err: Long)

/** `mg_top_k(token, k, capacity)` — mergeable frequent-items sketch
  * as a native [[TypedImperativeAggregate]]. (Named mg_, not
  * approx_top_k: Spark 4's builtin of that name wins resolution and
  * exposes no deterministic per-item error bound.) The exact top-k
  * (`TextAnalysis.topTokens`) shuffles one row per DISTINCT token —
  * at 100 TB that is the full vocabulary of the web crossing an
  * exchange. This sketch keeps a bounded `capacity`-counter state per
  * partial buffer, combines map-side like any partial aggregation,
  * and ships `capacity` rows per partition regardless of vocabulary
  * size. Same engineering slot as the HLL (`q_distinct_approx`) and
  * t-digest (`q_quantiles_approx`) sketches, with the matching
  * driver-visible error gate (`text_top_tokens_approx_gate`).
  *
  * Update is amortized O(1): an eviction decrements every counter by
  * one but removes at least one unit of mass per counter, paid for by
  * the inserts that built that mass. Merge sums the two counter maps,
  * then restores the bound by subtracting the (capacity+1)-th largest
  * count from everything (Agarwal et al., "Mergeable Summaries",
  * PODS'12) — the subtracted mass joins `err`.
  *
  * Output: struct<items: array<struct<token, est>>, max_err: long>,
  * items the top-`k` retained counters by (est desc, token asc).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesState] with UnaryLike[Expression] {

  require(k > 0, s"k must be > 0, got $k")
  require(capacity >= k, s"capacity must be >= k, got capacity=$capacity k=$k")

  override def prettyName: String = "mg_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("max_err", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def createAggregationBuffer(): MisraGriesState =
    new MisraGriesState(new java.util.HashMap[UTF8String, Array[Long]](capacity * 2), 0L)

  override def update(state: MisraGriesState, input: InternalRow): MisraGriesState = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cell = state.counts.get(key)
      if (cell != null) cell(0) += 1
      else if (state.counts.size < capacity) {
        // clone: the scan reuses UnsafeRow-backed memory across rows
        state.counts.put(key.clone(), Array(1L))
      } else {
        // full + new item: decrement every counter (the new item's
        // own 1 cancels against the same decrement, so it is never
        // stored), drop zeros, account the lost mass
        val it = state.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue()(0) -= 1
          if (e.getValue()(0) <= 0) it.remove()
        }
        state.err += 1
      }
    }
    state
  }

  override def merge(state: MisraGriesState, other: MisraGriesState): MisraGriesState = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cell = state.counts.get(e.getKey)
      if (cell != null) cell(0) += e.getValue()(0)
      else state.counts.put(e.getKey, Array(e.getValue()(0)))
    }
    state.err += other.err
    if (state.counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything:
      // every counter ranked past capacity goes <= 0 and drops,
      // restoring the bound; the subtracted mass is new undercount
      val vals = new Array[Long](state.counts.size)
      var i = 0
      val vit = state.counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next()(0); i += 1 }
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - capacity - 1)
      val eit = state.counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        e.getValue()(0) -= m
        if (e.getValue()(0) <= 0) eit.remove()
      }
      state.err += m
    }
    state
  }

  override def eval(state: MisraGriesState): Any = {
    val entries = new java.util.ArrayList(state.counts.entrySet())
    entries.sort { (a: java.util.Map.Entry[UTF8String, Array[Long]],
        b: java.util.Map.Entry[UTF8String, Array[Long]]) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val n = math.min(k, entries.size)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = entries.get(i)
      rows(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(rows), state.err))
  }

  override def serialize(state: MisraGriesState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(state.counts.size)
    val it = state.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue()(0))
    }
    out.writeLong(state.err)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[UTF8String, Array[Long]](capacity * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), Array(in.readLong()))
      i += 1
    }
    new MisraGriesState(m, in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
