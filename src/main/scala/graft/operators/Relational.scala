package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The host-DataFrame surface (SURVEY §2.2): the relational operators
  * a reference user composes around the kernels, expressed so Catalyst
  * gets full pushdown/pruning. Every query is deterministic (total
  * orderings, id tie-breaks) and float outputs are rounded with the
  * `+ 0.0` negative-zero normalization so -0.0 hashes like 0.0 in the
  * cross-engine compare.
  *
  * Scale notes per query are in SURVEY §4: joins broadcast their dim
  * side, aggregations are partial before shuffle (Spark default), and
  * window partitions key on high-cardinality ids.
  */
object Relational {

  private def r2(c: org.apache.spark.sql.Column) = round(c, 2) + lit(0.0)
  private def r4(c: org.apache.spark.sql.Column) = round(c, 4) + lit(0.0)

  /** Filter + projection — predicate and column pruning reach the scan. */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1995-02-01")
        && col("l_discount") > 0.08)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q1 shape: wide aggregate over lineitem. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r4(avg(col("l_quantity"))).as("avg_qty"),
        r4(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: 3-way join (dims broadcast) + agg + top-N. */
  def q3JoinTopN(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1995-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1995-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(broadcast(ord), li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Global sort + limit. */
  def sortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** Window functions: rank + running sum per supplier (total order
    * within partition via (shipdate, orderkey, linenumber)).
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_shipdate"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("run_qty", r2(sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .drop("l_quantity", "l_shipdate")
      .orderBy("l_suppkey", "rn")
  }

  /** distinct + count-distinct (exact); [[approxDistinctCounts]] is
    * the sketch counterpart. Oracle checks the exact one.
    */
  def distinctCounts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      count(lit(1)).as("n_rows"))

  /** Hierarchical rollup: (returnflag, linestatus) → (returnflag) →
    * grand total in one pass — Spark expands grouping sets before the
    * shuffle, so it stays a single aggregation exchange.
    */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Statistical aggregates (sample stddev/covariance/correlation) —
    * one partial-aggregable pass; Spark and DuckDB share the sample
    * (n−1) definitions so the row is oracle-exact after rounding.
    */
  def statsAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        r2(stddev_samp(col("l_extendedprice"))).as("sd_price"),
        r2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_qty_price"),
        (round(corr(col("l_quantity"), col("l_extendedprice")), 4) + lit(0.0))
          .as("corr_qty_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** CUBE: all 2^k grouping sets in one pass — Spark plans rollup and
    * cube through a single Expand + one exchange, so the full lattice
    * costs one shuffle, not 2^k scans. `grouping()` disambiguates a
    * genuine NULL key from a subtotal row (the standard SQL marker).
    */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("cnt"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact interpolated percentiles of order value per status — Spark
    * `percentile` matches DuckDB `quantile_cont` semantics, so this is
    * oracle-checkable; at 100 TB the same query swaps in
    * `approx_percentile` (t-digest) for a fixed-size-sketch shuffle.
    */
  def quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        r2(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        r2(expr("percentile(o_totalprice, 0.9)")).as("p90"),
        r2(expr("percentile(o_totalprice, 0.99)")).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Approximate percentiles — the 100 TB companion of [[quantiles]]:
    * `approx_percentile` aggregates a bounded sketch per partition
    * (accuracy 10000 ⇒ rank error ≤ 1/10000) instead of shuffling and
    * sorting every value. Rows-only in the driver gate (engines'
    * sketches differ); RelationalSpec bounds the error against the
    * exact interpolated percentiles.
    */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        r2(expr("approx_percentile(o_totalprice, 0.5, 10000)")).as("p50_approx"),
        r2(expr("approx_percentile(o_totalprice, 0.9, 10000)")).as("p90_approx"),
        r2(expr("approx_percentile(o_totalprice, 0.99, 10000)")).as("p99_approx"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** HyperLogLog++ approximate count-distinct — the 100 TB path: the
    * exact form shuffles every distinct value; the sketch shuffles one
    * fixed-size buffer per partition. rsd 1% here; rows-only in the
    * driver gate (engines' HLL estimates differ), with the error
    * bound asserted in ScalaTest against the exact counts.
    */
  def approxDistinctCounts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.01).as("n_parts_approx"),
      approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("n_supps_approx"),
      count(lit(1)).as("n_rows"))

  /** Anti join: customers with no large order (plain "never ordered"
    * is empty in the synthetic data at every SF).
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
    c.join(bigOrders, c("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Semi join: parts that appear in some lineitem. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    p.join(Tables.lineitem(s, dir), p("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_brand")
      .orderBy("p_partkey")
  }

  /** Union + conditional aggregation. */
  def unionCase(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderstatus").as("status"))
    val l = Tables.lineitem(s, dir).select(col("l_linestatus").as("status"))
    o.unionAll(l).groupBy("status")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("status")
  }

  /** Conditional aggregation with case-when. */
  def caseAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("hi_disc"),
        sum(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("hi_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** Tumbling 1-hour window over the event stream (batch form; the
    * streaming variant in graft.streaming computes the same thing).
    */
  def eventsWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), r4(sum(col("value"))).as("sum_value"))
      .orderBy("w", "event_type")

  /** JSON extraction from the props column — exactly ONE parse per
    * row (round-4 verdict #2: the previous filter-then-select form
    * restated the parse in both the Filter and the Project).
    * Project-then-filter alone does not fix it:
    * `PushPredicateThroughNonJoin` substitutes the alias back into the
    * pushed-down predicate, recreating the double parse. The 1-element
    * `explode` is the optimizer barrier — predicates referencing
    * generator output never push through a Generate, so the parse
    * stays in one scan-stage projection and the filter consumes its
    * result. PlanAuditSpec counts the `get_json_object` calls in the
    * optimized plan.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, dir)
      // LOAD-BEARING: this 1-element explode is the optimizer barrier
      // described above — do NOT "simplify" it to a plain projection,
      // or predicate pushdown re-substitutes the JSON parse into the
      // filter and the parse runs twice per row. If a future Spark
      // adds a rule eliminating trivial Generates, PlanAuditSpec's
      // parse count fails and this needs a new barrier (e.g. a
      // non-deterministic wrapper).
      .select(col("event_id"), explode(array(k)).as("k"))
      .filter(col("k") > 90)
      .orderBy("event_id")
  }

  /** AS-OF JOIN — the time-series join Spark lacks natively: each
    * left row is matched to the LATEST right row with the same key
    * and right ts ≤ left ts (inclusive — DuckDB `ASOF JOIN`
    * semantics; unmatched left rows keep nulls, like ASOF LEFT JOIN).
    *
    * Plan shape: ONE shuffle on the key. Both sides are unioned with
    * a side tag, and a running `last(_, ignoreNulls)` window over the
    * (ts, side)-ordered union carries the most recent right payload
    * forward to every left row — no range/theta join, no per-row
    * probe, no state beyond the window frame. At equal timestamps the
    * right row sorts first, so it IS visible to a same-ts left row.
    * Right rows should be unique per (key, ts) — pre-aggregate
    * otherwise; with duplicates the carried payload is the last in
    * (key, ts) input order, which is not deterministic under shuffle.
    *
    * Output: every left column, plus each non-key/ts right column
    * (nullable — null when no right row precedes).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String): DataFrame = {
    val p = asofPrep(left, right, keyCol, tsCol)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = p.union
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    asofFinish(carried, p)
  }

  /** The 100 TB form of [[asofJoin]] — same semantics, hot key split.
    * The single-pass window keys on the JOIN key, so one dominant key
    * (the hot symbol in market data, the bot account in event logs)
    * serializes its entire timeline into ONE task AQE cannot split —
    * the only place in [[asofJoin]] where per-key work is unbounded.
    * Per-key ORDER is inherent to as-of semantics, but it composes
    * across time ranges, so this form runs the classic two-pass
    * split: bucket the union by `floor(ts / bucketWidthMicros)`, run
    * the same running-last window WITHIN (key, bucket) — per-task
    * work is now bounded by one key's rows per bucket — then compute
    * each bucket's carry-in from the per-(key, bucket) SUMMARY rows
    * (one row per bucket: the second window is over a frame
    * `timespan / bucketWidth` long, not row-scale) and join it back
    * (AQE-splittable). `coalesce(within-bucket, carry-in)` is exactly
    * the single-pass result: ties on (ts, side) are resolved
    * identically because the summary keeps the within-bucket
    * window's OWN last value at the bucket's max (ts, side).
    *
    * Pick `bucketWidthMicros` so a hot key's rows-per-bucket fit a
    * task comfortably (e.g. an hour for event data); correctness
    * does not depend on the choice — `AsofSpec` asserts equality
    * with [[asofJoin]] across widths including degenerate ones.
    */
  def asofJoinBucketed(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      bucketWidthMicros: Long): DataFrame = {
    require(bucketWidthMicros > 0, s"bucketWidthMicros must be > 0, got $bucketWidthMicros")
    val p = asofPrep(left, right, keyCol, tsCol)
    val tsNum = left.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("__ts"))
      case _: org.apache.spark.sql.types.NumericType => col("__ts").cast("long")
      case t => throw new IllegalArgumentException(
        s"asofJoinBucketed needs a timestamp or numeric ts column, got $t")
    }
    // floor() over double division is exact here: event-time micros
    // (~1.7e15) sit far inside double's 2^53 integer range
    val u = p.union.withColumn("__b", floor(tsNum / lit(bucketWidthMicros.toDouble)))
    val w1 = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("__local", last(col("__rp"), ignoreNulls = true).over(w1))
    // one summary row per (key, bucket): the running value at the
    // bucket's last (ts, side) — max(struct) picks that row and
    // carries its __local, so downstream buckets see exactly what the
    // single-pass window would have carried across the boundary
    val summaries = local.groupBy("__k", "__b")
      .agg(max(struct(col("__ts"), col("__side"), col("__local"))).as("__e"))
      .select(col("__k"), col("__b"), col("__e").getField("__local").as("__blast"))
    val w2 = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = summaries
      .withColumn("__carry", last(col("__blast"), ignoreNulls = true).over(w2))
      .select("__k", "__b", "__carry")
    val carried = local.join(carryIn, Seq("__k", "__b"))
      .filter(col("__side") === 1)
      .withColumn("__match", coalesce(col("__local"), col("__carry")))
    asofFinish(carried, p)
  }

  /** Shared front of the as-of forms: null handling, side tagging,
    * payload structs. `union` is the (key, ts, side, lp, rp) union
    * both forms window over; `unmatchable` the null-key/ts left rows
    * that survive with null payloads.
    */
  private case class AsofParts(
      union: DataFrame, unmatchable: DataFrame,
      leftCols: Seq[String], rightValueCols: Seq[String])

  private def asofPrep(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String): AsofParts = {
    val rightValueCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    require(rightValueCols.nonEmpty, "right side has no payload columns")
    val leftCols = left.columns
    val clash = leftCols.toSet.intersect(rightValueCols.toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")} — " +
        "rename one side (the output would carry ambiguous duplicate names)")
    val rp = struct(rightValueCols.map(col): _*)
    val rpType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(f => f.name == keyCol || f.name == tsCol))
    val lp = struct(leftCols.map(col): _*)
    val lpType = left.schema
    // SQL join semantics for nulls: a null key or null ts can never
    // satisfy `l.key = r.key AND l.ts >= r.ts` — null-keyed/ts right
    // rows match nothing (dropped from the carry), null-keyed/ts left
    // rows match nothing but SURVIVE unmatched (left-join). Without
    // this, Spark's nulls-first sort would carry a null-ts right
    // payload to every left row and null keys would match each other.
    val leftValid = col(keyCol).isNotNull && col(tsCol).isNotNull
    val lS = left.filter(leftValid)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        lit(1).as("__side"), lp.as("__lp"), lit(null).cast(rpType).as("__rp"))
    val rS = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        lit(0).as("__side"), lit(null).cast(lpType).as("__lp"), rp.as("__rp"))
    val unmatchable = left.filter(!leftValid)
      .select(leftCols.map(col) ++
        rpType.fields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    AsofParts(lS.unionAll(rS), unmatchable, leftCols.toSeq, rightValueCols.toSeq)
  }

  private def asofFinish(carried: DataFrame, p: AsofParts): DataFrame = {
    val matched = carried.select(p.leftCols.map(c => col(s"__lp.$c").as(c)) ++
      p.rightValueCols.map(c => col(s"__match.$c").as(c)): _*)
    matched.unionAll(p.unmatchable)
  }

  /** Gate form of [[asofJoin]]: each click event matched to the user's
    * most recent purchase at or before it. `bucketWidthMicros > 0`
    * routes through [[asofJoinBucketed]] — same oracle, so the
    * hot-key-splitting form is driver-checked against DuckDB's native
    * ASOF too.
    */
  def asofClickPurchase(
      s: SparkSession, dir: String, bucketWidthMicros: Long = 0L): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val joined =
      if (bucketWidthMicros > 0)
        asofJoinBucketed(clicks, purchases, "user_id", "ts", bucketWidthMicros)
      else asofJoin(clicks, purchases, "user_id", "ts")
    joined
      .select(col("event_id"), col("user_id"), col("ts"),
        r4(col("value")).as("last_purchase_value"))
      .orderBy("event_id")
  }

  /** Sessionization: 30-min-gap sessions per user (gaps-and-islands,
    * integer micros math for engine parity). One shuffle on user_id.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeEvents(Tables.events(s, dir))

  def sessionizeEvents(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(byUser) > 1800000000L, 1L).otherwise(
          when(lag(col("us"), 1).over(byUser).isNull, 1L).otherwise(0L)))
      .withColumn("session_id", sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** Deterministic stratified sample: exactly `n` rows per group,
    * selected by md5-hash order of the id — reproducible across runs,
    * engines, and partitionings (same portability contract as
    * [[Curate.hashBucket]]).
    *
    * Plan shape is the skew-proof two-phase top-n: a single window
    * over the group key would put an entire 100 TB group in one
    * partition, so phase 1 ranks within (group, salt-bucket) — 32-way
    * parallel per group — and keeps `n` per bucket; phase 2 ranks the
    * surviving ≤ 32·n rows per group. Both phases agree on the same
    * total (hash, id) order, so keeping n-per-bucket loses nothing:
    * the global top-n of a merged order is contained in the union of
    * per-bucket top-ns. Shuffle 2 carries ≤ salts·n rows per group
    * regardless of group size.
    */
  def stratifiedSample(
      df: DataFrame, groupCol: String, idCol: String, n: Int,
      salts: Int = 32): DataFrame = {
    require(n > 0, s"n must be > 0, got $n")
    twoPhaseTopN(df, groupCol, idCol, lit(n), salts)
  }

  /** The shared two-phase machinery with a PER-ROW quota column —
    * [[stratifiedSample]] passes a constant, `Curate.mixtureSample` a
    * per-group CASE. The quota expression must be functionally
    * determined by `groupCol` (every row of a group sees the same
    * bound), or phase 1's per-bucket cut is not a superset of the
    * global cut.
    */
  private[operators] def twoPhaseTopN(
      df: DataFrame, groupCol: String, idCol: String, quota: Column,
      salts: Int = 32): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val salted = Window.partitionBy(col(groupCol), pmod(xxhash64(col(idCol)), lit(salts)))
      .orderBy(h, col(idCol))
    val global = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("__prn", row_number().over(salted))
      .filter(col("__prn") <= quota)
      .drop("__prn")
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= quota)
  }

  /** Gate form: 10 orders per order-status, hash-selected. */
  def stratifiedSampleOrders(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(
      Tables.orders(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice"),
      "o_orderstatus", "o_orderkey", n = 10)
      .select(col("o_orderstatus"), col("rank"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderstatus", "rank")

  /** Pivot: order-status columns per order year. Pivot values are
    * listed explicitly — with an inferred value set Spark runs an
    * extra distinct job AND the output schema depends on the data;
    * explicit values keep it a single aggregation exchange with
    * grouping-set-free CASE/sum rewriting (same plan a hand-written
    * conditional agg gets).
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"), col("o_totalprice"))
      .groupBy("o_year")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(r2(sum(col("o_totalprice"))))
      .select(col("o_year").cast("long").as("o_year"), col("F").as("total_f"),
        col("O").as("total_o"), col("P").as("total_p"))
      .orderBy("o_year")

  /** Trailing-interval ROLLING aggregation (time-series feature): per
    * user, the 1-hour trailing sum/count of event values — a
    * RANGE-frame window over epoch-millis, so rows with equal
    * timestamps share a frame (deterministic, unlike a ROWS frame
    * under ties). One shuffle on user_id; frames are computed in a
    * single pass per partition.
    */
  def rollingHour(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_ms"))
      .rangeBetween(-3600000L, 0L)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("epoch_ms", unix_millis(col("ts")))
      .select(col("event_id"), col("user_id"),
        (round(sum(col("value")).over(w), 4) + lit(0.0)).as("trailing_sum"),
        count(lit(1)).over(w).as("trailing_n"))
      .orderBy("event_id")
  }

  /** Sessionization via the built-in `session_window` (Spark's native
    * session assignment — one shuffle on (user_id, merged windows), no
    * window-function pass). Same 30-minute-gap semantics as
    * [[sessionize]]; the streaming form is
    * graft.streaming.EventStream.sessionize.
    */
  /** The hot-key-split form of [[sessionize]] — same gaps-and-islands
    * semantics, per-task work bounded. The single-pass lag/cumsum
    * windows key on `user_id`, so one bot account's entire timeline
    * lands in ONE task (the [[asofJoinBucketed]] argument — per-key
    * order is inherent to sessionization, but it composes across time
    * ranges). Pass 1 runs the SAME lag/cumsum within
    * (user, floor(us / bucketWidthMicros)); pass 2 reduces each
    * bucket to one summary row (count of in-bucket breaks, first/last
    * event time), windows over those summary rows — frame =
    * timespan/width, not row-scale — to decide each bucket's
    * first-row break (gap vs the previous non-empty bucket's last
    * event) and its exclusive running break offset, and joins the
    * offsets back on (user, bucket) (AQE-splittable). session_id =
    * offset + first-row break + in-bucket running sum reproduces the
    * single-pass numbering exactly; `RelationalSpec` asserts equality
    * across widths including degenerate ones, and the shared oracle
    * checks the driver shape against DuckDB.
    */
  def sessionizeBucketed(
      s: SparkSession, dir: String, bucketWidthMicros: Long): DataFrame =
    sessionizeEventsBucketed(Tables.events(s, dir), bucketWidthMicros)

  def sessionizeEventsBucketed(
      events: DataFrame, bucketWidthMicros: Long): DataFrame = {
    require(bucketWidthMicros > 0,
      s"bucketWidthMicros must be > 0, got $bucketWidthMicros")
    val ev = events
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("b", floor(col("us") / lit(bucketWidthMicros.toDouble)))
    val w1 = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts"), col("event_id"))
    val local = ev
      // break vs the PREVIOUS IN-BUCKET row; a bucket's first row
      // (lag null) contributes 0 here — its break is decided from the
      // summary carry, where the previous bucket's last event lives
      .withColumn("new_s_local",
        when(col("us") - lag(col("us"), 1).over(w1) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("local_cum", sum(col("new_s_local"))
        .over(w1.rowsBetween(Window.unboundedPreceding, 0)))
    val summaries = local.groupBy("user_id", "b")
      .agg(sum(col("new_s_local")).as("n_breaks_local"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"))
    // one row per non-empty (user, bucket): lag(1) IS the previous
    // non-empty bucket, empty buckets simply have no row
    val ws = Window.partitionBy(col("user_id")).orderBy(col("b"))
    val offsets = summaries
      .withColumn("prev_last_us", lag(col("last_us"), 1).over(ws))
      .withColumn("first_break",
        when(col("prev_last_us").isNull, 1L).otherwise(
          when(col("first_us") - col("prev_last_us") > 1800000000L, 1L)
            .otherwise(0L)))
      .withColumn("offset", coalesce(
        sum(col("first_break") + col("n_breaks_local"))
          .over(ws.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("user_id", "b", "first_break", "offset")
    local.join(offsets, Seq("user_id", "b"))
      .withColumn("session_id",
        col("offset") + col("first_break") + col("local_cum"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  def sessionizeWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")

  /** Z-ORDER curve value of two 16-bit keys — the multi-dimensional
    * layout key behind lakehouse Z-ORDER clustering (Delta/Iceberg):
    * sort-then-write by `zValue(a, b)` and rows close in BOTH
    * dimensions land in the same files/row groups, so min-max stats
    * prune scans filtered on either or both. Bit interleave via the
    * standard spread-bits magic masks — pure 64-bit integer
    * arithmetic (`&`, `|`, `<<`), identical in any engine, so the
    * layout key is oracle-checkable and portable. Inputs are taken
    * mod 2¹⁶ (callers range-scale first for true min-max Z-order).
    *
    * Locality guarantee (pinned by RelationalSpec): fixing the high
    * h bits of both keys fixes the high 2h bits of z — every
    * (2^(16-h))² tile occupies ONE contiguous z range.
    */
  def zValue(a: Column, b: Column): Column = {
    def spread(x0: Column): Column = {
      val x1 = x0.bitwiseAND(lit(0xFFFFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FFL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x33333333L))
      x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(pmod(a.cast("long"), lit(65536L)))
      .bitwiseOR(shiftleft(spread(pmod(b.cast("long"), lit(65536L))), 1))
  }

  /** The Ed-Join CANDIDATE stage of [[fuzzyJoinPairs]] — (id1, id2)
    * pairs sharing a rare prefix gram (or a length band, short
    * strings), before levenshtein verification. Exposed so the scale
    * smoke can price candidate fan-out (Σ df² over prefix grams)
    * separately from verify cost on adversarial keyspaces — the
    * dense-keyspace degradation BASELINE.md documents.
    */
  private[graft] def fuzzyJoinCandidates(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 3,
      maxGramDf: Int = 0,
      maxCandidates: Long = 4_000_000_000L): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    require(maxGramDf >= 0, s"maxGramDf must be >= 0 (0 = derive from maxCandidates), got $maxGramDf")
    require(maxCandidates >= 1, s"maxCandidates must be >= 1, got $maxCandidates")
    import graft.functions.TextFunctions.charShingles
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))
    // maxDist = 1 takes the 1-DELETION-NEIGHBORHOOD path (FastSS,
    // Bocek et al. '07 / SymSpell — public literature): see
    // [[deletionCandidates]]. Measured at the sf0.1 bench point the
    // gram path's 22M-row prefix self-join → 10.1M distinct
    // candidates collapses to ~0.3M deletion-key rows → candidates ≈
    // the true-pair volume; the positional Ed-Join filter was the
    // measured-dead alternative (93.9% of the fan-out passes it on
    // the zero-padded keyspace — plans/r17). q is a gram-path
    // parameter and is ignored here.
    if (maxDist == 1) deletionCandidates(base, maxGramDf, maxCandidates)
    else gramCandidates(base, maxDist, q, maxGramDf, maxCandidates)
  }

  /** Candidates within edit distance 1 via 1-deletion neighborhoods
    * (FastSS / SymSpell): two strings are within levenshtein 1 IFF
    * their {s} ∪ {s minus one char} key sets intersect —
    *   dist 0 shares s itself; an insert/delete pair shares the
    *   shorter string; a substitution at position i shares the
    *   deletion of position i — so the equi-join on deletion keys is
    * LOSSLESS, and (unlike gram blocking) the key is almost the whole
    * string, so a key's df is the size of an actual near-dup family
    * rather than a gram's corpus frequency. False positives (pairs at
    * distance 2 sharing a variant, e.g. "abx"/"ayb" via "ab") are
    * removed by the caller's levenshtein verify, exactly like gram
    * candidates. Same priced runaway guard as the gram path: a
    * SELECTED key's df above cap = maxCandidates / Σ(len+1) refuses
    * in-plan by name (Σ df² ≤ cap · Σ df keeps `maxCandidates` a hard
    * ceiling); an explicit maxGramDf overrides the derivation.
    */
  private def deletionCandidates(
      base: DataFrame,
      maxGramDf: Int,
      maxCandidates: Long): DataFrame = {
    // {s} ∪ deletion variants, distinct per string (duplicate
    // variants from repeated adjacent chars dedup at the source);
    // null strings generate no keys and no pairs, the empty string's
    // neighborhood is itself. SQL substring/length count characters,
    // matching the levenshtein verify.
    val keys = base.filter(col("s").isNotNull)
      .select(col("id"), explode(
        when(col("len") === 0, array(col("s")))
          .otherwise(array_distinct(concat(array(col("s")), expr(
            "transform(sequence(1, len), " +
              "i -> concat(substring(s, 1, i-1), substring(s, i+1, len)))"))))
        ).as("k"))
    val delCap: Long =
      if (maxGramDf > 0) maxGramDf.toLong
      else {
        val totalKeyRows = math.max(1L, keys.count())
        math.max(256L, maxCandidates / totalKeyRows)
      }
    val kdf = keys.groupBy("k").agg(count(lit(1)).as("df"))
    val delGuardMsg = concat(
      lit("fuzzy join candidate runaway: deletion key '"), col("k"),
      lit("' indexes "), col("df"),
      lit(s" strings (> cap $delCap, up to df² candidate pairs from " +
        "this key alone; cap = maxCandidates / Σ(len+1)). That many " +
        "strings sit within one edit of a single variant — pre-block " +
        "on another key or raise maxGramDf/maxCandidates if the " +
        "quadratic cost is intended"))
    // the guard wraps the join key itself so column pruning can never
    // drop it (the gram path's convention)
    val keyed = keys.join(kdf, Seq("k"))
      .select(col("id"),
        when(col("df") > delCap, raise_error(delGuardMsg))
          .otherwise(col("k")).as("k"))
    keyed.select(col("id").as("id1"), col("k"))
      .join(keyed.select(col("id").as("id2"), col("k")), Seq("k"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** The gram-blocking (Ed-Join) candidate path for maxDist ≥ 2 —
    * the pre-round-17 [[fuzzyJoinCandidates]] body, unchanged.
    */
  private def gramCandidates(
      base: DataFrame,
      maxDist: Int,
      q: Int,
      maxGramDf: Int,
      maxCandidates: Long): DataFrame = {
    import graft.functions.TextFunctions.charShingles
    // PRICED per-gram cap: Σ pdf² (the candidate volume) is bounded by
    // max_pdf · Σ pdf ≤ cap · n·(q·maxDist+1), so cap =
    // maxCandidates / (n·(q·maxDist+1)) makes `maxCandidates` a hard
    // ceiling on candidate rows whatever the gram distribution. The
    // one count() is trivial next to the shingle passes. An explicit
    // maxGramDf overrides the derivation (tests, callers that know
    // their keyspace).
    val gramCap: Long =
      if (maxGramDf > 0) maxGramDf.toLong
      else {
        val n = math.max(1L, base.count())
        math.max(256L, maxCandidates / (n * (q.toLong * maxDist + 1)))
      }
    val minLen = q * (maxDist + 1)
    val long = base.filter(col("len") >= minLen)
    // positional q-grams are the Ed-Join unit; charShingles is
    // DISTINCT per string, which only SHRINKS df (a gram lost to
    // distinctness was a duplicate — edits destroy occurrences, and
    // the pigeonhole argument needs any q·d+1 grams, distinct or not)
    val sh = long.select(col("id"), explode(charShingles(col("s"), q)).as("g"))
    val dfs = sh.groupBy("g").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df").asc, col("g").asc)
    // FAN-OUT GUARD (the intervalJoin treatment — round-12 verdict
    // #2): a prefix gram with df D contributes up to D² candidate
    // rows; on a dense keyspace (all strings near-identical — the
    // BASELINE-documented degradation) even each string's RAREST
    // grams index a large fraction of the corpus and the self-join
    // below runs away quadratically in shuffle rows, not FLOPs.
    // Refuse loudly, in-plan (zero extra jobs beyond the count: the
    // df is already on every prefix row), when a SELECTED prefix
    // gram's df exceeds the priced cap — global df bounds the
    // prefix-side df, so each gram contributes at most cap² and the
    // total stays under `maxCandidates`. The guard wraps the join
    // key itself so column pruning can never drop it.
    val gramGuardMsg = concat(
      lit("fuzzy join candidate runaway: prefix gram '"), col("g"),
      lit(s"' indexes "), col("df"),
      lit(s" strings (> cap $gramCap, up to df² candidate pairs from " +
        "this gram alone; cap = maxCandidates / (n*(q*maxDist+1))). The " +
        "keyspace is too dense for Ed-Join blocking at this (q, maxDist): " +
        "raise q, lower maxDist, pre-block on another key, or raise " +
        "maxGramDf/maxCandidates if the quadratic cost is intended"))
    val prefix = sh.join(dfs, Seq("g"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= q * maxDist + 1)
      .join(long.select(col("id"), col("len")), Seq("id"))
      .select(col("id"),
        when(col("df") > gramCap, raise_error(gramGuardMsg))
          .otherwise(col("g")).as("g"),
        col("len"))
    val candLong = prefix.select(col("id").as("id1"), col("g"), col("len").as("l1"))
      .join(prefix.select(col("id").as("id2"), col("g"), col("len").as("l2")), Seq("g"))
      .filter(col("id1") < col("id2") &&
        abs(col("l1") - col("l2")) <= maxDist)
      .select("id1", "id2").distinct()
    // short strings: every candidate in the ±maxDist length band (the
    // band of a ≤ minLen-char string is itself tiny, so this block is
    // bounded). The band condition is EXPLODED to exact-length keys so
    // the join is an equi-join — a |l1−l2| ≤ d predicate would plan as
    // a nested-loop join, the shape the plan audit bans.
    //
    // "Bounded" holds for LENGTH DIVERSITY, not row counts: a corpus
    // of 10⁶ two-char codes puts 10⁶ rows in one length block →
    // 10¹² in-band pairs. Same guard: a length block larger than
    // max(cap, √maxCandidates) refuses with the block named (√ because
    // a block's pairs are lcnt², not df·lcnt).
    val short = base.filter(col("len") < minLen)
    val bandCnt = base.filter(col("len") < minLen + maxDist)
      .groupBy(col("len").as("lk")).agg(count(lit(1)).as("lcnt"))
    val bandCap: Long =
      if (maxGramDf > 0) maxGramDf.toLong
      else math.max(gramCap, math.sqrt(maxCandidates.toDouble).toLong)
    val bandGuardMsg = concat(
      lit("fuzzy join candidate runaway: length band "), col("lk"),
      lit(" holds "), col("lcnt"),
      lit(s" short strings (> cap $bandCap; short strings join their " +
        "whole ±maxDist length band). Pre-block on another key or raise " +
        "maxGramDf/maxCandidates if the quadratic cost is intended"))
    val candShort = short.select(col("id").as("id1"),
        explode(sequence(greatest(col("len") - maxDist, lit(0)),
          col("len") + maxDist)).as("lk"))
      .join(bandCnt, Seq("lk"), "left")
      .select(col("id1"),
        when(col("lcnt") > bandCap, raise_error(bandGuardMsg))
          .otherwise(col("lk")).as("lk"))
      .join(base.select(col("id").as("id2"), col("len").as("lk")), Seq("lk"))
      .filter(col("id1") =!= col("id2"))
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
      .distinct()
    // NO distinct over the union: the two branches are provably
    // DISJOINT — every candLong pair has BOTH strings ≥ minLen (both
    // sides come from `long`), while every candShort pair contains at
    // least one string < minLen (one side always comes from `short`;
    // the least/greatest swap reorders ids, never membership) — so no
    // (id1, id2) can appear in both, and each branch is already
    // internally distinct. The union-level distinct re-shuffled the
    // ENTIRE candidate set (10M rows at the sf0.1 bench point for
    // 19.5k verified pairs) to deduplicate nothing.
    candLong.union(candShort)
  }

  /** FUZZY self-join (entity resolution): all pairs of rows whose
    * strings are within levenshtein `maxDist` — the record-linkage op
    * (near-identical names/titles/URLs differing by typos or ids).
    *
    * An all-pairs levenshtein is O(n²·len²) — the blocking here is
    * Ed-Join's prefix filter (Xiao et al. VLDB'08, positional q-grams;
    * same family as the Jaccard prefix filter in
    * [[Dedup.ngramJaccardPairs]]): `maxDist` edits destroy at most
    * q·maxDist of a string's q-grams, so any pair within distance
    * must share one of each side's (q·maxDist + 1) RAREST grams under
    * a global (df, gram) order. Only those prefix grams are index
    * keys; candidates are additionally length-filtered
    * (|len₁ − len₂| ≤ maxDist) and verified with the built-in
    * `levenshtein` — lossless for strings of ≥ q·(maxDist+1) chars
    * (shorter strings can lose every gram to edits; they are joined
    * within their ±maxDist LENGTH BAND instead, a bounded block
    * because the band of a short string is itself short). Fan-out is
    * Σ df² over prefix grams — rare grams by construction. Output:
    * (id1, id2, dist), id1 < id2.
    *
    * `maxGramDf` is the candidate-runaway valve: any SELECTED prefix
    * gram (or short-string length band) indexing more than this many
    * strings refuses in-plan with a named raise_error instead of
    * shuffling up to df² candidate rows — the dense-keyspace
    * degradation is priced (via [[fuzzyJoinCandidates]]) and refused,
    * never silently quadratic (round-12 verdict #2).
    */
  def fuzzyJoinPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 3,
      maxGramDf: Int = 20000): DataFrame = {
    val cand = fuzzyJoinCandidates(df, idCol, strCol, maxDist, q, maxGramDf)
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    val strs = base.select(col("id"), col("s"))
    cand
      .join(strs.select(col("id").as("id1"), col("s").as("s1")), Seq("id1"))
      .join(strs.select(col("id").as("id2"), col("s").as("s2")), Seq("id2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id1", "id2", "dist")
      .orderBy("id1", "id2")
  }

  /** Epoch-micros column for an interval-join bound: timestamps (tz
    * or ntz) via unix_micros, numerics interpreted AS micros (cast,
    * never re-scaled) — one unit rule shared by the batch joins and
    * the streaming [[graft.streaming.EventStream.intervalEnrich]], so
    * a long column means the same instant on both paths.
    */
  private[graft] def tsNumeric(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp"))
      case _: org.apache.spark.sql.types.NumericType => col(c).cast("long")
      case t => throw new IllegalArgumentException(
        s"interval join needs a timestamp or numeric column, $c is $t")
    }

  private[graft] def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val dup = a.columns.toSet.intersect(b.columns.toSet)
    require(dup.isEmpty,
      s"interval join requires disjoint column names; both sides have: ${dup.mkString(", ")}")
  }

  /** Bucket KEY for an epoch-micros column: the bucket's start micros,
    * `u - pmod(u, w)` — EXACT long arithmetic (pmod handles negative
    * micros with a non-negative remainder, so this is true floor
    * alignment). The earlier `floor(u / w.toDouble)` form was exact
    * only inside double's 2^53 integer range: the year-9999
    * "never expires" sentinel (~2.5e17 micros) rounds by up to ~32 µs
    * in the long→double conversion, which can shift floor across a
    * bucket boundary and silently drop a boundary-bucket containing
    * pair. Bucket-start keys are bijective with bucket indices for a
    * fixed width, so join semantics are unchanged.
    *
    * CAVEAT at the long range's very bottom: when u's true bucket
    * start precedes Long.MinValue (i.e. pmod(u, w) > u − MinValue —
    * only possible for u within w-1 of MinValue), the subtraction
    * `u - pmod(u, w)` overflows — the true start is unrepresentable
    * (pmod is non-negative). Under ANSI mode (the Spark 4 default
    * this engine runs with) that raises ARITHMETIC_OVERFLOW loudly;
    * only with ANSI disabled would it wrap to a wrong positive key.
    * The BigInt property test pins equivalence on
    * [MinValue + w, MaxValue] and the loud failure at the edge;
    * epoch-micros timestamps sit ~10^11 buckets above it.
    */
  private[graft] def bucketKey(u: Column, wMicros: Long): Column =
    u - pmod(u, lit(wMicros))

  /** Guarded bucket-range column for the interval explodes: one
    * malformed row (an interval of years against a width of seconds —
    * the epoch-0 sentinel, the year-9999 "never expires" row) would
    * otherwise blow the sequence() array limit with an opaque
    * executor error mid-shuffle. `raise_error` names the row and the
    * fix instead; the branch costs one comparison next to the explode.
    * Elements are [[bucketKey]] bucket-start micros (exact longs),
    * stepped by the width.
    */
  private[graft] def bucketSeq(startU: Column, endU: Column, wMicros: Long,
      maxBuckets: Int): Column = {
    val lo = bucketKey(startU, wMicros)
    val hi = bucketKey(endU, wMicros)
    // the guard compares SPANS IN MICROS (exact; equivalent to the old
    // index comparison), with the cap saturated so a width past
    // Long.MaxValue/maxBuckets cannot overflow the literal
    val capMicros =
      if (wMicros > Long.MaxValue / maxBuckets) Long.MaxValue
      else wMicros * maxBuckets
    when(hi - lo >= capMicros, raise_error(concat(
        lit(s"interval spans >= $maxBuckets buckets (start micros "),
        startU, lit(", end micros "), endU,
        lit("); raise bucketWidthMicros toward the typical interval length, " +
          "or raise maxBucketsPerInterval if the replication cost is intended"))))
      .otherwise(sequence(lo, hi, lit(wMicros)))
  }

  /** Auto bucket width: the p75 interval length (one bounded
    * approx_percentile job over just the two bound columns), so ≥75%
    * of intervals replicate into ≤2 buckets and the worst replication
    * is bounded by the guard. A FIXED default width would be the same
    * trap as fixed LSH banding (round-7 discovery): right at one data
    * shape, quadratic or starved at another — the data picks here.
    * Zero-length/degenerate-heavy inputs clamp to 1s so the width
    * stays positive.
    */
  def intervalAutoWidthMicros(
      intervals: DataFrame, startCol: String, endCol: String): Long = {
    val su = tsNumeric(intervals, startCol)
    val eu = tsNumeric(intervals, endCol)
    val p75 = intervals
      .filter(col(startCol) <= col(endCol))
      .select((eu - su).as("__len"))
      .agg(expr("approx_percentile(__len, 0.75, 1000)"))
      .head()
    if (p75.isNullAt(0)) 1000000L else math.max(1000000L, p75.getLong(0))
  }

  /** Point-in-interval join (time-range join): every (point, interval)
    * pair with `startCol <= point ts <= endCol`, both bounds
    * inclusive. The declarative form — `points.join(intervals,
    * ts between start and end)` — has no equi-key, so Catalyst plans
    * a BroadcastNestedLoopJoin: O(|points|·|intervals|) comparisons
    * and a hard broadcast ceiling on the interval side. This form
    * buys an equi-join: each interval explodes into the fixed-width
    * time buckets it covers, each point carries its one bucket, and
    * the shuffle keys on the bucket. A containing pair shares exactly
    * the point's bucket — the interval covers it, the point is in it —
    * so every pair joins EXACTLY once and no distinct pass is needed.
    *
    * Cost model: Σ ceil(len/width)+1 interval replicas cross the
    * shuffle (ids + bounds, not payloads if the caller projects
    * first); pick `bucketWidthMicros` near the typical interval
    * length so replication stays ~2×. Width affects cost only, never
    * results (`IntervalJoinSpec` pins equality across widths). A
    * bursty bucket (incident storm hour) is ordinary equi-join skew —
    * AQE splits it, unlike a window partition. Degenerate intervals
    * (start > end) match nothing and are dropped at the scan.
    * Containment compares the [[tsNumeric]] micros forms, so a
    * timestamp side joins a long-micros side correctly.
    */
  def intervalJoin(
      points: DataFrame, pointTsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidthMicros: Long, maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidthMicros > 0, s"bucketWidthMicros must be > 0, got $bucketWidthMicros")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0, got $maxBucketsPerInterval")
    requireDisjoint(points, intervals)
    val p = points
      .withColumn("__pu", tsNumeric(points, pointTsCol))
      .withColumn("__pb", bucketKey(col("__pu"), bucketWidthMicros))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__su", tsNumeric(intervals, startCol))
      .withColumn("__eu", tsNumeric(intervals, endCol))
      .withColumn("__ib", explode(bucketSeq(
        col("__su"), col("__eu"), bucketWidthMicros, maxBucketsPerInterval)))
    p.join(iv, col("__pb") === col("__ib")
        && col("__pu") >= col("__su") && col("__pu") <= col("__eu"))
      .drop("__pb", "__ib", "__pu", "__su", "__eu")
  }

  /** Interval-overlap join: every (a, b) pair whose closed intervals
    * intersect (`aStart <= bEnd && bStart <= aEnd`). Same bucketed
    * equi-join as [[intervalJoin]], but with BOTH sides exploded a
    * pair can share many buckets — instead of a distinct shuffle over
    * the output, the join keeps a pair only in its FIRST overlapping
    * bucket, `floor(max(aStart, bStart) / width)`: max(start) lies
    * inside both intervals whenever they overlap (it is ≤ min(end)),
    * so that bucket is covered by both sides and each overlapping
    * pair survives in exactly one bucket. Dedup is a predicate, not a
    * shuffle. Width is cost-only, results are width-independent.
    */
  def intervalOverlapJoin(
      a: DataFrame, aStartCol: String, aEndCol: String,
      b: DataFrame, bStartCol: String, bEndCol: String,
      bucketWidthMicros: Long, maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidthMicros > 0, s"bucketWidthMicros must be > 0, got $bucketWidthMicros")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0, got $maxBucketsPerInterval")
    requireDisjoint(a, b)
    val ae = a.filter(col(aStartCol) <= col(aEndCol))
      .withColumn("__as", tsNumeric(a, aStartCol))
      .withColumn("__ae", tsNumeric(a, aEndCol))
      .withColumn("__ab", explode(bucketSeq(
        col("__as"), col("__ae"), bucketWidthMicros, maxBucketsPerInterval)))
    val be = b.filter(col(bStartCol) <= col(bEndCol))
      .withColumn("__bs", tsNumeric(b, bStartCol))
      .withColumn("__be", tsNumeric(b, bEndCol))
      .withColumn("__bb", explode(bucketSeq(
        col("__bs"), col("__be"), bucketWidthMicros, maxBucketsPerInterval)))
    val joined = ae.join(be, col("__ab") === col("__bb")
      && col("__as") <= col("__be") && col("__bs") <= col("__ae"))
    val firstOverlapBucket =
      bucketKey(greatest(col("__as"), col("__bs")), bucketWidthMicros)
    joined.filter(col("__ab") === firstOverlapBucket)
      .drop("__ab", "__bb", "__as", "__ae", "__bs", "__be")
  }
}
