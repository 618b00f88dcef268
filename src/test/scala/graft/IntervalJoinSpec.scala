package graft

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed interval joins must equal the naive nested-loop join
  * (crossJoin + filter) on every width — width is a cost knob, never a
  * semantics knob — and handle the closed-bound edge cases: touching
  * boundaries, zero-length intervals, degenerate start > end rows.
  */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  private def pts: DataFrame = {
    import spark.implicits._
    Seq((1L, 100L), (2L, 150L), (3L, 200L), (4L, 250L), (5L, 1000L), (6L, 99L))
      .toDF("pid", "pt")
  }

  private def ivs: DataFrame = {
    import spark.implicits._
    Seq(
      (10L, 100L, 200L),   // closed bounds: catches pt=100 and pt=200
      (11L, 200L, 200L),   // zero-length: catches exactly pt=200
      (12L, 260L, 990L),   // catches nothing
      (13L, 300L, 250L),   // degenerate start > end: dropped
      (14L, 0L, 5000L))    // long interval spanning many buckets
      .toDF("iid", "istart", "iend")
  }

  private def naivePairs: Set[(Long, Long)] =
    pts.crossJoin(ivs)
      .filter(col("pt") >= col("istart") && col("pt") <= col("iend"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("intervalJoin equals the nested-loop join across widths, closed bounds") {
    val expected = naivePairs
    assert(expected.contains((1L, 10L)) && expected.contains((3L, 10L))) // both bounds in
    assert(expected.contains((3L, 11L)))                                 // zero-length hit
    assert(!expected.exists(_._2 == 13L))                                // degenerate gone
    for (w <- Seq(1L, 7L, 100L, 1000L, 100000L)) {
      val got = Relational.intervalJoin(pts, "pt", ivs, "istart", "iend", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"width $w")
    }
  }

  test("bucket keys stay exact past double's 2^53 integer range (year-9999 sentinel)") {
    import spark.implicits._
    // Year-9999 micros (~2.53e17) sit beyond 2^53, where long->double
    // rounds by up to ~32 µs — the round-7 advice flagged the old
    // floor(u / w.toDouble) bucket ids there (they stayed consistent
    // only through the monotonicity of rounding, with points sliding
    // across bucket boundaries). The pmod bucket keys are EXACT longs;
    // this pins boundary containment at that magnitude: a point 1 µs
    // before a bucket boundary, intervals ending/starting exactly at
    // it. (253402300800000000 = year 9999-12-31T24:00 epoch micros,
    // a multiple of every width used below.)
    val boundary = 253402300800000000L
    val p = Seq((1L, boundary - 1L), (2L, boundary)).toDF("pid", "pt")
    val iv = Seq((10L, boundary - 5000L, boundary - 1L), // "never expires"-ish tail
                 (11L, boundary, boundary + 999L))
      .toDF("iid", "istart", "iend")
    for (w <- Seq(1000L, 64L, 1L)) {
      val got = Relational.intervalJoin(p, "pt", iv, "istart", "iend", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 11L)), s"width $w: $got")
    }
    val ov = Relational.intervalOverlapJoin(
        p.select(col("pt").as("as_"), (col("pt") + 0L).as("ae_"), col("pid")),
        "as_", "ae_",
        iv, "istart", "iend", 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ov == Set((1L, 10L), (2L, 11L)), s"overlap: $ov")
  }

  test("bucketKey/bucketSeq equal BigInt floor-division on [MinValue+w, MaxValue]") {
    import spark.implicits._
    // seeded adversarial sample: boundaries, off-by-ones around them,
    // negatives, epoch-0/year-9999 sentinels, and values past 2^53.
    // Domain matches the scaladoc's documented caveat: within (w-1)
    // of Long.MinValue the true bucket start is unrepresentable and
    // the key wraps (asserted separately below) — equivalence holds
    // everywhere at or above MinValue + w.
    val rnd = new scala.util.Random(19)
    val widths = Seq(1L, 7L, 1000L, 3600L * 1000000L)
    val base = Seq(0L, -1L, 1L, 253402300800000000L, -62135596800000000L,
      (1L << 53) - 1, (1L << 53) + 1, Long.MaxValue / 4, -(Long.MaxValue / 4),
      Long.MaxValue, Long.MinValue + 3600L * 1000000L)
    val us = (base ++ Seq.fill(200)(rnd.nextLong() % (1L << 58))).distinct
    for (w <- widths) {
      val expected = us.map { u =>
        val q = (BigInt(u) - BigInt(u).mod(BigInt(w))) // exact floor alignment
        u -> q.toLong
      }.toMap
      val got = us.toDF("u")
        .select(col("u"), Relational.bucketKey(col("u"), w).as("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      us.foreach { u =>
        assert(got(u) == expected(u), s"w=$w u=$u: got ${got(u)} want ${expected(u)}")
      }
    }
    // the documented bottom edge: when u's true bucket start precedes
    // Long.MinValue the subtraction overflows — under ANSI mode (the
    // Spark 4 default this engine runs with) that is a LOUD
    // ARITHMETIC_OVERFLOW, never a silently wrong key. Pinned here so
    // the behavior is a stated contract (unreachable for epoch-micros
    // data, which sits ~10^11 buckets above the edge).
    val e = intercept[Throwable] {
      Seq(Long.MinValue).toDF("u")
        .select(Relational.bucketKey(col("u"), 7L).as("k")).head()
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW"),
      s"bottom-edge key must fail loudly under ANSI, got: ${e.getMessage}")
    // bucketSeq against the same reference: the emitted range must be
    // exactly [key(start), key(start)+w, ..., key(end)] at the same
    // extreme magnitudes (spans kept under the guard)
    val y9999 = 253402300800000000L
    val seqCases = Seq( // (start, end, w)
      (y9999 - 5000L, y9999 - 1L, 1000L),
      (y9999, y9999, 7L),
      (-10L, 10L, 7L),
      ((1L << 53) - 3, (1L << 53) + 3, 2L))
    for ((s0, e0, w) <- seqCases) {
      def key(u: Long) = (BigInt(u) - BigInt(u).mod(BigInt(w))).toLong
      val want = (key(s0) to key(e0) by w).toSeq
      val got = Seq((s0, e0)).toDF("s", "e")
        .select(Relational.bucketSeq(col("s"), col("e"), w, 10000).as("ks"))
        .head().getSeq[Long](0)
      assert(got == want, s"bucketSeq($s0,$e0,$w): got $got want $want")
    }
    // the runaway guard saturates rather than overflows at huge widths
    val hugeW = Long.MaxValue / 100 // w*maxBuckets would overflow a long
    val one = Seq((0L, 1000L)).toDF("s", "e")
      .select(Relational.bucketSeq(col("s"), col("e"), hugeW, 10000).as("ks"))
      .head().getSeq[Long](0)
    assert(one == Seq(0L), s"huge-width interval must land in one bucket: $one")
  }

  test("intervalJoin emits each containing pair exactly once (no bucket double-count)") {
    for (w <- Seq(1L, 7L, 100L)) {
      val got = Relational.intervalJoin(pts, "pt", ivs, "istart", "iend", w)
        .groupBy("pid", "iid").count().filter(col("count") > 1).count()
      assert(got == 0L, s"width $w")
    }
  }

  test("intervalOverlapJoin equals the nested-loop join across widths; touch counts") {
    import spark.implicits._
    val a = Seq((1L, 100L, 200L), (2L, 500L, 500L), (3L, 900L, 800L), (4L, 0L, 10000L))
      .toDF("aid", "as", "ae")
    val b = Seq((10L, 200L, 300L),   // touches a1 at exactly 200
      (11L, 50L, 150L), (12L, 450L, 550L), (13L, 10001L, 10002L))
      .toDF("bid", "bs", "be")
    val expected = a.crossJoin(b)
      .filter(col("as") <= col("ae") && col("bs") <= col("be")
        && col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.contains((1L, 10L)))  // boundary touch IS an overlap
    assert(!expected.exists(_._1 == 3L))  // degenerate a row dropped
    assert(!expected.exists(_._2 == 13L)) // disjoint b row
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      // width 1 legitimately spans >10k buckets here: raise the budget
      val joined = Relational.intervalOverlapJoin(a, "as", "ae", b, "bs", "be", w,
          maxBucketsPerInterval = 100000)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(joined.toSet == expected, s"width $w")
      assert(joined.length == joined.toSet.size, s"width $w: pair emitted twice")
    }
  }

  test("timestamp columns route through unix_micros; mixed ts/long-micros sides join; strings rejected") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val p = Seq((1L, ts(100)), (2L, ts(500))).toDF("pid", "pt")
    val iv = Seq((10L, ts(90), ts(110))).toDF("iid", "istart", "iend")
    val got = Relational.intervalJoin(p, "pt", iv, "istart", "iend", 60L * 1000000)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
    // mixed: timestamp points against long-MICROS interval bounds —
    // containment compares the tsNumeric forms, one unit rule
    val ivUs = Seq((10L, 90L * 1000000, 110L * 1000000)).toDF("iid", "istart", "iend")
    val gotMixed = Relational.intervalJoin(p, "pt", ivUs, "istart", "iend", 60L * 1000000)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotMixed == Set((1L, 10L)))
    val e = intercept[IllegalArgumentException] {
      Relational.intervalJoin(p, "pt",
        Seq((10L, "x", "y")).toDF("iid", "istart", "iend"), "istart", "iend", 1L)
    }
    assert(e.getMessage.contains("timestamp or numeric"))
  }

  test("a runaway interval fails with a named error, not an opaque array blowup") {
    import spark.implicits._
    val iv = Seq((10L, 0L, Long.MaxValue / 2)).toDF("iid", "istart", "iend")
    val e = intercept[Exception] {
      Relational.intervalJoin(pts, "pt", iv, "istart", "iend", 10L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bucketWidthMicros")), s"got: ${messages(e)}")
    // the same interval with a matching width and an explicit budget passes
    val ok = Relational.intervalJoin(pts, "pt", iv, "istart", "iend",
      Long.MaxValue / 8, maxBucketsPerInterval = 10).count()
    assert(ok == pts.count())
  }

  test("auto width picks the p75 interval length and yields identical results") {
    val w = Relational.intervalAutoWidthMicros(ivs, "istart", "iend")
    // lengths of the valid intervals: 100, 0, 730, 5000 → p75 >= 730,
    // clamped to the 1s floor since these are tiny synthetic micros
    assert(w == 1000000L)
    import spark.implicits._
    val real = Seq((1L, 0L, 3600L * 1000000L), (2L, 0L, 7200L * 1000000L),
      (3L, 0L, 60L * 1000000L)).toDF("iid", "istart", "iend")
    val w2 = Relational.intervalAutoWidthMicros(real, "istart", "iend")
    assert(w2 == 7200L * 1000000L)
    val auto = Relational.intervalJoin(pts, "pt", ivs, "istart", "iend", w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == naivePairs)
  }

  test("empty sides produce empty results, never errors") {
    import spark.implicits._
    val noPts = Seq.empty[(Long, Long)].toDF("pid", "pt")
    val noIvs = Seq.empty[(Long, Long, Long)].toDF("iid", "istart", "iend")
    assert(Relational.intervalJoin(noPts, "pt", ivs, "istart", "iend", 10L).count() == 0)
    assert(Relational.intervalJoin(pts, "pt", noIvs, "istart", "iend", 10L).count() == 0)
    assert(Relational.intervalOverlapJoin(noIvs, "istart", "iend",
      ivs.select(col("iid").as("jid"), col("istart").as("js"), col("iend").as("je")),
      "js", "je", 10L).count() == 0)
  }

  test("null timestamps and null bounds never match (SQL join semantics)") {
    import spark.implicits._
    val p = Seq((1L, Some(150L)), (2L, None)).toDF("pid", "pt")
    val iv = Seq((10L, Some(100L), Some(200L)), (11L, None, Some(500L)))
      .toDF("iid", "istart", "iend")
    val got = Relational.intervalJoin(p, "pt", iv, "istart", "iend", 50L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("overlapping column names are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      Relational.intervalJoin(pts, "pt",
        ivs.withColumnRenamed("iid", "pid"), "istart", "iend", 10L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("the plan is an equi-join on the bucket — no nested-loop, no cartesian") {
    val plan = Relational.intervalJoin(pts, "pt", ivs, "istart", "iend", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join planned a nested loop:\n$plan")
    val plan2 = Relational.intervalOverlapJoin(
        ivs.select(col("iid").as("aid"), col("istart").as("as"), col("iend").as("ae")),
        "as", "ae", ivs.select(col("iid").as("bid"), col("istart").as("bs"),
          col("iend").as("be")), "bs", "be", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("BroadcastNestedLoopJoin") && !plan2.contains("CartesianProduct"),
      s"overlap join planned a nested loop:\n$plan2")
  }
}
