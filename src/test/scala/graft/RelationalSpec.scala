package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  test("asofJoin: inclusive same-ts match, null before first right row, per-key isolation") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq(
      (1L, 10L, ts(100)), (1L, 11L, ts(200)), (1L, 12L, ts(250)), (1L, 13L, ts(300)),
      (2L, 20L, ts(150)),
      (3L, 30L, ts(500))).toDF("k", "lid", "t")
      .select($"lid", $"k", $"t")
    val right = Seq(
      (1L, ts(150), 1.5), (1L, ts(250), 2.5), (1L, ts(400), 4.0),
      (2L, ts(150), 9.0)).toDF("k", "t", "v")
    val got = Relational.asofJoin(left, right, "k", "t")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(10L) == None)        // before any right row
    assert(got(11L) == Some(1.5))   // latest <= 200
    assert(got(12L) == Some(2.5))   // same-ts right row IS visible
    assert(got(13L) == Some(2.5))   // 400 is in the future
    assert(got(20L) == Some(9.0))   // per-key: key 2 sees only key 2
    assert(got(30L) == None)        // key with no right rows at all
    // every left row survives (left-join semantics)
    assert(got.size == 6)
  }

  test("asofJoin: null keys/timestamps never match (SQL join semantics), collisions rejected") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = Seq(
      (Some(1L), 10L, Some(ts(200))),
      (None, 11L, Some(ts(200))),      // null key: survives unmatched
      (Some(1L), 12L, None))           // null ts: survives unmatched
      .toDF("k", "lid", "t")
    val right = Seq(
      (Some(1L), Some(ts(100)), 1.0),
      (None, Some(ts(50)), 8.0),       // null key: matches nothing
      (Some(1L), None, 9.0))           // null ts: must NOT be carried anywhere
      .toDF("k", "t", "v")
    val got = Relational.asofJoin(left, right, "k", "t")
      .collect().map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(10L) == Some(1.0)) // NOT 9.0: the null-ts right row is invisible
    assert(got(11L) == None)
    assert(got(12L) == None)
    assert(got.size == 3)
    // duplicate output names fail fast at construction
    val e = intercept[IllegalArgumentException](
      Relational.asofJoin(left.withColumnRenamed("lid", "v"), right, "k", "t"))
    assert(e.getMessage.contains("collide"))
  }
  test("asofJoinBucketed == asofJoin across widths, incl. degenerate buckets and nulls") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // deterministic but irregular timelines over 3 keys, including a
    // HOT key with most of the rows (the case the form exists for),
    // null keys/ts on both sides, and a key with no right rows
    val left = (
      (1 to 200).map(i => (Some(1L), 1000L + i, Some(ts(i * 7L % 997)))) ++
        Seq((Some(2L), 2001L, Some(ts(150))), (Some(3L), 3001L, Some(ts(500))),
          (None, 4001L, Some(ts(10))), (Some(1L), 4002L, None))
      ).toDF("k", "lid", "t")
    val right = (
      (1 to 40).map(i => (Some(1L), Some(ts(i * 23L % 991)), i * 1.0)) ++
        Seq((Some(2L), Some(ts(150)), 9.0),
          (None, Some(ts(5)), 8.0), (Some(1L), None, 7.0))
      ).toDF("k", "t", "v")
    val want = Relational.asofJoin(left, right, "k", "t")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // widths in micros: 1s buckets (many), 100s (few), 1 HOUR (one
    // bucket = degenerates to the single-pass shape), and 1 µs (every
    // event its own bucket = pure carry-in path)
    for (w <- Seq(1000000L, 100000000L, 3600L * 1000000L, 1L)) {
      val got = Relational.asofJoinBucketed(left, right, "k", "t", w)
        .collect().map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got == want, s"bucketed(width=$w) diverges from single-pass")
    }
    intercept[IllegalArgumentException](
      Relational.asofJoinBucketed(left, right, "k", "t", 0L))
  }

  test("sessionizeEventsBucketed == sessionizeEvents across widths, incl. degenerate") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // one HOT user with bursts separated by >30-min gaps placed so
    // sessions cross bucket boundaries, plus a sparse user; gaps at
    // 1801s/1800s probe the strict-> semantics at the boundary
    val hot = (0 until 300).map { i =>
      val burst = i / 30                       // 10 bursts of 30 events
      (7L, ts(burst * 4000L + (i % 30) * 10L), 1000L + i)
    }
    val sparse = Seq(
      (8L, ts(100), 1L), (8L, ts(1900), 2L),   // gap 1800s = NOT a break
      (8L, ts(3702), 3L))                      // gap 1802s = break
    val ev = (hot ++ sparse).toDF("user_id", "ts", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet
    val want = canon(Relational.sessionizeEvents(ev))
    // sanity: the fixture really exercises multi-session structure
    assert(want.map(_._2).max > 2)
    for (w <- Seq(1000000L, 500L * 1000000L, 3600L * 1000000L, 1L)) {
      val got = canon(Relational.sessionizeEventsBucketed(ev, w))
      assert(got == want, s"bucketed(width=$w) diverges from single-pass")
    }
    intercept[IllegalArgumentException](
      Relational.sessionizeEventsBucketed(ev, 0L))
  }

  val dir = "/root/testdata/sf0.01"

  test("approx count-distinct lands within the 1% rsd envelope of the exact counts") {
    val exact = Relational.distinctCounts(spark, dir).head()
    val approx = Relational.approxDistinctCounts(spark, dir).head()
    // HLL++ rsd 1%: allow 5 sigma
    for (i <- 0 to 1) {
      val (e, a) = (exact.getLong(i).toDouble, approx.getLong(i).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"col $i: approx $a vs exact $e")
    }
    assert(exact.getLong(2) == approx.getLong(2)) // plain count is exact
  }

  test("approx percentiles land within 1% of the exact interpolated percentiles") {
    val exact = Relational.quantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Relational.approxQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet && exact.nonEmpty)
    for ((k, (e50, e90, e99)) <- exact) {
      val (a50, a90, a99) = approx(k)
      // approx_percentile returns an actual data value at rank error
      // ≤ 1/accuracy; 1% relative tolerance is generous at sf0.01
      for (((a, e), tag) <- Seq((a50, e50), (a90, e90), (a99, e99)).zip(Seq("p50", "p90", "p99")))
        assert(math.abs(a - e) / e <= 0.01, s"$k $tag: approx $a vs exact $e")
    }
  }

  test("sessionize and sessionizeWindow agree on (user, start, end, count)") {
    val a = Relational.sessionize(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val b = Relational.sessionizeWindow(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("fuzzyJoinPairs: lossless vs brute force, incl. short strings and d=2") {
    import spark.implicits._
    // seeded corpus of base words + typo mutations + short strings
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefgh"
    def word(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val bases = (0 until 30).map(_ => word(8 + rnd.nextInt(8)))
    val mutated = bases.flatMap { b =>
      val sb = new StringBuilder(b)
      sb.setCharAt(rnd.nextInt(b.length), alphabet(rnd.nextInt(alphabet.length)))
      Seq(b, sb.toString, b + alphabet(rnd.nextInt(alphabet.length)).toString)
    }
    val shorts = Seq("ab", "ac", "abc", "xy", "x", "abcd", "bcd")
    val strs = (mutated ++ shorts).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = Relational.fuzzyJoinPairs(df, "id", "s", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // brute force in plain scala
      def lev(a: String, b: String): Int = {
        val dp = Array.tabulate(a.length + 1)(i => i)
        for (j <- 1 to b.length) {
          var prev = dp(0); dp(0) = j
          for (i <- 1 to a.length) {
            val cur = dp(i)
            dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
              prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
            prev = cur
          }
        }
        dp(a.length)
      }
      val want = (for {
        (i1, s1) <- strs; (i2, s2) <- strs if i1 < i2
        dd = lev(s1, s2) if dd <= d
      } yield (i1, i2, dd.toLong)).toSet
      assert(got == want, s"maxDist=$d: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty)
    }
  }

  test("fuzzyJoinPairs d=1: deletion-neighborhood edge cases (empty/1-char/null strings)") {
    import spark.implicits._
    // the deletion path owns ALL lengths at d=1 (the gram path's
    // short-string band branch no longer applies there): empty string
    // neighborhood is itself, null generates no keys
    val df = Seq((0L, ""), (1L, "a"), (2L, "b"), (3L, "ab"),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val got = Relational.fuzzyJoinPairs(df, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: ""~"a"=1, ""~"b"=1, "a"~"b"=1, "a"~"ab"=1,
    // "b"~"ab"=1; ""~"ab"=2 (absent); null pairs with nothing
    assert(got == Set((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L),
      (1L, 3L, 1L), (2L, 3L, 1L)), got.toString)
  }

  test("fuzzyJoinPairs: dense-keyspace runaway refuses with a named error (round-12 verdict #2)") {
    import spark.implicits._
    def rootMsg(t: Throwable): String = {
      var cur = t
      val sb = new StringBuilder(Option(cur.getMessage).getOrElse(""))
      while (cur.getCause != null) { cur = cur.getCause; sb.append(" | ").append(Option(cur.getMessage).getOrElse("")) }
      sb.toString
    }
    // d=1 density (deletion-neighborhood path, round 17): 60
    // near-identical strings all collide on the shared deletion
    // variant, so a cap of 10 must refuse in-plan, naming the KEY,
    // not shuffle ~60² candidates
    val dense = (0L until 60L).map(i => (i, s"aaaaaaaaaaaa${i % 3}"))
      .toDF("id", "s")
    val exLong = intercept[Exception] {
      Relational.fuzzyJoinPairs(dense, "id", "s", maxDist = 1, maxGramDf = 10).collect()
    }
    assert(rootMsg(exLong).contains("fuzzy join candidate runaway"), rootMsg(exLong))
    assert(rootMsg(exLong).contains("maxGramDf"), rootMsg(exLong))
    assert(rootMsg(exLong).contains("deletion key"), rootMsg(exLong))
    // SHORT-string band blowup on the GRAM path (maxDist ≥ 2): 60
    // two-char codes land in one length block — the "band is tiny"
    // assumption is about length diversity, not row counts, and must
    // also refuse
    val codes = (0L until 60L).map(i => (i, f"${('a' + (i % 26).toInt).toChar}${('a' + (i / 26).toInt).toChar}"))
      .toDF("id", "s")
    val exShort = intercept[Exception] {
      Relational.fuzzyJoinPairs(codes, "id", "s", maxDist = 2, maxGramDf = 10).collect()
    }
    assert(rootMsg(exShort).contains("fuzzy join candidate runaway"), rootMsg(exShort))
    assert(rootMsg(exShort).contains("length band"), rootMsg(exShort))
    // the d=1 deletion path also refuses the degenerate code corpus
    // (single-char keys index ~26 codes each, over a cap of 10)
    val exCodes1 = intercept[Exception] {
      Relational.fuzzyJoinPairs(codes, "id", "s", maxDist = 1, maxGramDf = 10).collect()
    }
    assert(rootMsg(exCodes1).contains("fuzzy join candidate runaway"), rootMsg(exCodes1))
    // raising the cap clears the refusals and yields exact results
    val ok = Relational.fuzzyJoinPairs(codes, "id", "s", maxDist = 1, maxGramDf = 1000)
    assert(ok.count() > 0)
  }

  test("zValue: tile contiguity — fixing high bits of both keys fixes a contiguous z range") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a 64×64 grid of points in 16×16 tiles: every tile must own a
    // contiguous, non-overlapping z range (the property that makes
    // min-max row-group stats prune two-dimensional filters)
    val pts = spark.range(64L * 64)
      .select((col("id") % 64).as("a"),
        floor(col("id") / 64).cast("long").as("b"))
      .withColumn("z", graft.operators.Relational.zValue(col("a"), col("b")))
      .withColumn("tile", concat((col("a") / 16).cast("long").cast("string"), lit("_"),
        (col("b") / 16).cast("long").cast("string")))
    val ranges = pts.groupBy("tile")
      .agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ranges.length == 16 && ranges.forall(_._4 == 256))
    val sorted = ranges.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) =>
        assert(hi1 < lo2, s"tile z ranges overlap: $hi1 >= $lo2")
      case _ =>
    }
    // and the curve actually interleaves: z(1,0)=1, z(0,1)=2, z(1,1)=3
    val small = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("a", "b")
      .withColumn("z", graft.operators.Relational.zValue(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(small == Map((0L, 0L) -> 0L, (1L, 0L) -> 1L, (0L, 1L) -> 2L, (1L, 1L) -> 3L))
  }
}
