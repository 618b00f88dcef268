package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-only integration path: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` can use graft's
  * functions from plain SQL with no imports or registration calls.
  */
class GraftExtensionsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  // spark.sql.extensions is a STATIC conf read from the SparkContext,
  // so a context created by an earlier suite (without it) can't host
  // this session: stop it and build a fresh one, and clean up after
  // so later suites rebuild theirs.
  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.sparkContext.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("injected functions resolve and compute in plain SQL") {
    val r = spark.sql(
      """SELECT
        |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  array_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |  array_euclidean(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS e,
        |  simhash64(array('a', 'b', 'a')) AS sh
      """.stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-12)
    // deterministic fingerprint, equal to the expression API's value
    val viaApi = {
      import graft.functions.SketchFunctions._
      import org.apache.spark.sql.functions._
      spark.range(1).select(simhash64(array(lit("a"), lit("b"), lit("a")))).head().getLong(0)
    }
    assert(r.getLong(3) == viaApi)
  }

  test("zero-norm cosine guard holds through the SQL path") {
    val c = spark.sql("SELECT array_cosine(array(0.0d, 0.0d), array(1.0d, 2.0d))").head().getDouble(0)
    assert(c == 0.0)
  }

  test("parameterized sketch functions take SQL literals") {
    val r = spark.sql(
      """SELECT char_shingles('abcd', 3) AS sh,
        |       size(winnow_fingerprints('the quick brown fox jumps', 4, 3)) AS nfp
      """.stripMargin).head()
    assert(r.getSeq[String](0) == Seq("abc", "bcd"))
    assert(r.getInt(1) > 0)
    // non-literal parameter is rejected with a clear message
    val e = intercept[Exception](
      spark.sql("SELECT char_shingles('abcd', 1 + 2)").head())
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("mg_top_k aggregate works in plain SQL") {
    import spark.implicits._
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("freq_in")
    val r = spark.sql(
      """SELECT sk.items AS items, sk.max_err AS e
        |FROM (SELECT mg_top_k(t, 2, 8) AS sk FROM freq_in)""".stripMargin).head()
    val items = r.getSeq[org.apache.spark.sql.Row](0)
    assert(items.map(x => (x.getString(0), x.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
    assert(r.getLong(1) == 0L)
  }

  test("unicode hygiene functions work in plain SQL") {
    val r = spark.sql(
      """SELECT unicode_normalize('café', 'NFC') AS nfc,
        |       unicode_normalize('ﬁx', 'NFKC') AS nfkc,
        |       char_entropy_stats('abcd').entropy AS h,
        |       char_entropy_stats('abcd').n_distinct AS nd,
        |       fix_mojibake('cafÃ©') AS fixed
      """.stripMargin).head()
    assert(r.getString(0) == "café")
    assert(r.getString(1) == "fix")
    assert(r.getDouble(2) == 2.0)
    assert(r.getInt(3) == 4)
    assert(r.getString(4) == "café")
  }
}
