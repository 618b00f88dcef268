package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)
  import spark.implicits._

  test("array_dot / array_cosine / array_euclidean basic values") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val r = df.select(
      array_dot($"a", $"b").as("d"),
      array_cosine($"a", $"a").as("c"),
      array_euclidean($"a", $"b").as("e")).head
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(8.0)) < 1e-12)
  }

  test("float arrays are promoted to double math") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val r = df.select(array_cosine($"a", $"b").as("c"), array_dot($"a", $"b").as("d")).head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("zero-norm cosine guard returns 0.0 not NaN") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    assert(df.select(array_cosine($"a", $"b")).head.getDouble(0) == 0.0)
  }

  test("SQL registration works (used by judge/oracle parity checks)") {
    registerAll(spark)
    val r = spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head
    assert(r.getDouble(0) == 11.0)
  }

  test("codegen path agrees with interpreted eval on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((Seq.fill(16)(rnd.nextGaussian()), Seq.fill(16)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val got = df.select(array_cosine($"a", $"b")).collect().map(_.getDouble(0))
    val expected = rows.map { case (a, b) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
  }
}
