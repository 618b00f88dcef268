package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Scalar vector math as native Catalyst expressions (with codegen) so
  * they inline into whole-stage codegen instead of going through a
  * Scala UDF. Semantics mirror the reference kernels
  * (/root/reference/src/metrics.rs:258-311): cosine guards zero norms
  * (≤1e-10 → score 0.0), euclidean is plain L2 distance. All math in
  * double regardless of input element type (f32 inputs are promoted),
  * matching the reference's f64 default path.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @inline protected final def get(a: ArrayData, et: DataType, i: Int): Double =
    if (et == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java accessor snippet for codegen. */
  protected final def getter(et: DataType, arr: String, i: String): String =
    if (et == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected final def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"Dimension mismatch: left has $n elements, right has $m")
}

/** dot(a, b) = Σ aᵢ·bᵢ */
case class ArrayDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = a.numElements(); checkDims(n, b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, lt, i) * get(b, rt, i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) throw new IllegalArgumentException(
         |  "Dimension mismatch: left has " + $n + " elements, right has " + $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), 0.0 when either norm ≤ 1e-10. */
case class ArrayCosine(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = a.numElements(); checkDims(n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, lt, i); val y = get(b, rt, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val (qn, cn) = (math.sqrt(na), math.sqrt(nb))
    if (qn <= 1e-10 || cn <= 1e-10) 0.0 else dot / (qn * cn)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, dot, na, nb, x, y, qn, cn) =
        Seq("i", "n", "dot", "na", "nb", "x", "y", "qn", "cn").map(ctx.freshName)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) throw new IllegalArgumentException(
         |  "Dimension mismatch: left has " + $n + " elements, right has " + $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(elemType(left), a, i)};
         |  double $y = ${getter(elemType(right), b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $qn = Math.sqrt($na), $cn = Math.sqrt($nb);
         |${ev.value} = ($qn <= 1e-10 || $cn <= 1e-10) ? 0.0 : $dot / ($qn * $cn);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** euclidean(a, b) = ‖a − b‖₂ (lower = more similar). */
case class ArrayEuclidean(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_euclidean"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = a.numElements(); checkDims(n, b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = get(a, lt, i) - get(b, rt, i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, n, s, d) = Seq("i", "n", "s", "d").map(ctx.freshName)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) throw new IllegalArgumentException(
         |  "Dimension mismatch: left has " + $n + " elements, right has " + $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(elemType(left), a, i)} - ${getter(elemType(right), b, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All LSH bucket ids for one embedding in a single pass:
  * `planes` is tables × bits × dim flattened row-major; output is
  * array<long>(tables × probes). Entry t·probes is the table-t bucket
  * (bit j = sign of the dot with plane (t, j)); entries t·probes+p for
  * p ≥ 1 are MULTI-PROBE buckets — the main bucket with the p-th
  * smallest-|margin| bit flipped (Lv et al., VLDB'07: a near neighbour
  * that misses the query's bucket most likely sits across the
  * hyperplane the query is closest to). Probing p buckets per table
  * multiplies recall like extra tables but costs no extra signature
  * work and no extra corpus rows.
  *
  * One expression with one plane literal instead of a tables×bits tree
  * of ArrayDot nodes — planning stays O(1) and the generated code is
  * one tight loop reading the plane array from a per-partition
  * reference object.
  */
case class LshBuckets(child: Expression, planes: Array[Double], tables: Int, bits: Int,
    probes: Int = 1)
    extends UnaryExpression {
  require(tables > 0 && bits > 0 && bits < 63 && planes.length % (tables * bits) == 0,
    "planes length must be tables*bits*dim")
  require(probes >= 1 && probes <= bits + 1,
    s"probes must be in [1, bits + 1], got $probes for $bits bits")
  private val dim = planes.length / (tables * bits)

  override def prettyName: String = "lsh_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemT: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemT == FloatType || elemT == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) throw new IllegalArgumentException(
      s"Dimension mismatch: embedding has ${a.numElements()} elements, planes have $dim")
    val isF = elemT == FloatType
    val out = new Array[Long](tables * probes)
    val dots = new Array[Double](bits)
    val used = new Array[Boolean](bits)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var s = 0.0; var d = 0
        while (d < dim) {
          s += (if (isF) a.getFloat(d).toDouble else a.getDouble(d)) * planes(base + d)
          d += 1
        }
        dots(j) = s
        if (s >= 0) bucket |= 1L << j
        j += 1
      }
      out(t * probes) = bucket
      java.util.Arrays.fill(used, false)
      var pr = 1
      while (pr < probes) {
        var bestJ = 0; var best = Double.MaxValue
        var jj = 0
        while (jj < bits) {
          val m = math.abs(dots(jj))
          if (!used(jj) && m < best) { best = m; bestJ = jj }
          jj += 1
        }
        used(bestJ) = true
        out(t * probes + pr) = bucket ^ (1L << bestJ)
        pr += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val getter = if (elemT == FloatType) s"(double) $a.getFloat" else s"$a.getDouble"
      val Seq(out, t, j, d, s, bucket, base, dots, used, pr, bestJ, best, jj, m) =
        Seq("out", "t", "j", "d", "s", "bucket", "base", "dots", "used", "pr",
          "bestJ", "best", "jj", "m").map(ctx.freshName)
      s"""
         |if ($a.numElements() != $dim) throw new IllegalArgumentException(
         |  "Dimension mismatch: embedding has " + $a.numElements() + " elements, planes have $dim");
         |long[] $out = new long[${tables * probes}];
         |double[] $dots = new double[$bits];
         |boolean[] $used = new boolean[$bits];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) $s += $getter($d) * $p[$base + $d];
         |    $dots[$j] = $s;
         |    if ($s >= 0) $bucket |= 1L << $j;
         |  }
         |  $out[$t * $probes] = $bucket;
         |  java.util.Arrays.fill($used, false);
         |  for (int $pr = 1; $pr < $probes; $pr++) {
         |    int $bestJ = 0; double $best = Double.MAX_VALUE;
         |    for (int $jj = 0; $jj < $bits; $jj++) {
         |      double $m = Math.abs($dots[$jj]);
         |      if (!$used[$jj] && $m < $best) { $best = $m; $bestJ = $jj; }
         |    }
         |    $used[$bestJ] = true;
         |    $out[$t * $probes + $pr] = $bucket ^ (1L << $bestJ);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  import ColumnBridge.{column => C, expression => E}

  def array_dot(a: Column, b: Column): Column = C(ArrayDot(E(a), E(b)))
  def lsh_buckets(emb: Column, planes: Array[Double], tables: Int, bits: Int): Column =
    C(LshBuckets(E(emb), planes, tables, bits))
  def lsh_probe_buckets(emb: Column, planes: Array[Double], tables: Int, bits: Int,
      probes: Int): Column =
    C(LshBuckets(E(emb), planes, tables, bits, probes))
  def array_cosine(a: Column, b: Column): Column = C(ArrayCosine(E(a), E(b)))
  def array_euclidean(a: Column, b: Column): Column = C(ArrayEuclidean(E(a), E(b)))

  /** Register for SQL use: `SELECT array_cosine(a.embedding, b.embedding) ...`. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("array_dot", es => ArrayDot(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("array_cosine", es => ArrayCosine(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("array_euclidean", es => ArrayEuclidean(es.head, es(1)), "built-in")
  }
}
