package graft

import graft.functions.SketchFunctions._
import graft.functions.VectorFunctions._
import graft.operators.{Metric, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property tests (seeded, deterministic): the kernel
  * against a naive reference implementation over many random shapes,
  * and algebraic invariants of the sketch expressions.
  */
class KernelPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  private val rnd = new scala.util.Random(20260812L)

  private def naiveScore(q: Array[Double], c: Array[Double], m: Metric): Double = m match {
    case Metric.Dot => q.zip(c).map { case (a, b) => a * b }.sum
    case Metric.Cosine =>
      val dot = q.zip(c).map { case (a, b) => a * b }.sum
      val (nq, nc) = (math.sqrt(q.map(x => x * x).sum), math.sqrt(c.map(x => x * x).sum))
      if (nq <= 1e-10 || nc <= 1e-10) 0.0 else dot / (nq * nc)
    case Metric.Euclidean =>
      math.sqrt(q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
  }

  test("topk agrees with a naive implementation over 30 random shapes and all metrics") {
    for (trial <- 1 to 30) {
      val dim = 1 + rnd.nextInt(16)
      val nC = 1 + rnd.nextInt(40)
      val nQ = 1 + rnd.nextInt(20)
      val k = 1 + rnd.nextInt(nC + 3) // sometimes > |corpus|
      val metric = Seq(Metric.Cosine, Metric.Dot, Metric.Euclidean)(trial % 3)
      val corpus = (0 until nC).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
      val queries = (0 until nQ).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
      val corpusDF = spark.createDataFrame(corpus).toDF("id", "emb")
      val queriesDF = spark.createDataFrame(queries).toDF("id", "emb")
      val cx = Similarity.collectCorpus(corpusDF, "id", "emb")
      val got = Similarity.topkFlat(queriesDF, "emb", cx, k, metric)
        .select("id", "rank", "index", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
      queries.foreach { case (qid, q) =>
        val expect = corpus
          .map { case (cid, c) => (cid, naiveScore(q, c, metric)) }
          .sortBy { case (cid, s) => (if (metric.higherIsBetter) -s else s, cid) }
          .take(math.min(k, nC))
        val actual = got(qid)
        assert(actual.map(_._1) == expect.map(_._1),
          s"trial $trial $metric dim=$dim nC=$nC k=$k qid=$qid: ids ${actual.map(_._1)} vs ${expect.map(_._1)}")
        actual.map(_._2).zip(expect.map(_._2)).foreach { case (a, e) =>
          assert(math.abs(a - e) < 1e-9, s"trial $trial score $a vs $e")
        }
      }
    }
  }

  test("minhash signature of a union is the elementwise min of the signatures") {
    import spark.implicits._
    val ps = Array.tabulate(64)(i => (1000003L + 17L * i, 7919L * i))
    val as = ps.map(_._1); val bs = ps.map(_._2)
    for (_ <- 1 to 20) {
      val a = Seq.fill(1 + rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString).distinct
      val b = Seq.fill(1 + rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString).distinct
      val union = (a ++ b).distinct
      val rows = Seq(("a", a), ("b", b), ("u", union)).toDF("k", "s")
        .select(col("k"), minhash_signature(col("s"), as, bs).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val expected = rows("a").zip(rows("b")).map { case (x, y) => math.min(x, y) }
      assert(rows("u") == expected)
    }
  }

  test("sorted_intersect_count equals the size of array_intersect on random sorted sets") {
    import spark.implicits._
    for (_ <- 1 to 20) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).distinct.sorted
      val row = Seq((a, b)).toDF("a", "b")
        .select(sorted_intersect_count(col("a"), col("b")).as("c"),
          size(array_intersect(col("a"), col("b"))).as("e"))
        .head()
      assert(row.getInt(0) == row.getInt(1))
    }
  }

  test("lsh bucket signatures are scale-invariant (positive scaling preserves signs)") {
    import graft.functions.LshBuckets
    import org.apache.spark.sql.graft.ColumnBridge
    val planes = Array.fill(4 * 8 * 6)(rnd.nextGaussian())
    def buckets(v: Array[Double]): Seq[Long] = {
      import spark.implicits._
      Seq(Tuple1(v)).toDF("e")
        .select(ColumnBridge.column(LshBuckets(ColumnBridge.expression(col("e")), planes, 4, 8)))
        .head().getSeq[Long](0).toSeq
    }
    for (_ <- 1 to 10) {
      val v = Array.fill(6)(rnd.nextGaussian())
      val factor = 0.1 + rnd.nextDouble() * 10
      val scaled = v.map(_ * factor)
      assert(buckets(v) == buckets(scaled))
    }
  }

  test("wave serving is lossless over random shard/wave/mask geometries (BQ family)") {
    // the property the whole bounded-memory story rests on: per-wave
    // top-k cuts + the final re-rank reproduce the all-resident
    // sharded serve EXACTLY, for any shard count, wave size, metric,
    // and allow/deny mask combination — randomized (seeded) so the
    // parity is not an artifact of one hand-picked geometry
    import spark.implicits._
    for (trial <- 1 to 10) {
      val dim = 8 + rnd.nextInt(24)
      val nC = 50 + rnd.nextInt(200)
      val nQ = 5 + rnd.nextInt(15)
      val k = 1 + rnd.nextInt(8)
      val numShards = 1 + rnd.nextInt(5)
      val waveSize = 1 + rnd.nextInt(numShards + 1)
      val metric = Seq(Metric.Cosine, Metric.Dot, Metric.Euclidean)(trial % 3)
      val shortlist = k + rnd.nextInt(nC)
      val corpusDF = (0 until nC)
        .map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
        .toDF("id", "emb")
      val queriesDF = (0 until nQ)
        .map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
        .toDF("qid", "emb")
      val shards = Similarity.buildBqSharded(corpusDF, "id", "emb", numShards)
      val allIds = shards.flatMap(_.ids)
      // random allow/deny sets, independently present or absent
      val allow =
        if (rnd.nextBoolean()) allIds.filter(_ => rnd.nextDouble() < 0.6).toArray
        else null
      val deny =
        if (rnd.nextBoolean()) allIds.filter(_ => rnd.nextDouble() < 0.2).toArray
        else null
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rank", "index", "score")
          .as[(Long, Int, Long, Double)].collect().toSet
      val effectiveAllow =
        (if (allow == null) allIds else allow.toSeq)
          .filter(id => deny == null || !deny.contains(id)).toArray
      val expected = rows(Similarity.topkBqShardedFiltered(queriesDF, "qid",
        "emb", shards, effectiveAllow, k, metric, shortlist))
      val waved = rows(Similarity.topkBqShardedWaves(queriesDF, "qid",
        "emb", shards, k, metric, shortlist, waveSize = waveSize,
        meter = new Similarity.ShardedServeMeter,
        allowedIds = allow, deniedIds = deny))
      assert(waved == expected,
        s"trial $trial: dim=$dim n=$nC shards=$numShards wave=$waveSize " +
          s"metric=$metric k=$k shortlist=$shortlist " +
          s"allow=${if (allow == null) -1 else allow.length} " +
          s"deny=${if (deny == null) -1 else deny.length}")
    }
  }
}
