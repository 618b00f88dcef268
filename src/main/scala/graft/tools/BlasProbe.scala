package graft.tools

import dev.ludovic.netlib.blas.BLAS

/** Diagnostic: which netlib BLAS implementation loads in this JVM, and
  * raw sgemm-vs-dgemm throughput at the kernel's GEMM shape — the
  * evidence behind BASELINE.md's f32-vs-f64 claims (VERDICT r2 #2).
  */
object BlasProbe {
  def main(args: Array[String]): Unit = {
    val blas = BLAS.getInstance()
    println(s"BLAS impl: ${blas.getClass.getName}")
    val (n, m, dim) = (10000, 512, 256)
    val rnd = new scala.util.Random(7)
    val a = Array.fill(n * dim)(rnd.nextDouble())
    val b = Array.fill(m * dim)(rnd.nextDouble())
    val c = new Array[Double](n * m)
    val aF = a.map(_.toFloat); val bF = b.map(_.toFloat)
    val cF = new Array[Float](n * m)
    def time(label: String)(body: => Unit): Double = {
      body // warm
      val runs = 5
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label: median ${ts(runs / 2)}%.4f s  min ${ts.head}%.4f s")
      ts(runs / 2)
    }
    val d = time("dgemm 10000x512x256") {
      blas.dgemm("T", "N", n, m, dim, 1.0, a, dim, b, dim, 0.0, c, n)
    }
    val s = time("sgemm 10000x512x256") {
      blas.sgemm("T", "N", n, m, dim, 1.0f, aF, dim, bF, dim, 0.0f, cF, n)
    }
    println(f"sgemm/dgemm ratio: ${s / d}%.2f (expect ~0.5 when SIMD sgemm works)")

    // 32-way concurrency — the bench's actual regime (32 Spark tasks,
    // each one GEMM batch). Each thread gets its own output buffer.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(32)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val mT = 500 // rows per task at 16000 queries / 32 partitions
    val bT = Array.fill(mT * dim)(rnd.nextDouble())
    val bTF = bT.map(_.toFloat)
    def conc(label: String)(mk: () => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        Await.result(Future.sequence((1 to 32).map(_ => Future(mk()))), 120.seconds)
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"$label x32: median ${ts(2)}%.4f s")
      ts(2)
    }
    val dC = conc("dgemm 10000x500x256") { () =>
      val out = new Array[Double](n * mT)
      blas.dgemm("T", "N", n, mT, dim, 1.0, a, dim, bT, dim, 0.0, out, n)
    }
    val sC = conc("sgemm 10000x500x256") { () =>
      val out = new Array[Float](n * mT)
      blas.sgemm("T", "N", n, mT, dim, 1.0f, aF, dim, bTF, dim, 0.0f, out, n)
    }
    println(f"concurrent sgemm/dgemm ratio: ${sC / dC}%.2f")
    pool.shutdown()
  }
}
