package graft.sources

/** Bounded-pool fan-out over INDEPENDENT per-shard tasks (index shard
  * reads/writes/copies) — optimization-guide §2.6: Spark happily runs
  * several jobs at once inside one application, and a sequential
  * driver loop over B shards serializes B small jobs whose tasks
  * never fill the executors. Submitting them from a small pool
  * overlaps each job's scheduling/commit floor with the next job's
  * compute — locally it collapses B job floors into ~⌈B/pool⌉, and on
  * a cluster the next shard's tasks back-fill executors freed by the
  * current shard's tail. The pool is bounded (default 8, the same
  * parallelism the concurrent-collect builders use) so driver memory
  * stays at a few in-flight shards, never all of them.
  *
  * Order-preserving: result i corresponds to items(i) regardless of
  * completion order. The first task failure propagates (remaining
  * in-flight tasks drain on the pool before shutdown, matching the
  * sequential loop's at-most-one-failure surface).
  */
private[graft] object Par {
  def shards[A, B](items: Seq[A], parallelism: Int = 8)(f: A => B): IndexedSeq[B] = {
    if (items.sizeIs <= 1) items.map(f).toIndexedSeq
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(items.size, parallelism))
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val fs = items.map(i => scala.concurrent.Future(f(i))).toIndexedSeq
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(fs),
          scala.concurrent.duration.Duration.Inf)
      } finally {
        // drain in-flight tasks BEFORE propagating a failure:
        // Future.sequence throws on the first failed task while
        // others still run, and a caller's cleanup (e.g.
        // publishAtomically's tmp-dir delete) must not race them —
        // a still-running shard write could recreate the deleted
        // dir. shutdown() alone is non-blocking; await termination
        // so the scaladoc's drain claim holds on the failure path.
        pool.shutdown()
        pool.awaitTermination(Long.MaxValue, java.util.concurrent.TimeUnit.NANOSECONDS)
        ()
      }
    }
  }
}
