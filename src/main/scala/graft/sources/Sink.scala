package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side of the pipeline (SURVEY §2.3 capstones produce datasets
  * someone has to persist). Two shapes matter at 100 TB:
  *
  *  - [[writePartitioned]]: hive-style partition directories (e.g.
  *    `split=train/`) so downstream readers get partition PRUNING for
  *    free, with files sorted on a locality key so parquet row-group
  *    min/max stats give data SKIPPING within each partition.
  *  - [[writeBucketed]]: a bucketed+sorted table, so every later
  *    equi-join/aggregation on the bucket key runs with NO shuffle —
  *    the write pays the exchange once, every consumer skips it.
  */
object Sink {

  /** Z-ORDERED parquet write — multi-dimensional data skipping
    * ([[graft.operators.Relational.zValue]] is the layout key): rows
    * close in BOTH `colA` and `colB` land in the same files, so a
    * reader filtering on either or both dimensions touches a small
    * file subset (file- and row-group-level min-max stats both
    * discriminate, where a single-column sort only ever prunes its
    * own column). `numFiles` range-partitions on z — the same
    * parallel sampled sort every global orderBy uses — and rows sort
    * by z within each file. SinkSpec proves the pruning: a two-dim
    * box filter touches strictly fewer files than the natural-order
    * layout of the same data.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      numFiles: Int = 32,
      overwrite: Boolean = false): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", graft.operators.Relational.zValue(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .parquet(path)
  }

  /** Partitioned parquet write.
    *
    * The explicit `repartition(partitionCols)` before the write is
    * the small-files guard: without it every one of the N upstream
    * tasks opens a file in every partition directory (N × |partitions|
    * files of a few KB — the classic tiny-file explosion that makes
    * the NEXT job's scan planning the bottleneck). With it, each
    * partition's rows are co-located first; `maxRecordsPerFile` then
    * re-splits anything too big, bounding file size from above while
    * the repartition bounds file count from below.
    *
    * `sortCols` orders rows WITHIN each file (`sortWithinPartitions`
    * — a local sort, no extra exchange) so parquet row-group min/max
    * statistics actually discriminate on the sort key: a reader
    * filtering on it skips whole row groups.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
      overwrite: Boolean = false,
      format: String = "parquet"): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(Set("parquet", "orc").contains(format),
      s"format must be parquet or orc, got $format") // both columnar with stats+pushdown
    val arranged = {
      val co = df.repartition(partitionCols.map(col): _*)
      if (sortCols.nonEmpty)
        co.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else co
    }
    arranged.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)
  }

  /** Bucketed + sorted table write (`saveAsTable` — bucketing needs
    * the catalog; a bare path write can't record bucket metadata).
    * Join/agg queries keyed on `bucketCol` against another table with
    * the SAME bucket count then plan with zero exchanges on both
    * sides (asserted in SinkSpec) — at 100 TB this converts every
    * recurring join on the key into a map-side merge.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      overwrite: Boolean = false): Unit = {
    require(numBuckets > 0, s"numBuckets must be > 0, got $numBuckets")
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Small-files COMPACTION — the standing maintenance job of any
    * long-lived table: N tiny files (streaming sinks, over-parallel
    * writes, many incremental batches) become ⌈rows/target⌉ full-size
    * files. Rewrites into a sibling temp dir, then installs it with
    * two directory renames. Returns (rowCount, data files written).
    *
    * OFFLINE maintenance only: there is no table-format transaction
    * log here, so rows appended between the read and the swap would
    * be lost with the old directory — quiesce writers first (pause
    * the stream / run between batches), exactly as for any
    * path-based table rewrite. Crash window: if the process dies
    * between the two renames, the live path is absent and the intact
    * pre-compaction data sits at `<path>.compact-bak` — restore is a
    * single rename back, and the error messages name the location.
    *
    * Hive-partitioned ROOTS are rejected (compact each partition
    * directory instead — rewriting the root would flatten the layout
    * and break partition-pruned readers). `sortCols` re-sorts rows
    * within each output file so parquet/ORC min-max stats keep
    * discriminating after the rewrite (a bare round-robin shuffle
    * would destroy the skipping order `writePartitioned` set up).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetRecordsPerFile: Long = 5000000L,
      format: String = "parquet",
      sortCols: Seq[String] = Nil): (Long, Int) = {
    require(targetRecordsPerFile > 0)
    require(Set("parquet", "orc").contains(format), s"unsupported format $format")
    val hPath0 = new org.apache.hadoop.fs.Path(path)
    val fs = hPath0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hPath = fs.resolvePath(hPath0) // normalized: no trailing-slash children
    val partitionDirs = fs.listStatus(hPath)
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.contains("="))
    require(partitionDirs.isEmpty,
      s"$path is a hive-partitioned root (${partitionDirs.head}, ...): compact each " +
        "partition directory, not the root — a flat rewrite would drop the layout")
    val df = spark.read.format(format).load(hPath.toString)
    val n = df.count()
    val numFiles = math.max(1L, (n + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val parent = hPath.getParent
    val tmp = new org.apache.hadoop.fs.Path(parent, hPath.getName + ".compact-tmp")
    val bak = new org.apache.hadoop.fs.Path(parent, hPath.getName + ".compact-bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    val arranged = {
      val r = df.repartition(numFiles)
      if (sortCols.nonEmpty) r.sortWithinPartitions(sortCols.map(col): _*) else r
    }
    arranged.write.mode(SaveMode.Overwrite).format(format).save(tmp.toString)
    val written = fs.listStatus(tmp)
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    // swap: old -> bak, tmp -> live, drop bak
    if (!fs.rename(hPath, bak)) throw new java.io.IOException(s"cannot move $hPath aside")
    if (!fs.rename(tmp, hPath)) {
      val restored = fs.rename(bak, hPath)
      throw new java.io.IOException(
        s"cannot install compacted $hPath; original data " +
          (if (restored) "restored" else s"is at $bak — restore it with a rename"))
    }
    fs.delete(bak, true)
    (n, written)
  }

  /** JSON-lines export — the interchange format most annotation /
    * inspection tools speak. Pass `numFiles > 0` to engage the same
    * repartition-first small-files guard as [[writePartitioned]]
    * (the default 0 writes one file per upstream task — fine after a
    * narrow scan, a tiny-file explosion after a wide shuffle);
    * compression defaults to gzip (JSONL is 3-5× the parquet
    * footprint uncompressed).
    */
  def writeJsonl(
      df: DataFrame,
      path: String,
      numFiles: Int = 0,
      compression: String = "gzip",
      overwrite: Boolean = false): Unit = {
    val arranged = if (numFiles > 0) df.repartition(numFiles) else df
    arranged.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .option("compression", compression)
      .json(path)
  }

  /** Publish an index directory ATOMICALLY: run `write` against a
    * hidden temp sibling of `path`, then rename the finished temp
    * into place. The index writers produce TWO datasets (vectors/ +
    * meta/); written directly, a failure between them leaves a
    * partial index that is both unreadable (one half missing) and
    * unretryable (with overwrite=false the retry trips ErrorIfExists
    * on the half that did land) — manual cleanup either way. With
    * the rename, `path` either does not exist or holds a complete
    * index. Same-directory rename is atomic on HDFS and a metadata
    * move on a posix FS; object stores degrade to copy+delete but
    * still publish both halves together. The temp dir is removed on
    * failure, so a retry always starts clean.
    *
    * CONCURRENCY CONTRACT: with overwrite=false, concurrent
    * publishers are safe — exactly one wins, the others fail loudly
    * and the winner's index is never touched (re-checked after the
    * write; nesting detected after the rename). With overwrite=true
    * the caller asserts SINGLE-CONCURRENT-PUBLISHER: two concurrent
    * overwriters race the aside-rename and the forward rename, and
    * while no interleaving loses the ORIGINAL index silently (it is
    * moved aside, never deleted, before the new one lands), which
    * writer's index ends up published — and whether the loser's
    * failure message can name the winner's actions — is undefined.
    * Serialize overwriting publishers externally.
    */
  private def publishAtomically(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      overwrite: Boolean)(write: String => Unit): Unit = {
    val dest = new org.apache.hadoop.fs.Path(path)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(dest)
    if (fs.exists(qualified) && !overwrite)
      throw new IllegalStateException(
        s"index path $path already exists; pass overwrite=true to replace it")
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(qualified.getParent,
      s".${qualified.getName}.__tmp__$stamp")
    val oldAside = new org.apache.hadoop.fs.Path(qualified.getParent,
      s".${qualified.getName}.__old__$stamp")
    var ok = false
    try {
      write(tmp.toString)
      // RE-CHECK the exclusivity contract after the (long) write: a
      // concurrent writer may have published while we wrote. With
      // overwrite=false that concurrent index must be left untouched
      // — proceeding would move IT aside and delete it as "the old
      // index", destroying data the caller promised not to replace.
      val hadOld = fs.exists(qualified)
      if (hadOld && !overwrite)
        throw new IllegalStateException(
          s"index path $path appeared during the write (concurrent publish); " +
            "overwrite=false refuses to replace it — the concurrent index is untouched")
      // overwrite: move the OLD index ASIDE (metadata op), never
      // delete it before the new one is in place — a failed publish
      // must not destroy the only complete copy. If this aside-rename
      // fails, nothing has been touched and the old index is intact.
      // failure here means THIS writer changed nothing — but under a
      // violated overwrite=true single-publisher contract a concurrent
      // mover may be why the rename failed, so the message claims only
      // our own actions, not the path's state
      if (hadOld) require(fs.rename(qualified, oldAside),
        s"publishing index: could not move the existing $qualified aside; " +
          "this writer has not modified it (a concurrent publisher may have — " +
          "overwrite=true assumes a single concurrent publisher)")
      // Any forward-rename failure — returning false OR throwing
      // (FileSystem.rename declares IOException) — lands here: try to
      // restore the old index, but ONLY if nothing else has claimed
      // the path meanwhile (restoring into an existing directory
      // would NEST the old index inside the other writer's). The
      // message states what actually happened either way.
      def publishFailed(what: String, cause: Throwable): Nothing = {
        val restored = hadOld && !fs.exists(qualified) &&
          fs.rename(oldAside, qualified)
        val msg = s"publishing index: $what" + (
          if (restored) "; the previous index was restored"
          else if (hadOld) s"; the previous index is at $oldAside — recover it manually"
          else "")
        throw (if (cause == null) new IllegalStateException(msg)
               else new IllegalStateException(msg, cause))
      }
      val renamed =
        try fs.rename(tmp, qualified)
        catch { case e: java.io.IOException =>
          publishFailed(s"rename $tmp -> $qualified threw", e)
        }
      if (!renamed) publishFailed(s"rename $tmp -> $qualified failed", null)
      // Hadoop rename into an EXISTING directory moves the source
      // INSIDE it and still returns true — a concurrent writer that
      // won the race would leave our temp nested in its published
      // index. Detect, clean our nesting, and fail loudly rather than
      // report an exclusive publish that never happened.
      val nested = new org.apache.hadoop.fs.Path(qualified, tmp.getName)
      if (fs.exists(nested)) {
        // the path now holds the OTHER writer's complete index — clean
        // only our nesting; if we had moved an old index aside, leave
        // it at oldAside (restoring would nest it the same way) and
        // name it so the operator can recover it deliberately
        fs.delete(nested, true)
        throw new IllegalStateException(
          s"publishing index: concurrent write detected at $qualified — " +
            "another process published this path during our write" +
            (if (hadOld) s"; the previous index was preserved at $oldAside" else ""))
      }
      // the new index is live; a failed cleanup of the superseded copy
      // must not fail the publish, but it must not be silent either —
      // the leaked copy can be the dominant storage cost
      if (hadOld && !fs.delete(oldAside, true))
        System.err.println(
          s"[sink] warning: could not remove the superseded index at $oldAside — " +
            "a complete copy of the previous index remains there")
      ok = true
    } finally if (!ok) fs.delete(tmp, true)
  }

  /** Persist an SQ8 index — train/quantize ONCE, serve every later
    * batch or stream without re-reading the raw embeddings (a real
    * index outlives the job that built it; today's alternative
    * re-collects and re-quantizes the corpus per session). Layout:
    * `path/vectors/` parquet, one row per vector (idx, id, code
    * binary, norm, sq_norm), split so partitions stay near 64 MB;
    * `path/meta/` a one-row parquet with (n, dim, dim_min,
    * dim_scale). The index is broadcast-envelope sized by contract,
    * so driver-side materialization here matches how it is built and
    * shipped; [[graft.sources.Source.readSq8Index]] restores a
    * byte-identical [[graft.operators.Similarity.CorpusIndexSq8]]
    * (round-trip pinned in SinkSpec).
    */
  def writeSq8Index(
      spark: org.apache.spark.sql.SparkSession,
      cx: graft.operators.Similarity.CorpusIndexSq8,
      path: String,
      overwrite: Boolean = false): Unit =
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      // rows build EXECUTOR-side from one broadcast of the index — a
      // driver-materialized per-vector Seq would transiently double the
      // index's memory right at the broadcast-envelope ceiling
      val slices = math.max(1, (cx.n.toLong * cx.dim / (64L << 20)).toInt)
      val bc = spark.sparkContext.broadcast(cx)
      try {
        spark.sparkContext.parallelize(0 until cx.n, slices).map { j =>
          val c = bc.value
          (j, c.ids(j),
            java.util.Arrays.copyOfRange(c.codes, j * c.dim, (j + 1) * c.dim),
            c.norms(j), c.sqNorms(j))
        }.toDF("idx", "id", "code", "norm", "sq_norm")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/vectors")
      } finally bc.destroy()
      Seq((cx.n, cx.dim, cx.dimMin.toSeq, cx.dimScale.toSeq))
        .toDF("n", "dim", "dim_min", "dim_scale")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/meta")
    }

  /** Persist a flat PQ index — same train-once story as
    * [[writeSq8Index]]/[[writeIvfPqIndex]] for the one index family
    * that previously could not persist (#9d): codebook training is the
    * expensive step, so a serving session should restore it rather
    * than retrain. Layout: `path/vectors/` one row per vector (idx,
    * id, the m subspace codes, f32 norms, and the optional SQ8 rerank
    * sidecar columns); `path/meta/` one row with (n, dim, m,
    * codebooks, sq8 bounds). [[graft.sources.Source.readPqIndex]]
    * restores a byte-identical
    * [[graft.operators.Similarity.CorpusIndexPq]] (round-trip +
    * identical-search pinned in SinkSpec).
    */
  def writePqIndex(
      spark: org.apache.spark.sql.SparkSession,
      px: graft.operators.Similarity.CorpusIndexPq,
      path: String,
      overwrite: Boolean = false): Unit =
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      val sq8 = px.sq8
      val bytesPerRow = px.m + sq8.map(_ => px.dim).getOrElse(0)
      val slices = math.max(1, (px.n.toLong * bytesPerRow / (64L << 20)).toInt)
      val bc = spark.sparkContext.broadcast(px)
      try {
        spark.sparkContext.parallelize(0 until px.n, slices).map { j =>
          val x = bc.value
          val s8 = x.sq8
          (j, x.ids(j),
            java.util.Arrays.copyOfRange(x.codes, j * x.m, (j + 1) * x.m),
            x.norms(j), x.sqNorms(j),
            s8.map(s => java.util.Arrays.copyOfRange(s.codes, j * x.dim, (j + 1) * x.dim)),
            s8.map(s => s.norms(j)), s8.map(s => s.sqNorms(j)))
        }.toDF("idx", "id", "code", "norm", "sq_norm",
            "sq8_code", "sq8_norm", "sq8_sq_norm")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/vectors")
      } finally bc.destroy()
      Seq((px.n, px.dim, px.m, px.codebooks.toSeq,
          sq8.map(_.dimMin.toSeq), sq8.map(_.dimScale.toSeq)))
        .toDF("n", "dim", "m", "codebooks", "sq8_dim_min", "sq8_dim_scale")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/meta")
    }

  /** Persist an IVF+PQ index — the composition whose whole point is
    * "train the expensive parts once" (coarse cells + residual
    * codebooks), so persistence matters more here than anywhere
    * else. Layout: `path/vectors/` one row per vector (idx, id,
    * residual PQ codes, cell, optional residual-SQ8 codes);
    * `path/meta/` one row with geometry + centroids + codebooks +
    * SQ8 bounds. [[graft.sources.Source.readIvfPqIndex]] restores a
    * byte-identical index (CSR rebuilt from `cell`, deterministic:
    * original row order groups stably).
    */
  def writeIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      ix: graft.operators.Similarity.CorpusIndexIvfPq,
      path: String,
      overwrite: Boolean = false): Unit =
    publishAtomically(spark, path, overwrite)(writeIvfPqInto(spark, ix, _))

  /** The raw vectors/ + meta/ write of one IVF+PQ index into `dir` —
    * shared by the single-index publisher above and the sharded
    * family's per-shard subdirectories (which must all land inside
    * ONE atomic publish, not N separate ones: a sharded index is
    * unreadable with any shard missing).
    */
  private def writeIvfPqInto(
      spark: org.apache.spark.sql.SparkSession,
      ix: graft.operators.Similarity.CorpusIndexIvfPq,
      dir: String): Unit = {
    import spark.implicits._
    val sq8 = ix.sq8
    val bytesPerRow = ix.m + sq8.map(_ => ix.dim).getOrElse(0)
    val slices = math.max(1, (ix.n.toLong * bytesPerRow / (64L << 20)).toInt)
    val bc = spark.sparkContext.broadcast(ix)
    try {
      spark.sparkContext.parallelize(0 until ix.n, slices).map { j =>
        val x = bc.value
        val s8 = x.sq8
        (j, x.ids(j),
          java.util.Arrays.copyOfRange(x.codes, j * x.m, (j + 1) * x.m),
          x.cellOf(j),
          s8.map(s => java.util.Arrays.copyOfRange(s.codes, j * x.dim, (j + 1) * x.dim)),
          s8.map(s => s.norms(j)), s8.map(s => s.sqNorms(j)))
      }.toDF("idx", "id", "code", "cell", "sq8_code", "sq8_norm", "sq8_sq_norm")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/vectors")
    } finally bc.destroy()
    Seq((ix.n, ix.dim, ix.m, ix.nCells,
        ix.centroids.toSeq, ix.codebooks.toSeq,
        sq8.map(_.dimMin.toSeq), sq8.map(_.dimScale.toSeq)))
      .toDF("n", "dim", "m", "n_cells", "centroids", "codebooks",
        "sq8_dim_min", "sq8_dim_scale")
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$dir/meta")
  }

  /** Persist a SHARDED IVF+PQ index (the
    * [[graft.operators.Similarity.buildIvfPqSharded]] family — the
    * past-the-broadcast-envelope composition): one `manifest/` row
    * recording the shard count + total n + the shard-key contract,
    * and each shard's full single-index layout under `shard_NNNN/`,
    * all inside ONE atomic publish — `path` either holds every shard
    * or nothing. Shard geometry may differ per shard (hash-mod split
    * sizes vary; nCells clamps to a small shard), which is why each
    * shard carries its own meta rather than hoisting one.
    * [[graft.sources.Source.readIvfPqShardedIndex]] restores the
    * byte-identical sequence (round-trip + identical sharded search
    * pinned in SinkSpec).
    */
  def writeIvfPqShardedIndex(
      spark: org.apache.spark.sql.SparkSession,
      shards: Seq[graft.operators.Similarity.CorpusIndexIvfPq],
      path: String,
      overwrite: Boolean = false): Unit = {
    require(shards.nonEmpty, "Empty shard list")
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      Seq((shards.size, shards.map(_.n.toLong).sum, "xxhash64_pmod"))
        .toDF("num_shards", "total_n", "shard_key")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
      shards.zipWithIndex.foreach { case (ix, i) =>
        writeIvfPqInto(spark, ix, f"$tmp/shard_$i%04d")
      }
    }
  }
}
