package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

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

  /** Persist an OPQ index — the learned rotation plus the PQ index it
    * wraps (same train-once story as [[writePqIndex]]: the Procrustes
    * alternation + codebook training is the expensive step). Layout:
    * `path/rot/` one meta row with the d×d rotation, `path/pq/` the
    * standard [[writePqIndex]] layout.
    * [[graft.sources.Source.readOpqIndex]] restores byte-identically.
    */
  def writeOpqIndex(
      spark: org.apache.spark.sql.SparkSession,
      ox: graft.operators.Similarity.CorpusIndexOpq,
      path: String,
      overwrite: Boolean = false): Unit =
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      Seq((ox.dim, ox.rot.toSeq)).toDF("dim", "rot")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/rot")
      writePqIndex(spark, ox.pq, s"$tmp/pq")
    }

  /** Persist a binary-quantized index — bits + SQ8 envelope + the
    * integer-derived thresholds, same train-once story as
    * [[writeSq8Index]] (the build pays a full corpus collect; a
    * serving session restores instead). Layout: `path/vectors/` one
    * row per vector (idx, id, packed bit words, SQ8 codes, norms);
    * `path/meta/` one row (n, dim, n_words, thresholds, grid bounds).
    * [[graft.sources.Source.readBqIndex]] restores a byte-identical
    * [[graft.operators.Similarity.CorpusIndexBq]].
    */
  def writeBqIndex(
      spark: org.apache.spark.sql.SparkSession,
      bx: graft.operators.Similarity.CorpusIndexBq,
      path: String,
      overwrite: Boolean = false): Unit =
    publishAtomically(spark, path, overwrite) { tmp =>
      writeBqInto(spark, bx, tmp)
    }

  /** The flat BQ layout body written into an already-owned dir —
    * shared by [[writeBqIndex]] and [[writeBqShardedIndex]] (one
    * shard dir each, inside the sharded publish).
    */
  private def writeBqInto(
      spark: org.apache.spark.sql.SparkSession,
      bx: graft.operators.Similarity.CorpusIndexBq,
      tmp: String): Unit = {
    import spark.implicits._
    val sq8 = bx.sq8
    val bytesPerRow = 8L * bx.nWords + bx.dim
    val slices = math.max(1, (bx.n.toLong * bytesPerRow / (64L << 20)).toInt)
    val bc = spark.sparkContext.broadcast(bx)
    try {
      spark.sparkContext.parallelize(0 until bx.n, slices).map { j =>
        val x = bc.value
        (j, x.ids(j),
          java.util.Arrays.copyOfRange(x.words, j * x.nWords, (j + 1) * x.nWords),
          java.util.Arrays.copyOfRange(x.sq8.codes, j * x.dim, (j + 1) * x.dim),
          x.sq8.norms(j), x.sq8.sqNorms(j))
      }.toDF("idx", "id", "words", "code", "norm", "sq_norm")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/vectors")
    } finally bc.destroy()
    // bit_cut is the frozen-threshold artifact [[appendBqIndex]]
    // encodes against (appended LAST so readers by name are
    // untouched)
    Seq((bx.n, bx.dim, bx.nWords, bx.thresholds.toSeq,
        sq8.dimMin.toSeq, sq8.dimScale.toSeq, bx.bitCut.toSeq))
      .toDF("n", "dim", "n_words", "thresholds", "dim_min", "dim_scale",
        "bit_cut")
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/meta")
  }

  /** Persist a SHARDED BQ build ([[graft.operators.Similarity
    * .buildBqSharded]]) — one [[writeBqIndex]]-layout dir per shard
    * plus a manifest, the [[writeIvfPqShardedIndex]] shape: the
    * long-running serving session this exists for restores shards
    * one at a time (the wave/streaming serves page them) instead of
    * re-collecting + re-binarizing a corpus per session. Serve with
    * [[graft.operators.Similarity.topkBqShardedWaves]] or
    * [[graft.streaming.EventStream.topkServeBqShardedWaves]].
    */
  def writeBqShardedIndex(
      spark: org.apache.spark.sql.SparkSession,
      shards: Seq[graft.operators.Similarity.CorpusIndexBq],
      path: String,
      overwrite: Boolean = false,
      hashModulus: Int = 0,
      shardHashVals: Seq[Long] = Nil): Unit = {
    require(shards.nonEmpty, "Empty shard list")
    // identity default carries the same caveat as the IVF+PQ persist:
    // correct only when no hash shard was compacted away at build —
    // prefer the ShardedBqBuild overload, which carries the real
    // layout
    val modulus = if (hashModulus > 0) hashModulus else shards.size
    if (hashModulus <= 0)
      log.warn(s"writeBqShardedIndex: recording the IDENTITY routing layout " +
        s"(hash_modulus=${shards.size}) — if this build compacted empty hash " +
        "shards, appends will mis-route; pass the build's ShardedBqBuild " +
        "or explicit hashModulus/shardHashVals")
    val hashVals =
      if (shardHashVals.nonEmpty) shardHashVals else shards.indices.map(_.toLong)
    require(hashVals.size == shards.size,
      s"shardHashVals has ${hashVals.size} entries for ${shards.size} shards")
    require(modulus >= shards.size,
      s"hash_modulus $modulus < ${shards.size} shard directories")
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      Seq((shards.size, shards.map(_.n.toLong).sum, "xxhash64_pmod",
          modulus, hashVals))
        .toDF("num_shards", "total_n", "shard_key",
          "hash_modulus", "shard_hash_vals")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
      Par.shards(shards.zipWithIndex) { case (sx, i) =>
        writeBqInto(spark, sx, f"$tmp/shard_$i%04d")
      }
    }
  }

  /** [[writeBqShardedIndex]] taking the build WITH its routing
    * identity — the non-footgun persist for
    * [[graft.operators.Similarity.buildBqShardedWithLayout]].
    */
  def writeBqShardedIndex(
      spark: org.apache.spark.sql.SparkSession,
      build: graft.operators.Similarity.ShardedBqBuild,
      path: String,
      overwrite: Boolean): Unit =
    writeBqShardedIndex(spark, build.shards, path, overwrite,
      build.hashModulus, build.shardHashVals)

  /** Row shape the scan-stage BQ encode emits (shard routing key, id,
    * packed bit words, SQ8 codes, dequantized norms) — shared by
    * [[writeBqShardedIndexDistributed]]'s encode pass and
    * [[appendBqShardedIndex]].
    */
  private val bqEncSchema = StructType(Seq(
    StructField("shard", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("words", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("code", BinaryType, nullable = false),
    StructField("norm", DoubleType, nullable = false),
    StructField("sq_norm", DoubleType, nullable = false)))

  /** Build AND persist a sharded BQ index WITHOUT ever collecting the
    * corpus — the 100 TB build path for the measured-best serving
    * rung. [[graft.operators.Similarity.buildBqSharded]] funnels
    * every raw vector through the driver (the priced concurrent
    * collect of `buildSq8Sharded` — ~2 KB/vector through one JVM,
    * 366.8 s for the round-15 9M-row smoke, impossible at corpus
    * scale); this builder keeps the driver SAMPLE-FREE — nothing
    * row-shaped ever reaches it:
    *
    *  1. per-(shard, id) counts (narrow agg: two longs a row) serve
    *     the duplicate-id refusal and the per-shard size caps;
    *  2. the corpus-global SQ8 grid is ONE distributed min/max fold
    *     ([[graft.operators.Similarity.sq8GlobalBounds]] — the same
    *     function the collect-based build derives its grid from, and
    *     min/max are order-independent, so the grids are bit-equal);
    *  3. the bit threshold is the corpus-global INTEGER column total
    *     of the SQ8 codes — one more scan-stage fold of exact Long
    *     sums (order-independent again), from which
    *     `bit_cut = ⌊Σcode/n⌋+1` and the f64 query thresholds follow
    *     by [[graft.operators.Similarity.bqFromSq8]]'s own
    *     arithmetic;
    *  4. one encode scan with the broadcast grid+cut — each row
    *     leaves its executor as (bit words, SQ8 codes, norms), ~8×
    *     narrower than the raw f64 vector — through ONE exchange
    *     (partition by shard, `row_number` by id assigns the dense
    *     pack position the persisted layout needs, matching the
    *     collect path's id-ascending pack) straight into the
    *     [[writeBqShardedIndex]] layout inside a single atomic
    *     publish. Raw vectors never shuffle and never collect.
    *
    * The result restores through
    * [[graft.sources.Source.readBqShardedIndex]] BYTE-IDENTICAL to
    * `writeBqShardedIndex(buildBqShardedWithLayout(...))` (SinkSpec
    * pins ids/words/codes/thresholds/bit_cut/norms equality; the
    * driver gate `ann_bq_dist_gate` re-pins it per round), because
    * every arithmetic step runs the same factored code on the same
    * values — the only reductions are integer sums and min/max, both
    * reduction-order-proof. Ids must be unique (they key the pack
    * order); ragged dims throw the kernel's "Dimension mismatch";
    * same shard split (`pmod(xxhash64(id), numShards)`), same
    * skip-empty-shards compaction, same routing-identity manifest.
    */
  def writeBqShardedIndexDistributed(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numShards: Int,
      path: String,
      overwrite: Boolean = false): Unit = {
    import graft.operators.Similarity
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    requireEmbColType(corpus, embCol)
    val sc = spark.sparkContext
    val shardCol =
      pmod(xxhash64(col(idCol).cast(LongType)), lit(numShards)).cast(LongType)
    val narrow = corpus.select(shardCol.as("shard"),
      col(idCol).cast(LongType).as("id"))
    // ONE (shard, id) aggregation serves both the dup-id refusal and
    // the per-shard counts (the writeIvfPqShardedIndexDistributed
    // pass-1 shape: equal ids land in the same shard, so per-(shard,
    // id) counts see every duplicate)
    val perId = narrow.groupBy("shard", "id").count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts: Map[Long, Long] =
      try {
        val dupId = perId.filter(col("count") > 1).limit(1).collect()
        require(dupId.isEmpty,
          s"duplicate id in corpus: ${dupId.headOption.map(_.getLong(1)).getOrElse(-1L)}")
        perId.groupBy("shard").agg(sum("count").as("count"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally { perId.unpersist(); () }
    require(counts.nonEmpty, "Empty corpus")
    val dim = corpus.select(col(embCol)).filter(col(embCol).isNotNull)
      .head().getSeq[Any](0).length
    val nWords = (dim + 63) >>> 6
    counts.foreach { case (s, c) =>
      require(c <= Int.MaxValue && c * nWords <= Int.MaxValue &&
          c * dim <= Int.MaxValue,
        s"shard $s holds $c rows × $nWords words / $dim codes — one shard " +
          "must fit an index; raise numShards")
    }
    val nTot = counts.values.sum
    // pass 2: the corpus-global SQ8 grid (shared fold — bit-equal to
    // the collect-based build's grid)
    val (gridMin, gridScale) = Similarity.sq8GlobalBounds(corpus, embCol, dim)
    // pass 3: exact integer column totals of the SQ8 codes
    val dd = dim
    val proj = corpus.select(col(embCol))
    val isF32 = proj.schema.head.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val bcGrid = sc.broadcast((gridMin, gridScale))
    val colSum: Array[Long] =
      try {
        org.apache.spark.sql.graft.InternalRowBridge.toInternalRdd(proj)
          .mapPartitions { it =>
            val (mn, scl) = bcGrid.value
            val acc = new Array[Long](dd)
            val v = new Array[Double](dd)
            val codes = new Array[Byte](dd)
            it.foreach { row =>
              val a = row.getArray(0)
              require(a.numElements() == dd,
                s"ragged embedding: ${a.numElements()} elements, corpus dim $dd")
              var d = 0
              while (d < dd) {
                v(d) = if (isF32) a.getFloat(d).toDouble else a.getDouble(d)
                d += 1
              }
              Similarity.sq8EncodeRow(v, 0, dd, mn, scl, codes, 0)
              var d2 = 0
              while (d2 < dd) { acc(d2) += (codes(d2) & 0xFF).toLong; d2 += 1 }
            }
            Iterator.single(acc)
          }
          .treeReduce { (a, b) =>
            var d = 0
            while (d < dd) { a(d) += b(d); d += 1 }
            a
          }
      } finally bcGrid.destroy()
    // bqFromSq8's own threshold arithmetic over the global totals
    val bitCut = new Array[Int](dd)
    val thresholds = new Array[Double](dd)
    var d0 = 0
    while (d0 < dd) {
      bitCut(d0) = (colSum(d0) / nTot + 1L).toInt
      thresholds(d0) = gridMin(d0) + (colSum(d0).toDouble / nTot) * gridScale(d0)
      d0 += 1
    }
    // pass 4: encode scan-stage, number by (shard | id) through the
    // one code-width exchange, land in the persisted layout
    val shardVals: Seq[Long] = counts.keys.toSeq.sorted
    val shardOut: Map[Long, Int] = shardVals.zipWithIndex.toMap
    val nW = nWords
    val bcEnc = sc.broadcast((gridMin, gridScale, bitCut))
    try {
      publishAtomically(spark, path, overwrite) { tmp =>
        import spark.implicits._
        Seq((shardVals.size, nTot, "xxhash64_pmod", numShards, shardVals))
          .toDF("num_shards", "total_n", "shard_key",
            "hash_modulus", "shard_hash_vals")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
        val withShard = corpus.select(shardCol.as("shard"),
          col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
        val encoded = withShard.rdd.mapPartitions { it =>
          val (mn, scl, cut) = bcEnc.value
          it.map { row =>
            val v = embDoubles(row.getSeq[Any](2))
            if (v.length != dd) throw new IllegalArgumentException(
              s"Dimension mismatch: corpus rows have $dd and ${v.length} elements")
            val codes = new Array[Byte](dd)
            val sq = Similarity.sq8EncodeRow(v, 0, dd, mn, scl, codes, 0)
            val words = new Array[Long](nW)
            var d = 0
            while (d < dd) {
              if ((codes(d) & 0xFF) >= cut(d)) words(d >>> 6) |= 1L << (d & 63)
              d += 1
            }
            Row(row.getLong(0), row.getLong(1), words, codes, math.sqrt(sq), sq)
          }
        }
        val wIdx = Window.partitionBy("shard").orderBy("id")
        spark.createDataFrame(encoded, bqEncSchema)
          .withColumn("idx", (row_number().over(wIdx) - 1).cast(IntegerType))
          .withColumn("shard_out", element_at(typedLit(shardOut), col("shard")))
          .select("shard_out", "idx", "id", "words", "code", "norm", "sq_norm")
          .write.partitionBy("shard_out").mode(SaveMode.ErrorIfExists)
          .parquet(s"$tmp/__vectors__")
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(sc.hadoopConfiguration)
        Par.shards(shardVals.zipWithIndex) { case (s, i) =>
          val shardDir = new org.apache.hadoop.fs.Path(f"$tmp/shard_$i%04d")
          require(fs.mkdirs(shardDir), s"could not create $shardDir")
          val src = new org.apache.hadoop.fs.Path(s"$tmp/__vectors__/shard_out=$i")
          require(fs.exists(src),
            s"encode pass produced no partition for shard $s at $src")
          require(fs.rename(src,
            new org.apache.hadoop.fs.Path(shardDir, "vectors")),
            s"could not move $src into $shardDir")
          Seq((counts(s).toInt, dd, nW, thresholds.toSeq, gridMin.toSeq,
              gridScale.toSeq, bitCut.toSeq))
            .toDF("n", "dim", "n_words", "thresholds", "dim_min",
              "dim_scale", "bit_cut")
            .write.mode(SaveMode.ErrorIfExists).parquet(s"$shardDir/meta")
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/__vectors__"), true)
      }
    } finally bcEnc.destroy()
  }

  /** APPEND new rows to a persisted SHARDED BQ index — the
    * [[appendBqIndex]] encode (frozen corpus-global grid/thresholds/
    * `bit_cut`, shard-INDEPENDENT because every BQ shard cuts on the
    * same global threshold) composed with
    * [[appendIvfPqShardedIndex]]'s routing/copy/publish contracts:
    * new rows route to `pmod(xxhash64(id), hash_modulus)` (falling
    * back to `hash mod num_dirs` for hash values whose shard was
    * compacted away at build — any shard can encode any row, only
    * the degenerate placement is approximate), old vectors are
    * copied AS FILES, pack positions continue from each shard's old
    * `n`, tombstones carry forward, and the grown index publishes
    * atomically. Duplicate/clashing ids and dimension mismatches
    * refuse by name.
    */
  def appendBqShardedIndex(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    import spark.implicits._
    requireEmbColType(newRows, embCol)
    val manifestDf = spark.read.parquet(s"$indexPath/manifest")
    val manifest = manifestDf.head()
    val numShards = manifest.getInt(manifest.fieldIndex("num_shards"))
    val totalN = manifest.getLong(manifest.fieldIndex("total_n"))
    val shardKey = manifest.getString(manifest.fieldIndex("shard_key"))
    require(shardKey == "xxhash64_pmod",
      s"cannot append to an index with shard key '$shardKey'")
    val hashModulus = manifest.getInt(manifest.fieldIndex("hash_modulus"))
    val hashVals = manifest.getSeq[Long](manifest.fieldIndex("shard_hash_vals"))
    val built = hashVals.zipWithIndex.toMap
    val dirOfHash: Map[Long, Long] = (0L until hashModulus.toLong)
      .map(h => h -> built.getOrElse(h, (h % numShards).toInt).toLong).toMap
    // the frozen encode artifacts are corpus-GLOBAL — every shard's
    // meta carries the same grid/thresholds/cut (validated here so a
    // corrupt mixed-grid index refuses instead of encoding wrong)
    require(spark.read.parquet(s"$indexPath/shard_0000/meta")
      .schema.fieldNames.contains("bit_cut"),
      s"the BQ index at $indexPath predates the bit_cut meta column — " +
        "appends need the frozen integer threshold; re-persist once to " +
        "upgrade the layout")
    def metaOf(i: Int) = spark.read.parquet(f"$indexPath/shard_$i%04d/meta")
      .select("n", "dim", "n_words", "thresholds", "dim_min", "dim_scale",
        "bit_cut").head()
    val m0 = metaOf(0)
    val dim = m0.getInt(1)
    val nWords = m0.getInt(2)
    val dimMin = m0.getSeq[Float](4).toArray
    val dimScale = m0.getSeq[Float](5).toArray
    val bitCut = m0.getSeq[Int](6).toArray
    // independent per-shard meta reads fanned out per guide §2.6
    val oldN: Map[Int, Int] = Par.shards(0 until numShards) { i =>
      val m = metaOf(i)
      require(m.getSeq[Int](6) == m0.getSeq[Int](6) &&
        m.getSeq[Double](3) == m0.getSeq[Double](3),
        s"shard $i cuts on a different threshold than shard 0 — corrupt index")
      i -> m.getInt(0)
    }.toMap

    val narrow = newRows.select(
      element_at(typedLit(dirOfHash),
        pmod(xxhash64(col(idCol).cast(LongType)), lit(hashModulus))
          .cast(LongType)).as("shard"),
      col(idCol).cast(LongType).as("id"),
      col(embCol).as("emb"))
    val dupIn = narrow.groupBy("id").count().filter(col("count") > 1)
      .limit(1).collect()
    require(dupIn.isEmpty,
      s"duplicate id in append batch: ${dupIn.headOption.map(_.getLong(0)).getOrElse(-1L)}")
    val storedIds = spark.read.parquet(
      (0 until numShards).map(i => f"$indexPath/shard_$i%04d/vectors"): _*)
      .select(col("id"))
    val clash = narrow.select("id").join(storedIds, Seq("id"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"id ${clash.headOption.map(_.getLong(0)).getOrElse(-1L)} already " +
        s"exists in the index at $indexPath")
    val newCounts: Map[Long, Long] = narrow.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newTotal = newCounts.values.sum
    (0 until numShards).foreach { i =>
      val grown = oldN(i).toLong + newCounts.getOrElse(i.toLong, 0L)
      // grown*dim guards the SQ8 code array read-back allocates (dim
      // can be 64× nWords, so the words cap alone lets an append
      // succeed whose restore would overflow Int)
      require(grown <= Int.MaxValue && grown * nWords <= Int.MaxValue &&
          grown * dim <= Int.MaxValue,
        s"shard $i would grow to $grown rows — one shard must fit an index")
    }

    val dd = dim
    val nW = nWords
    val sc = spark.sparkContext
    val bcG = sc.broadcast((dimMin, dimScale, bitCut))
    try {
      publishAtomically(spark, outPath, overwrite) { tmp =>
        Seq((numShards, totalN + newTotal, shardKey, hashModulus, hashVals))
          .toDF("num_shards", "total_n", "shard_key",
            "hash_modulus", "shard_hash_vals")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
        val encoded = narrow.rdd.mapPartitions { it =>
          val (mn, scale, cut) = bcG.value
          it.map { row =>
            val v = embDoubles(row.getSeq[Any](2))
            if (v.length != dd) throw new IllegalArgumentException(
              s"Dimension mismatch: corpus rows have $dd and ${v.length} elements")
            val codes = new Array[Byte](dd)
            val sq = graft.operators.Similarity.sq8EncodeRow(
              v, 0, dd, mn, scale, codes, 0)
            val words = new Array[Long](nW)
            var d = 0
            while (d < dd) {
              if ((codes(d) & 0xFF) >= cut(d)) words(d >>> 6) |= 1L << (d & 63)
              d += 1
            }
            Row(row.getLong(0), row.getLong(1), words, codes,
              math.sqrt(sq), sq)
          }
        }
        val wIdx = Window.partitionBy("shard").orderBy("id")
        val baseCol = element_at(
          typedLit(oldN.map { case (i, n) => i.toLong -> n.toLong }),
          col("shard"))
        spark.createDataFrame(encoded, bqEncSchema)
          .withColumn("idx",
            (baseCol + row_number().over(wIdx) - 1).cast(IntegerType))
          .withColumn("shard_out", col("shard").cast(IntegerType))
          .select("shard_out", "idx", "id", "words", "code", "norm", "sq_norm")
          .write.partitionBy("shard_out").mode(SaveMode.ErrorIfExists)
          .parquet(s"$tmp/__append__")
        val conf = sc.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
        // per-shard copy/move/meta tails are independent — guide §2.6
        Par.shards(0 until numShards) { i =>
          val shardDir = new org.apache.hadoop.fs.Path(f"$tmp/shard_$i%04d")
          require(fs.mkdirs(shardDir), s"could not create $shardDir")
          val oldVec = new org.apache.hadoop.fs.Path(f"$indexPath/shard_$i%04d/vectors")
          val dstVec = new org.apache.hadoop.fs.Path(shardDir, "vectors")
          require(org.apache.hadoop.fs.FileUtil.copy(
            oldVec.getFileSystem(conf), oldVec, fs, dstVec, false, conf),
            s"could not copy $oldVec into $shardDir")
          val part = new org.apache.hadoop.fs.Path(s"$tmp/__append__/shard_out=$i")
          if (fs.exists(part)) {
            fs.listStatus(part).foreach { st =>
              val nm = st.getPath.getName
              if (nm.startsWith("part-"))
                require(fs.rename(st.getPath,
                  new org.apache.hadoop.fs.Path(dstVec, s"append-$nm")),
                  s"could not move ${st.getPath} into $dstVec")
            }
          }
          Seq(((oldN(i) + newCounts.getOrElse(i.toLong, 0L)).toInt, dim,
              nWords, m0.getSeq[Double](3), dimMin.toSeq, dimScale.toSeq,
              bitCut.toSeq))
            .toDF("n", "dim", "n_words", "thresholds", "dim_min",
              "dim_scale", "bit_cut")
            .write.mode(SaveMode.ErrorIfExists).parquet(s"$shardDir/meta")
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/__append__"), true)
        // carry tombstones forward (re-adding a tombstoned id is
        // refused by the stored-id clash above — compact to free it)
        val oldTs = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
        if (oldTs.getFileSystem(conf).exists(oldTs))
          require(org.apache.hadoop.fs.FileUtil.copy(
            oldTs.getFileSystem(conf), oldTs, fs,
            new org.apache.hadoop.fs.Path(s"$tmp/tombstones"), false, conf),
            s"could not carry $oldTs forward")
      }
    } finally bcG.destroy()
  }

  /** TOMBSTONE delete from a persisted sharded BQ index — the
    * [[deleteFromIvfPqShardedIndex]] contracts verbatim: metadata-only
    * (file-level copy + the grown `tombstones/` id set), every
    * deleted id must be stored, double-delete refused, the plain
    * [[graft.sources.Source.readBqShardedIndex]] refuses a tombstoned
    * index, serving applies the set as an always-on deny mask
    * ([[graft.operators.Similarity.topkBqShardedTombstoned]] /
    * the wave serves' `deniedIds`), and
    * [[compactBqShardedIndex]] retires the masks.
    */
  def deleteFromBqShardedIndex(
      spark: SparkSession,
      deleteIds: DataFrame,
      idCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit =
    deleteFromShardedIndexCore(spark, deleteIds, idCol, indexPath, outPath,
      overwrite)

  /** The layout-generic tombstone delete: every sharded layout here
    * stores one `id` column per row under `shard_NNNN/vectors` and a
    * `num_shards` manifest, so the stored-id / double-delete
    * refusals, the file-level copy, and the grown tombstone set are
    * ONE implementation shared by the BQ and IVF+BQ deletes (the
    * IVF+PQ delete keeps its own body for the OPQ `rot/` carry).
    */
  private def deleteFromShardedIndexCore(
      spark: SparkSession,
      deleteIds: DataFrame,
      idCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean): Unit = {
    val manifest = spark.read.parquet(s"$indexPath/manifest").head()
    val numShards = manifest.getInt(manifest.fieldIndex("num_shards"))
    val del = deleteIds.select(col(idCol).cast(LongType).as("id"))
      .na.drop().distinct()
    val storedIds = spark.read.parquet(
      (0 until numShards).map(i => f"$indexPath/shard_$i%04d/vectors"): _*)
      .select(col("id"))
    val conf = spark.sparkContext.hadoopConfiguration
    val tsPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val hadTs = tsPath.getFileSystem(conf).exists(tsPath)
    val existing =
      if (hadTs) spark.read.parquet(tsPath.toString).select(col("id"))
      else spark.emptyDataFrame.select(lit(0L).as("id")).limit(0)
    // ONE validation job for all three refusal contracts (empty set /
    // unknown id / double delete) — they were three sequential
    // actions, each re-scanning the delete set; stored and tombstone
    // ids are unique by the index contract, so the left joins
    // preserve the delete-set cardinality exactly. That uniqueness is
    // VERIFIED, not assumed (round-16 advisor): `del` is distinct, so
    // any join-row multiplication (n > distinct n) can only come from
    // a duplicated stored/tombstone id — a corrupt index — and
    // refuses by name instead of silently passing the count checks.
    val chk = del
      .join(storedIds.withColumn("__stored", lit(1)), Seq("id"), "left")
      .join(existing.withColumn("__ts", lit(1)), Seq("id"), "left")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("nd"),
        min(when(col("__stored").isNull, col("id"))).as("unknown"),
        min(when(col("__ts").isNotNull, col("id"))).as("dbl"))
      .head()
    require(chk.getLong(0) > 0L, "empty delete set")
    require(chk.getLong(0) == chk.getLong(1),
      s"corrupt index at $indexPath: a stored or tombstone id is " +
        s"duplicated (delete validation saw ${chk.getLong(0)} rows for " +
        s"${chk.getLong(1)} distinct delete ids)")
    require(chk.isNullAt(2),
      s"cannot delete id ${chk.getLong(2)}: " +
        s"not stored in the index at $indexPath")
    require(chk.isNullAt(3),
      s"id ${chk.getLong(3)} is already " +
        "tombstoned (double delete)")
    publishAtomically(spark, outPath, overwrite) { tmp =>
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
      Par.shards(Seq("manifest") ++ (0 until numShards).map(i => f"shard_$i%04d")) { d =>
        val src = new org.apache.hadoop.fs.Path(s"$indexPath/$d")
        require(org.apache.hadoop.fs.FileUtil.copy(
          src.getFileSystem(conf), src, fs,
          new org.apache.hadoop.fs.Path(s"$tmp/$d"), false, conf),
          s"could not copy $src")
      }
      existing.unionAll(del).repartition(1)
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/tombstones")
    }
  }

  /** Compact a tombstoned sharded BQ index — drop tombstoned rows,
    * renumber pack positions contiguously in original order, shrink
    * each shard meta's `n` and the manifest's `total_n`, emit NO
    * tombstone set (the [[compactIvfPqShardedIndex]] contract; the
    * frozen thresholds/grid/bit_cut are untouched — dropping rows
    * never moves the cut, exactly like [[appendBqIndex]] never moves
    * it when adding them).
    */
  def compactBqShardedIndex(
      spark: SparkSession,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    val manifestDf = spark.read.parquet(s"$indexPath/manifest")
    val manifest = manifestDf.head()
    val numShards = manifest.getInt(manifest.fieldIndex("num_shards"))
    val conf = spark.sparkContext.hadoopConfiguration
    val tsPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    require(tsPath.getFileSystem(conf).exists(tsPath),
      s"no tombstones at $indexPath — nothing to compact")
    val ts = spark.read.parquet(tsPath.toString).select(col("id"))
      .localCheckpoint(eager = true)
    publishAtomically(spark, outPath, overwrite) { tmp =>
      // per-shard compactions are independent (distinct source and
      // destination dirs; the tombstone set is an eager checkpoint) —
      // fanned out per guide §2.6 so the B small rewrite jobs overlap
      val liveTotal = Par.shards(0 until numShards) { i =>
        val shardDir = f"shard_$i%04d"
        val vecs = spark.read.parquet(s"$indexPath/$shardDir/vectors")
        // pack positions are contiguous 0..n-1 per shard, so a kept
        // row's new position is its old one minus the count of
        // dropped positions below it — a MAP-ONLY renumber (zero
        // shuffle; the previous global-orderBy window funneled the
        // whole shard through one task, guide §2). The dropped set
        // is bounded by the tombstone batch, read off a two-column
        // pruned scan.
        val dropped = vecs.select("id", "idx")
          .join(ts, Seq("id"), "left_semi")
          .select("idx").collect().map(_.getInt(0)).sorted
        val bcDropped = spark.sparkContext.broadcast(dropped)
        val newIdx = udf { (p: Int) =>
          val d = bcDropped.value
          var lo = 0; var hi = d.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (d(mid) < p) lo = mid + 1 else hi = mid
          }
          p - lo
        }.asNonNullable()
        val renumbered = vecs.join(ts, Seq("id"), "left_anti")
          .withColumn("idx", newIdx(col("idx")))
        renumbered.write.mode(SaveMode.ErrorIfExists)
          .parquet(s"$tmp/$shardDir/vectors")
        bcDropped.destroy()
        val liveN = spark.read.parquet(s"$tmp/$shardDir/vectors").count()
        spark.read.parquet(s"$indexPath/$shardDir/meta")
          .withColumn("n", lit(liveN).cast(IntegerType))
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/$shardDir/meta")
        liveN
      }.sum
      manifestDf.withColumn("total_n", lit(liveTotal))
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
    }
  }

  /** APPEND new rows to a persisted BQ index — the encode-only daily
    * ingest of the flat binary-quantized family (the
    * [[appendIvfPqShardedIndex]] contracts, verbatim): NO retraining,
    * no raw-vector collect, and the source index is never mutated
    * (the grown index publishes atomically at `outPath`; a crash
    * leaves no torn state anywhere).
    *
    *  - The SQ8 grid, the f64 query thresholds, and the integer
    *    `bit_cut` are FROZEN: new rows SQ8-encode against the stored
    *    bounds (values outside the grid clamp to the edge — the
    *    rerank degrades gracefully for outliers instead of
    *    corrupting) and their bits cut at `code >= bit_cut`, exactly
    *    the build's integer contract, so an appended row's bits equal
    *    what a build over the same grid would set. The threshold is
    *    intentionally NOT re-derived from the grown corpus: moving
    *    the cut would flip OLD rows' bits (a rebuild, not an append);
    *    re-train on a schedule instead.
    *  - Old vectors are COPIED AS FILES (the bytes are already
    *    right); new rows land as additional parquet files in
    *    `vectors/` with pack positions continuing from the old `n`
    *    (encode is scan-stage; the dense numbering is a sort +
    *    zipWithIndex over the batch, never the corpus). Meta is
    *    rewritten with the grown `n`; everything else is copied
    *    through unchanged.
    *
    * Duplicate ids — within `newRows` or against the stored index —
    * REFUSE (ids key an index); dimension mismatches throw the
    * kernel's named error; an index persisted before the `bit_cut`
    * meta column refuses by name (re-persist once with the current
    * writer to upgrade). The result reads back through
    * [[graft.sources.Source.readBqIndex]] and serves like any built
    * index (SinkSpec pins old-row byte identity, new-row encode
    * correctness, and search recall over the grown corpus).
    */
  def appendBqIndex(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    import spark.implicits._
    requireEmbColType(newRows, embCol)
    val metaDf = spark.read.parquet(s"$indexPath/meta")
    require(metaDf.schema.fieldNames.contains("bit_cut"),
      s"the BQ index at $indexPath predates the bit_cut meta column — " +
        "appends need the frozen integer threshold; re-persist the index " +
        "with writeBqIndex once to upgrade the layout")
    val meta = metaDf
      .select("n", "dim", "n_words", "thresholds", "dim_min", "dim_scale",
        "bit_cut").head()
    val oldN = meta.getInt(0)
    val dim = meta.getInt(1)
    val nWords = meta.getInt(2)
    val thresholds = meta.getSeq[Double](3)
    val dimMin = meta.getSeq[Float](4).toArray
    val dimScale = meta.getSeq[Float](5).toArray
    val bitCut = meta.getSeq[Int](6).toArray

    val narrow = newRows.select(
      col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
    val newN = requireFreshAppendIds(narrow, s"$indexPath/vectors", indexPath)
    // the dim product guards the SQ8 code array read-back allocates
    // (dim can be 64× nWords — see the sharded append's same cap)
    require(oldN + newN <= Int.MaxValue &&
        (oldN + newN) * nWords.toLong <= Int.MaxValue &&
        (oldN + newN) * dim.toLong <= Int.MaxValue,
      s"index would grow to ${oldN + newN} rows × $nWords words / $dim " +
        "codes — past the JVM array cap; shard the corpus (buildBqSharded) " +
        "instead")

    val dd = dim
    val nW = nWords
    val bcG = spark.sparkContext.broadcast((dimMin, dimScale, bitCut))
    try {
      publishAtomically(spark, outPath, overwrite) { tmp =>
        val encoded = narrow.orderBy("id").rdd.zipWithIndex.mapPartitions { it =>
          val (mn, sc, cut) = bcG.value
          it.map { case (row, i) =>
            val v = embDoubles(row.getSeq[Any](1))
            if (v.length != dd) throw new IllegalArgumentException(
              s"Dimension mismatch: corpus rows have $dd and ${v.length} elements")
            val codes = new Array[Byte](dd)
            val sq = graft.operators.Similarity.sq8EncodeRow(
              v, 0, dd, mn, sc, codes, 0)
            val words = new Array[Long](nW)
            var d = 0
            while (d < dd) {
              if ((codes(d) & 0xFF) >= cut(d)) words(d >>> 6) |= 1L << (d & 63)
              d += 1
            }
            Row(oldN + i.toInt, row.getLong(0), words, codes, math.sqrt(sq), sq)
          }
        }
        val encSchema = StructType(Seq(
          StructField("idx", IntegerType, nullable = false),
          StructField("id", LongType, nullable = false),
          StructField("words", ArrayType(LongType, containsNull = false),
            nullable = false),
          StructField("code", BinaryType, nullable = false),
          StructField("norm", DoubleType, nullable = false),
          StructField("sq_norm", DoubleType, nullable = false)))
        copyVectorsWithAppend(spark, tmp, s"$indexPath/vectors",
          spark.createDataFrame(encoded, encSchema))
        Seq(((oldN + newN).toInt, dim, nWords, thresholds,
            dimMin.toSeq, dimScale.toSeq, bitCut.toSeq))
          .toDF("n", "dim", "n_words", "thresholds", "dim_min", "dim_scale",
            "bit_cut")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/meta")
      }
    } finally bcG.destroy()
  }

  /** Id hygiene shared by every flat encode-only append: refuse
    * duplicate ids within the batch and ids already present in the
    * stored index (ids key an index — a silent double-insert would
    * corrupt every downstream dedup/join on the serve results).
    * Returns the batch size (the one `count()` the caps need).
    */
  private def requireFreshAppendIds(
      narrow: DataFrame, storedVectorsDir: String, indexPath: String): Long = {
    val spark = narrow.sparkSession
    val dupIn = narrow.groupBy("id").count().filter(col("count") > 1)
      .limit(1).collect()
    require(dupIn.isEmpty,
      s"duplicate id in append batch: ${dupIn.headOption.map(_.getLong(0)).getOrElse(-1L)}")
    val storedIds = spark.read.parquet(storedVectorsDir).select(col("id"))
    val clash = narrow.select("id").join(storedIds, Seq("id"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"id ${clash.headOption.map(_.getLong(0)).getOrElse(-1L)} already " +
        s"exists in the index at $indexPath")
    narrow.count()
  }

  /** The shared tail of every flat encode-only append: old vectors
    * COPY AS FILES (their bytes are already right — no decode, no
    * re-encode, no shuffle), the encoded batch lands beside them as
    * `append-part-*` files in `destDir/vectors`. `destDir` is inside
    * an in-flight atomic publish, so a crash mid-copy leaves no torn
    * state at any readable path.
    */
  private def copyVectorsWithAppend(
      spark: SparkSession, destDir: String, srcVectorsDir: String,
      appendDf: DataFrame): Unit = {
    appendDf.write.mode(SaveMode.ErrorIfExists).parquet(s"$destDir/__append__")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(destDir).getFileSystem(conf)
    val oldVec = new org.apache.hadoop.fs.Path(srcVectorsDir)
    val dstVec = new org.apache.hadoop.fs.Path(s"$destDir/vectors")
    require(org.apache.hadoop.fs.FileUtil.copy(
      oldVec.getFileSystem(conf), oldVec, fs, dstVec, false, conf),
      s"could not copy $oldVec into $destDir")
    val appDir = new org.apache.hadoop.fs.Path(s"$destDir/__append__")
    fs.listStatus(appDir).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("part-"))
        require(fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(dstVec, s"append-$nm")),
          s"could not move ${st.getPath} into $dstVec")
    }
    fs.delete(appDir, true)
  }

  /** APPEND new rows to a persisted flat SQ8 index — the
    * [[appendBqIndex]] contract for the plain scalar-quantized rung:
    * the per-dim grid is FROZEN (new rows encode against the stored
    * bounds, outliers clamp to the grid edge), old vectors copy as
    * files, the batch encodes scan-stage with pack positions
    * continuing from the stored `n`, and the grown index publishes
    * atomically at `outPath`. Duplicate ids (within the batch or vs
    * the index) and dimension mismatches refuse by name. The result
    * reads back through [[graft.sources.Source.readSq8Index]]
    * byte-identical on old rows and encode-exact on new ones
    * (SinkSpec pins both against the driver quantizer).
    */
  def appendSq8Index(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    import spark.implicits._
    requireEmbColType(newRows, embCol)
    val meta = spark.read.parquet(s"$indexPath/meta")
      .select("n", "dim", "dim_min", "dim_scale").head()
    val oldN = meta.getInt(0)
    val dim = meta.getInt(1)
    val dimMin = meta.getSeq[Float](2).toArray
    val dimScale = meta.getSeq[Float](3).toArray
    val narrow = newRows.select(
      col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
    val newN = requireFreshAppendIds(narrow, s"$indexPath/vectors", indexPath)
    require(oldN + newN <= Int.MaxValue &&
        (oldN + newN) * dim.toLong <= Int.MaxValue,
      s"index would grow to ${oldN + newN} rows × $dim codes — past the " +
        "JVM array cap; shard the corpus (buildSq8Sharded) instead")
    val dd = dim
    val bcG = spark.sparkContext.broadcast((dimMin, dimScale))
    try {
      publishAtomically(spark, outPath, overwrite) { tmp =>
        val encoded = narrow.orderBy("id").rdd.zipWithIndex.mapPartitions { it =>
          val (mn, sc) = bcG.value
          it.map { case (row, i) =>
            val v = embDoubles(row.getSeq[Any](1))
            if (v.length != dd) throw new IllegalArgumentException(
              s"Dimension mismatch: corpus rows have $dd and ${v.length} elements")
            val codes = new Array[Byte](dd)
            val sq = graft.operators.Similarity.sq8EncodeRow(
              v, 0, dd, mn, sc, codes, 0)
            Row(oldN + i.toInt, row.getLong(0), codes, math.sqrt(sq), sq)
          }
        }
        val encSchema = StructType(Seq(
          StructField("idx", IntegerType, nullable = false),
          StructField("id", LongType, nullable = false),
          StructField("code", BinaryType, nullable = false),
          StructField("norm", DoubleType, nullable = false),
          StructField("sq_norm", DoubleType, nullable = false)))
        copyVectorsWithAppend(spark, tmp, s"$indexPath/vectors",
          spark.createDataFrame(encoded, encSchema))
        Seq(((oldN + newN).toInt, dim, dimMin.toSeq, dimScale.toSeq))
          .toDF("n", "dim", "dim_min", "dim_scale")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/meta")
      }
    } finally bcG.destroy()
  }

  /** The PQ append body written into an already-owned dir — shared by
    * [[appendPqIndex]] (destDir = the publish tmp) and
    * [[appendOpqIndex]] (destDir = `tmp/pq`, with the frozen learned
    * rotation applied to each new row first, exactly where the build
    * applies it: PQ codes, PQ norms, and the SQ8 rerank sidecar are
    * all computed in ROTATED space, matching `quantizeOpq`'s
    * `quantizePq(rotateIndex(...))` composition).
    *
    * The effective codebook count `k` matters: `quantizePq` trains
    * `k = min(256, n)` centroids and leaves the rest of the 256-slot
    * block zero — encoding a new row against an untrained zero
    * centroid would silently corrupt its code. A build's meta doesn't
    * record k, but its build-time `n` does (k = min(256, build n)),
    * and every append REWRITES meta with the grown n — so the first
    * append derives k from the stored build n and persists it as a
    * trailing `pq_k` meta column (readers are positional over the
    * first six columns, untouched); later appends read it back.
    */
  private def appendPqInto(
      spark: SparkSession,
      narrow: DataFrame,
      newN: Long,
      pqPath: String,
      destDir: String,
      rot: Option[Array[Double]]): Unit = {
    import spark.implicits._
    val metaDf = spark.read.parquet(s"$pqPath/meta")
    val meta = metaDf.head()
    val oldN = meta.getInt(0)
    val dim = meta.getInt(1)
    val m = meta.getInt(2)
    val codebooks = meta.getSeq[Float](3).toArray
    val sq8Min = if (meta.isNullAt(4)) None else Some(meta.getSeq[Float](4).toArray)
    val sq8Scale = if (meta.isNullAt(5)) None else Some(meta.getSeq[Float](5).toArray)
    val k =
      if (metaDf.schema.fieldNames.contains("pq_k"))
        meta.getInt(metaDf.schema.fieldIndex("pq_k"))
      else math.max(1, math.min(256, oldN))
    require(oldN + newN <= Int.MaxValue &&
        (oldN + newN) * m.toLong <= Int.MaxValue &&
        (sq8Min.isEmpty || (oldN + newN) * dim.toLong <= Int.MaxValue),
      s"index would grow to ${oldN + newN} rows × $m codes / $dim rerank " +
        "codes — past the JVM array cap; shard the corpus " +
        "(buildIvfPqSharded) instead")
    val dd = dim
    val mm = m
    val subv = dim / m
    val kk = k
    val bcE = spark.sparkContext.broadcast(
      (codebooks, sq8Min.orNull, sq8Scale.orNull, rot.orNull))
    try {
      val encoded = narrow.orderBy("id").rdd.zipWithIndex.mapPartitions { it =>
        val (cb, s8mn, s8sc, rt) = bcE.value
        it.map { case (row, i) =>
          val raw = embDoubles(row.getSeq[Any](1))
          if (raw.length != dd) throw new IllegalArgumentException(
            s"Dimension mismatch: corpus rows have $dd and ${raw.length} elements")
          val v =
            if (rt == null) raw
            else {
              val o = new Array[Double](dd)
              graft.operators.Similarity.rotateRow(rt, raw, 0, dd, o, 0)
              o
            }
          val pqc = new Array[Byte](mm)
          graft.operators.Similarity.pqEncodeRow(
            v, 0, dd, mm, subv, kk, cb, pqc, 0)
          // PQ norms are EXACT (from the uncompressed row, f32-stored)
          // while the sidecar's are the dequantized-grid values —
          // quantizePq's exact split, replicated
          var sq = 0.0
          var d = 0
          while (d < dd) { sq += v(d) * v(d); d += 1 }
          if (s8mn != null) {
            val c8 = new Array[Byte](dd)
            val sq8 = graft.operators.Similarity.sq8EncodeRow(
              v, 0, dd, s8mn, s8sc, c8, 0)
            Row(oldN + i.toInt, row.getLong(0), pqc,
              math.sqrt(sq).toFloat, sq.toFloat, c8, math.sqrt(sq8), sq8)
          } else
            Row(oldN + i.toInt, row.getLong(0), pqc,
              math.sqrt(sq).toFloat, sq.toFloat, null, null, null)
        }
      }
      val encSchema = StructType(Seq(
        StructField("idx", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("code", BinaryType, nullable = false),
        StructField("norm", FloatType, nullable = false),
        StructField("sq_norm", FloatType, nullable = false),
        StructField("sq8_code", BinaryType, nullable = true),
        StructField("sq8_norm", DoubleType, nullable = true),
        StructField("sq8_sq_norm", DoubleType, nullable = true)))
      copyVectorsWithAppend(spark, destDir, s"$pqPath/vectors",
        spark.createDataFrame(encoded, encSchema))
      Seq(((oldN + newN).toInt, dim, m, codebooks.toSeq,
          sq8Min.map(_.toSeq), sq8Scale.map(_.toSeq), k))
        .toDF("n", "dim", "m", "codebooks", "sq8_dim_min", "sq8_dim_scale",
          "pq_k")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$destDir/meta")
    } finally bcE.destroy()
  }

  /** APPEND new rows to a persisted flat PQ index — the
    * [[appendBqIndex]] contract for the product-quantized rung: the
    * trained codebooks (and the SQ8 rerank grid, when the index
    * carries one) are FROZEN, new rows encode to their nearest
    * trained centroid per subspace with the build's own strict-`<`
    * tie rule, old vectors copy as files, and the grown index
    * publishes atomically at `outPath`. Codebooks are intentionally
    * NOT re-trained: moving a centroid would change OLD rows'
    * decode (a rebuild, not an append); re-train on a schedule.
    * Reads back through [[graft.sources.Source.readPqIndex]].
    */
  def appendPqIndex(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    requireEmbColType(newRows, embCol)
    val narrow = newRows.select(
      col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
    val newN = requireFreshAppendIds(narrow, s"$indexPath/vectors", indexPath)
    publishAtomically(spark, outPath, overwrite) { tmp =>
      appendPqInto(spark, narrow, newN, indexPath, tmp, None)
    }
  }

  /** APPEND new rows to a persisted flat OPQ index — [[appendPqIndex]]
    * with the index's learned rotation applied to each new row first
    * (frozen like the codebooks: re-learning the rotation would
    * re-align every OLD row's space — a rebuild). The rotation block
    * copies through unchanged; the wrapped PQ payload grows by the
    * encode-only contract. Reads back through
    * [[graft.sources.Source.readOpqIndex]].
    */
  def appendOpqIndex(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    requireEmbColType(newRows, embCol)
    val rotMeta = spark.read.parquet(s"$indexPath/rot")
      .select("dim", "rot").head()
    val dim = rotMeta.getInt(0)
    val rot = rotMeta.getSeq[Double](1).toArray
    require(rot.length == dim.toLong * dim,
      s"corrupt OPQ rotation: dim=$dim but ${rot.length} values")
    val narrow = newRows.select(
      col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
    val newN =
      requireFreshAppendIds(narrow, s"$indexPath/pq/vectors", indexPath)
    publishAtomically(spark, outPath, overwrite) { tmp =>
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
      val srcRot = new org.apache.hadoop.fs.Path(s"$indexPath/rot")
      require(org.apache.hadoop.fs.FileUtil.copy(
        srcRot.getFileSystem(conf), srcRot, fs,
        new org.apache.hadoop.fs.Path(s"$tmp/rot"), false, conf),
        s"could not copy $srcRot into $tmp")
      appendPqInto(spark, narrow, newN, s"$indexPath/pq", s"$tmp/pq",
        Some(rot))
    }
  }

  /** Persist an IVF+BQ index — centroids + CSR routing + the
    * CSR-position-ordered bit matrix + the SQ8 envelope, byte-exact.
    * Layout: `path/vectors/` one row per CSR slot (slot, the member's
    * original row index, id, bit words, SQ8 codes, norms — vectors
    * restore in slot order so the sequential-bits layout survives);
    * `path/meta/` one row (n, dim, n_words, n_cells, centroids,
    * thresholds, cell_start, grid bounds).
    * [[graft.sources.Source.readIvfBqIndex]] restores byte-identically.
    */
  def writeIvfBqIndex(
      spark: org.apache.spark.sql.SparkSession,
      ix: graft.operators.Similarity.CorpusIndexIvfBq,
      path: String,
      overwrite: Boolean = false): Unit =
    publishAtomically(spark, path, overwrite) { tmp =>
      writeIvfBqInto(spark, ix, tmp)
    }

  /** The IVF+BQ layout body written into an already-owned dir —
    * shared by [[writeIvfBqIndex]] and [[writeIvfBqShardedIndex]].
    */
  private def writeIvfBqInto(
      spark: org.apache.spark.sql.SparkSession,
      ix: graft.operators.Similarity.CorpusIndexIvfBq,
      tmp: String): Unit = {
    import spark.implicits._
    val bytesPerRow = 8L * ix.nWords + ix.dim
    val slices = math.max(1, (ix.n.toLong * bytesPerRow / (64L << 20)).toInt)
    val bc = spark.sparkContext.broadcast(ix)
    try {
      spark.sparkContext.parallelize(0 until ix.n, slices).map { p =>
        val x = bc.value
        val g = x.cellMembers(p) // original row index at CSR slot p
        (p, g, x.ids(g),
          java.util.Arrays.copyOfRange(x.words, p * x.nWords, (p + 1) * x.nWords),
          java.util.Arrays.copyOfRange(x.sq8.codes, g * x.dim, (g + 1) * x.dim),
          x.sq8.norms(g), x.sq8.sqNorms(g))
      }.toDF("slot", "row", "id", "words", "code", "norm", "sq_norm")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/vectors")
    } finally bc.destroy()
    // bit_cut is the frozen-threshold artifact appendIvfBqShardedIndex
    // encodes against (appended LAST so readers by name are untouched)
    Seq((ix.n, ix.dim, ix.nWords, ix.nCells, ix.centroids.toSeq,
        ix.thresholds.toSeq, ix.cellStart.toSeq,
        ix.sq8.dimMin.toSeq, ix.sq8.dimScale.toSeq, ix.bitCut.toSeq))
      .toDF("n", "dim", "n_words", "n_cells", "centroids",
        "thresholds", "cell_start", "dim_min", "dim_scale", "bit_cut")
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/meta")
  }

  /** Persist a SHARDED IVF+BQ build — the [[writeBqShardedIndex]]
    * shape over the routed rung (which the round-15 crossover probe
    * measured as the 50–100M-rows-per-shard form): one
    * [[writeIvfBqIndex]]-layout dir per shard plus a manifest
    * carrying the routing identity. Serve with
    * [[graft.operators.Similarity.topkIvfBqShardedWaves]] or
    * [[graft.streaming.EventStream.topkServeIvfBqShardedWaves]].
    */
  def writeIvfBqShardedIndex(
      spark: org.apache.spark.sql.SparkSession,
      build: graft.operators.Similarity.ShardedIvfBqBuild,
      path: String,
      overwrite: Boolean = false): Unit = {
    require(build.shards.nonEmpty, "Empty shard list")
    require(build.shardHashVals.size == build.shards.size,
      s"shardHashVals has ${build.shardHashVals.size} entries for " +
        s"${build.shards.size} shards")
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      Seq((build.shards.size, build.shards.map(_.n.toLong).sum,
          "xxhash64_pmod", build.hashModulus, build.shardHashVals))
        .toDF("num_shards", "total_n", "shard_key",
          "hash_modulus", "shard_hash_vals")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
      Par.shards(build.shards.zipWithIndex) { case (sx, i) =>
        writeIvfBqInto(spark, sx, f"$tmp/shard_$i%04d")
      }
    }
  }

  /** APPEND new rows to a persisted SHARDED IVF+BQ index — the
    * encode-only ingest for the ROUTED bit rung (the round-15
    * crossover probe's recommendation from ~50M rows/shard up), so a
    * user at the rung's own recommended scale no longer rebuilds the
    * index per ingest batch. The [[appendBqShardedIndex]] contracts
    * composed with the IVF structure:
    *
    *  - rows route to `pmod(xxhash64(id), hash_modulus)` through the
    *    manifest's routing identity (compacted-away hash values fall
    *    back to `hash mod num_dirs` — any shard can host any row:
    *    the encode grid/cut are corpus-global and the cell is
    *    assigned within whichever shard the row lands in);
    *  - the SQ8 grid, f64 query thresholds, and integer `bit_cut`
    *    are FROZEN (corpus-global, validated identical across shard
    *    metas so a corrupt mixed-grid index refuses): new rows
    *    SQ8-encode with clamping, bits cut at `code >= bit_cut` —
    *    the build's exact integer contract;
    *  - cells are FROZEN per shard: each new row dequantizes +
    *    unit-normalizes with [[graft.operators.Similarity
    *    .ivfBqFromSq8]]'s own arithmetic and assigns to the stored
    *    centroids (strict-max dot, ties to the lowest cell — the
    *    build's rule). NO re-clustering: moving a centroid would
    *    re-route OLD rows (a rebuild, not an append);
    *  - the CSR stays REAL: appended members land at the END of
    *    their cell's bracket (old members keep their relative order
    *    — the stable-CSR invariant compaction also preserves), which
    *    shifts every later slot by the cells-before insert count, so
    *    a touched shard's vectors rewrite through one scan-stage
    *    slot remap (narrow code-width rows, never raw vectors);
    *    UNTOUCHED shards copy as files, bytes identical;
    *  - pack row indices continue from the shard's old `n` in batch
    *    id order; meta rewrites `n` + `cell_start`; tombstones carry
    *    forward; the grown index publishes atomically at `outPath`
    *    (the source index is never mutated).
    *
    * Duplicate ids — within the batch or vs the store — and dim
    * mismatches refuse by name. A pre-`bit_cut` IVF+BQ layout
    * refuses by name with a NON-circular upgrade: the readers derive
    * the cut ([[graft.sources.Source.readIvfBqShardedIndex]]), so
    * read + re-persist once upgrades the layout. The result restores
    * through the standard readers and serves like any built index
    * (SinkSpec pins old-row byte identity, new-row re-encode
    * equality, CSR validity, self-hit of appended rows, and the
    * grown-corpus recall floor via `ann_ivfbq_append_gate`).
    */
  def appendIvfBqShardedIndex(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    import spark.implicits._
    import graft.operators.Similarity
    requireEmbColType(newRows, embCol)
    val manifest = spark.read.parquet(s"$indexPath/manifest").head()
    val numShards = manifest.getInt(manifest.fieldIndex("num_shards"))
    val totalN = manifest.getLong(manifest.fieldIndex("total_n"))
    val shardKey = manifest.getString(manifest.fieldIndex("shard_key"))
    require(shardKey == "xxhash64_pmod",
      s"cannot append to an index with shard key '$shardKey'")
    val hashModulus = manifest.getInt(manifest.fieldIndex("hash_modulus"))
    val hashVals = manifest.getSeq[Long](manifest.fieldIndex("shard_hash_vals"))
    val built = hashVals.zipWithIndex.toMap
    val dirOfHash: Map[Long, Long] = (0L until hashModulus.toLong)
      .map(h => h -> built.getOrElse(h, (h % numShards).toInt).toLong).toMap
    require(spark.read.parquet(s"$indexPath/shard_0000/meta")
      .schema.fieldNames.contains("bit_cut"),
      s"the IVF+BQ index at $indexPath predates the bit_cut meta column — " +
        "appends need the frozen integer threshold; read it once through " +
        "readIvfBqShardedIndex (which re-derives the cut) and re-persist " +
        "with writeIvfBqShardedIndex to upgrade the layout")
    final case class ShardMeta(
        n: Int, dim: Int, nWords: Int, nCells: Int,
        centroids: Array[Double], thresholds: Seq[Double],
        cellStart: Array[Int], dimMin: Array[Float],
        dimScale: Array[Float], bitCut: Array[Int])
    def metaOf(i: Int): ShardMeta = {
      val m = spark.read.parquet(f"$indexPath/shard_$i%04d/meta")
        .select("n", "dim", "n_words", "n_cells", "centroids", "thresholds",
          "cell_start", "dim_min", "dim_scale", "bit_cut").head()
      ShardMeta(m.getInt(0), m.getInt(1), m.getInt(2), m.getInt(3),
        m.getSeq[Double](4).toArray, m.getSeq[Double](5),
        m.getSeq[Int](6).toArray, m.getSeq[Float](7).toArray,
        m.getSeq[Float](8).toArray, m.getSeq[Int](9).toArray)
    }
    // independent per-shard meta reads fanned out per guide §2.6
    val metas: Map[Int, ShardMeta] =
      Par.shards(0 until numShards)(i => i -> metaOf(i)).toMap
    val m0 = metas(0)
    val dim = m0.dim
    val nWords = m0.nWords
    metas.foreach { case (i, m) =>
      require(m.dim == dim && m.nWords == nWords &&
          m.bitCut.sameElements(m0.bitCut) && m.thresholds == m0.thresholds &&
          m.dimMin.sameElements(m0.dimMin) && m.dimScale.sameElements(m0.dimScale),
        s"shard $i cuts on a different grid/threshold than shard 0 — corrupt index")
    }

    val narrow = newRows.select(
      element_at(typedLit(dirOfHash),
        pmod(xxhash64(col(idCol).cast(LongType)), lit(hashModulus))
          .cast(LongType)).as("shard"),
      col(idCol).cast(LongType).as("id"),
      col(embCol).as("emb"))
    val dupIn = narrow.groupBy("id").count().filter(col("count") > 1)
      .limit(1).collect()
    require(dupIn.isEmpty,
      s"duplicate id in append batch: ${dupIn.headOption.map(_.getLong(0)).getOrElse(-1L)}")
    val storedIds = spark.read.parquet(
      (0 until numShards).map(i => f"$indexPath/shard_$i%04d/vectors"): _*)
      .select(col("id"))
    val clash = narrow.select("id").join(storedIds, Seq("id"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"id ${clash.headOption.map(_.getLong(0)).getOrElse(-1L)} already " +
        s"exists in the index at $indexPath")
    val newCounts: Map[Long, Long] = narrow.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newTotal = newCounts.values.sum
    (0 until numShards).foreach { i =>
      val grown = metas(i).n.toLong + newCounts.getOrElse(i.toLong, 0L)
      require(grown <= Int.MaxValue && grown * nWords <= Int.MaxValue &&
          grown * dim <= Int.MaxValue,
        s"shard $i would grow to $grown rows — one shard must fit an index")
    }

    val dd = dim
    val nW = nWords
    val sc = spark.sparkContext
    val bcG = sc.broadcast((m0.dimMin, m0.dimScale, m0.bitCut))
    val bcCells = sc.broadcast(
      metas.map { case (i, m) => i.toLong -> (m.centroids, m.nCells) })
    try {
      publishAtomically(spark, outPath, overwrite) { tmp =>
        Seq((numShards, totalN + newTotal, shardKey, hashModulus, hashVals))
          .toDF("num_shards", "total_n", "shard_key",
            "hash_modulus", "shard_hash_vals")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
        // scan-stage encode + frozen-cell assignment: raw vectors
        // leave their executor as code-width rows
        val encoded = narrow.rdd.mapPartitions { it =>
          val (mn, scl, cut) = bcG.value
          val cells = bcCells.value
          it.map { row =>
            val sh = row.getLong(0)
            val v = embDoubles(row.getSeq[Any](2))
            if (v.length != dd) throw new IllegalArgumentException(
              s"Dimension mismatch: corpus rows have $dd and ${v.length} elements")
            val codes = new Array[Byte](dd)
            val sq = Similarity.sq8EncodeRow(v, 0, dd, mn, scl, codes, 0)
            val nrm = math.sqrt(sq)
            val words = new Array[Long](nW)
            var d = 0
            while (d < dd) {
              if ((codes(d) & 0xFF) >= cut(d)) words(d >>> 6) |= 1L << (d & 63)
              d += 1
            }
            // ivfBqFromSq8's decode + unit-normalize (zero-norm rows
            // stay zero) then the build's strict-max assignment
            val unit = new Array[Double](dd)
            if (nrm > 1e-10) {
              var d2 = 0
              while (d2 < dd) {
                unit(d2) = (mn(d2) + (codes(d2) & 0xFF) * scl(d2).toDouble) / nrm
                d2 += 1
              }
            }
            val (cents, k) = cells(sh)
            val cell = Similarity.assignCell(unit, 0, cents, k, dd)
            Row(sh, row.getLong(1), cell, words, codes, nrm, sq)
          }
        }
        val encSchema = StructType(Seq(
          StructField("shard", LongType, nullable = false),
          StructField("id", LongType, nullable = false),
          StructField("cell", IntegerType, nullable = false),
          StructField("words", ArrayType(LongType, containsNull = false),
            nullable = false),
          StructField("code", BinaryType, nullable = false),
          StructField("norm", DoubleType, nullable = false),
          StructField("sq_norm", DoubleType, nullable = false)))
        spark.createDataFrame(encoded, encSchema)
          .withColumn("shard_out", col("shard").cast(IntegerType))
          .write.partitionBy("shard_out").mode(SaveMode.ErrorIfExists)
          .parquet(s"$tmp/__append__")
        val conf = sc.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
        val vecCols = Seq("slot", "row", "id", "words", "code", "norm", "sq_norm")
        val vecSchema = StructType(Seq(
          StructField("slot", IntegerType, nullable = false),
          StructField("row", IntegerType, nullable = false),
          StructField("id", LongType, nullable = false),
          StructField("words", ArrayType(LongType, containsNull = false),
            nullable = false),
          StructField("code", BinaryType, nullable = false),
          StructField("norm", DoubleType, nullable = false),
          StructField("sq_norm", DoubleType, nullable = false)))
        // per-shard remap/copy/meta tails are independent — guide §2.6
        Par.shards(0 until numShards) { i =>
          val m = metas(i)
          val shardDir = f"$tmp/shard_$i%04d"
          val part = new org.apache.hadoop.fs.Path(s"$tmp/__append__/shard_out=$i")
          val nNew = newCounts.getOrElse(i.toLong, 0L).toInt
          if (nNew == 0) {
            // untouched shard: bytes stay bytes
            require(fs.mkdirs(new org.apache.hadoop.fs.Path(shardDir)),
              s"could not create $shardDir")
            Seq("vectors", "meta").foreach { d =>
              val src = new org.apache.hadoop.fs.Path(f"$indexPath/shard_$i%04d/$d")
              require(org.apache.hadoop.fs.FileUtil.copy(
                src.getFileSystem(conf), src, fs,
                new org.apache.hadoop.fs.Path(s"$shardDir/$d"), false, conf),
                s"could not copy $src into $shardDir")
            }
          } else {
            require(fs.exists(part),
              s"encode pass produced no partition for shard $i at $part")
            val batch = spark.read.parquet(part.toString)
            // per-cell insert counts (≤ nCells rows to the driver)
            val ins = new Array[Int](m.nCells)
            batch.groupBy("cell").count().collect()
              .foreach(r => ins(r.getInt(0)) = r.getLong(1).toInt)
            val cumIns = new Array[Int](m.nCells + 1)
            var c = 0
            while (c < m.nCells) { cumIns(c + 1) = cumIns(c) + ins(c); c += 1 }
            val newStart = new Array[Int](m.nCells + 1)
            var c2 = 0
            while (c2 <= m.nCells) {
              newStart(c2) = m.cellStart(c2) + cumIns(c2); c2 += 1
            }
            // old members: slot shifts by the inserts into cells
            // BEFORE theirs; row/id/bits/codes/norms byte-identical
            val bcRemap = sc.broadcast((m.cellStart, cumIns))
            try {
              val oldRdd = spark.read
                .parquet(f"$indexPath/shard_$i%04d/vectors")
                .select(vecCols.map(col): _*).rdd.mapPartitions { it =>
                  val (ost, cum) = bcRemap.value
                  it.map { r =>
                    val p = r.getInt(0)
                    // bracket search: largest c with ost(c) <= p
                    var lo = 0; var hi = ost.length - 1
                    while (hi - lo > 1) {
                      val mid = (lo + hi) >>> 1
                      if (ost(mid) <= p) lo = mid else hi = mid
                    }
                    Row(p + cum(lo), r.getInt(1), r.getLong(2),
                      r.getSeq[Long](3), r.get(4), r.getDouble(5),
                      r.getDouble(6))
                  }
                }
              val remappedOld = spark.createDataFrame(oldRdd, vecSchema)
              // new members: row continues from old n in batch id
              // order; slot lands at the END of the cell's new bracket
              val endPlusCum: Map[Int, Int] = (0 until m.nCells)
                .map(cc => cc -> (m.cellStart(cc + 1) + cumIns(cc))).toMap
              val wCell = Window.partitionBy("cell").orderBy("id")
              // dense corpus row numbers via a distributed sort +
              // zipWithIndex (the flat appends' idiom) — the previous
              // global-orderBy window funneled the whole batch
              // through one task (guide §2); ids are unique (enforced
              // above) so the range sort is a total, deterministic
              // order
              val slotted = batch
                .withColumn("slot",
                  (element_at(typedLit(endPlusCum), col("cell")) +
                    row_number().over(wCell) - 1).cast(IntegerType))
                .select(col("slot"), col("id"), col("words"), col("code"),
                  col("norm"), col("sq_norm"))
                .orderBy("id")
              val baseN = m.n
              val newRdd = slotted.rdd.zipWithIndex.map { case (r, j) =>
                Row(r.getInt(0), (baseN + j).toInt, r.getLong(1),
                  r.getSeq[Long](2), r.get(3), r.getDouble(4), r.getDouble(5))
              }
              val newMembers = spark.createDataFrame(newRdd, vecSchema)
              remappedOld.unionAll(newMembers)
                .write.mode(SaveMode.ErrorIfExists).parquet(s"$shardDir/vectors")
            } finally bcRemap.destroy()
            Seq(((m.n + nNew), dim, nWords, m.nCells, m.centroids.toSeq,
                m.thresholds, newStart.toSeq, m.dimMin.toSeq,
                m.dimScale.toSeq, m.bitCut.toSeq))
              .toDF("n", "dim", "n_words", "n_cells", "centroids",
                "thresholds", "cell_start", "dim_min", "dim_scale", "bit_cut")
              .write.mode(SaveMode.ErrorIfExists).parquet(s"$shardDir/meta")
          }
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/__append__"), true)
        // carry tombstones forward (re-adding a tombstoned id is
        // refused by the stored-id clash above — compact to free it)
        val oldTs = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
        if (oldTs.getFileSystem(conf).exists(oldTs))
          require(org.apache.hadoop.fs.FileUtil.copy(
            oldTs.getFileSystem(conf), oldTs, fs,
            new org.apache.hadoop.fs.Path(s"$tmp/tombstones"), false, conf),
            s"could not carry $oldTs forward")
      }
    } finally { bcG.destroy(); bcCells.destroy() }
  }

  /** TOMBSTONE delete from a persisted sharded IVF+BQ index — the
    * [[deleteFromBqShardedIndex]] contracts verbatim (a delete never
    * touches the CSR — it is metadata-only; serving deny-masks the
    * probed-cell scan via [[graft.operators.Similarity
    * .topkIvfBqShardedTombstoned]] / the wave serves' `deniedIds`).
    */
  def deleteFromIvfBqShardedIndex(
      spark: SparkSession,
      deleteIds: DataFrame,
      idCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit =
    deleteFromShardedIndexCore(spark, deleteIds, idCol, indexPath, outPath,
      overwrite)

  /** Compact a tombstoned sharded IVF+BQ index: driver-side array
    * surgery per broadcast-sized shard ([[graft.operators.Similarity
    * .compactIvfBq]] — kept rows keep their order, the CSR regroups
    * stably, bit rows copy from their old slots, the frozen
    * thresholds/grid never move), then one atomic re-publish with NO
    * tombstone set. Serving the compacted index is bit-identical to
    * the deny-masked serve of the input (SinkSpec pins it).
    */
  def compactIvfBqShardedIndex(
      spark: SparkSession,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tsPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    require(tsPath.getFileSystem(conf).exists(tsPath),
      s"no tombstones at $indexPath — nothing to compact")
    val (shards, ts) = graft.sources.Source
      .readIvfBqShardedIndexWithTombstones(spark, indexPath)
    val sorted = java.util.Arrays.copyOf(ts, ts.length)
    java.util.Arrays.sort(sorted)
    val manifest = spark.read.parquet(s"$indexPath/manifest").head()
    val compacted = shards.map(sx =>
      graft.operators.Similarity.compactIvfBq(sx, sorted))
    publishAtomically(spark, outPath, overwrite) { tmp =>
      import spark.implicits._
      Seq((compacted.size, compacted.map(_.n.toLong).sum, "xxhash64_pmod",
          manifest.getInt(manifest.fieldIndex("hash_modulus")),
          manifest.getSeq[Long](manifest.fieldIndex("shard_hash_vals"))))
        .toDF("num_shards", "total_n", "shard_key",
          "hash_modulus", "shard_hash_vals")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
      Par.shards(compacted.zipWithIndex) { case (sx, i) =>
        writeIvfBqInto(spark, sx, f"$tmp/shard_$i%04d")
      }
    }
  }

  /** Persist a trained PCA model — the pretransform's train-once
    * artifact (same story as the SQ8/PQ codebooks: the distributed
    * moments pass + eigensolve is the expensive step, and two trains
    * agree only to floating-point reduction order, so a pipeline that
    * wants bit-stable projections across sessions/layouts MUST
    * restore rather than retrain). The model is tiny (k×dim doubles),
    * so the layout is a single meta row.
    * [[graft.sources.Source.readPcaModel]] restores it
    * byte-identically (round-trip + identical-projection pinned in
    * SinkSpec).
    */
  def writePcaModel(
      spark: org.apache.spark.sql.SparkSession,
      m: graft.operators.Ann.PcaModel,
      path: String,
      overwrite: Boolean = false): Unit =
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      Seq((m.dim, m.k, m.n, m.mean.toSeq, m.basis.toSeq,
          m.eigenvalues.toSeq, m.totalVariance, m.varianceCaptured))
        .toDF("dim", "k", "n", "mean", "basis",
          "eigenvalues", "total_variance", "variance_captured")
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
      overwrite: Boolean = false,
      hashModulus: Int = 0,
      shardHashVals: Seq[Long] = Nil): Unit = {
    require(shards.nonEmpty, "Empty shard list")
    // The manifest records the BUILD's hash modulus (`hash_modulus`)
    // and each directory's raw hash value (`shard_hash_vals`), so an
    // append can route new ids with the original `pmod(xxhash64(id),
    // hash_modulus)` split even after empty hash shards were
    // compacted away — without these the original modulus is lost
    // forever (round-10 ADVICE). Callers that built with no dropped
    // shards (the non-degenerate case) can omit both: the defaults
    // record the identity layout.
    val modulus = if (hashModulus > 0) hashModulus else shards.size
    if (hashModulus <= 0)
      // the identity default is only correct when NO hash shard was
      // compacted away during the build — a collect build that dropped
      // empties would persist a confidently wrong routing identity
      // here, so prefer the ShardedIvfPqBuild overload, which carries
      // the build's real layout (round-11 advisor)
      log.warn(s"writeIvfPqShardedIndex: recording the IDENTITY routing layout " +
        s"(hash_modulus=${shards.size}) — if this build compacted empty hash " +
        "shards, appends will mis-route; pass the build's ShardedIvfPqBuild " +
        "or explicit hashModulus/shardHashVals")
    val hashVals =
      if (shardHashVals.nonEmpty) shardHashVals else shards.indices.map(_.toLong)
    require(hashVals.size == shards.size,
      s"shardHashVals has ${hashVals.size} entries for ${shards.size} shards")
    require(modulus >= shards.size,
      s"hash_modulus $modulus < ${shards.size} shard directories")
    publishAtomically(spark, path, overwrite) { tmp =>
      writeIvfPqShardedInto(spark, shards, tmp, modulus, hashVals)
    }
  }

  /** The sharded layout body (manifest + shard dirs) written into an
    * already-owned tmp dir — shared by the plain persist and the
    * IVF+OPQ persist (which adds `rot/` beside it inside ONE atomic
    * publish).
    */
  private def writeIvfPqShardedInto(
      spark: SparkSession,
      shards: Seq[graft.operators.Similarity.CorpusIndexIvfPq],
      tmp: String,
      modulus: Int,
      hashVals: Seq[Long]): Unit = {
    import spark.implicits._
    Seq((shards.size, shards.map(_.n.toLong).sum, "xxhash64_pmod",
        modulus, hashVals))
      .toDF("num_shards", "total_n", "shard_key",
        "hash_modulus", "shard_hash_vals")
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
    Par.shards(shards.zipWithIndex) { case (ix, i) =>
      writeIvfPqInto(spark, ix, f"$tmp/shard_$i%04d")
    }
  }

  /** Persist a sharded IVF+OPQ build — the rotation (`rot/`, one meta
    * row) beside the standard sharded layout, ONE atomic publish. The
    * plain [[graft.sources.Source.readIvfPqShardedIndex]] REFUSES an
    * index with a rotation (a rotation-unaware serve would silently
    * return wrong neighbors — scores computed in unrotated space
    * against rotated codebooks); read through
    * [[graft.sources.Source.readIvfOpqShardedIndex]] and serve with
    * [[graft.operators.Similarity.topkIvfOpqSharded]].
    */
  def writeIvfOpqShardedIndex(
      spark: SparkSession,
      build: graft.operators.Similarity.ShardedIvfOpqBuild,
      path: String,
      overwrite: Boolean = false): Unit = {
    require(build.shards.nonEmpty, "Empty shard list")
    publishAtomically(spark, path, overwrite) { tmp =>
      import spark.implicits._
      Seq((build.shards.head.dim, build.rot.toSeq)).toDF("dim", "rot")
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/rot")
      writeIvfPqShardedInto(spark, build.shards, tmp,
        build.build.hashModulus, build.build.shardHashVals)
    }
  }

  /** [[writeIvfPqShardedIndex]] taking the build WITH its routing
    * identity — the non-footgun persist for
    * [[graft.operators.Similarity.buildIvfPqShardedWithLayout]]: the
    * manifest records the modulus the build actually split on and the
    * hash value each surviving directory holds, so appends route
    * correctly even when the build compacted empty hash shards away.
    */
  def writeIvfPqShardedIndex(
      spark: org.apache.spark.sql.SparkSession,
      build: graft.operators.Similarity.ShardedIvfPqBuild,
      path: String,
      overwrite: Boolean): Unit =
    writeIvfPqShardedIndex(spark, build.shards, path, overwrite,
      build.hashModulus, build.shardHashVals)

  /** Per-shard trained model the distributed builder broadcasts to
    * its bounds/encode passes: the sample-trained coarse centroids +
    * residual-PQ codebooks, plus the corpus-wide residual SQ8 bounds
    * (null until pass D fills them / `withRerank = false`). `kPq` is
    * the number of TRAINED codebook entries (`min(256, build n)`) —
    * encode must never consider untrained (all-zero) entries, and
    * after an append `n` grows past the build count, so the trained
    * count rides the model (and the appended meta's `k_pq` column)
    * instead of being re-derived from `n`.
    */
  private final case class IvfPqShardModel(
      n: Int, k: Int, kPq: Int, centroids: Array[Double], codebooks: Array[Float],
      sq8Min: Array[Float], sq8Scale: Array[Float])

  /** Schema contract mirror of `Similarity.collectCorpusOpt`: only
    * `array<float>`/`array<double>` embedding columns — the
    * distributed builder and the append path must refuse exactly what
    * the collect-based build refuses (an `array<int>` column would
    * otherwise silently widen through [[embDoubles]]'s Number case, a
    * parity deviation from the byte-identical contract).
    */
  private def requireEmbColType(df: DataFrame, embCol: String): Unit =
    df.schema(embCol).dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
      case dt => throw new IllegalArgumentException(
        s"Corpus column $embCol must be array<float>/array<double>, got ${dt.simpleString}")
    }

  /** Element conversion mirror of `Similarity.collectCorpusOpt` — the
    * distributed builder must see the SAME doubles the driver path
    * packs, including the f32→f64 widening of `array<float>` corpora.
    */
  private[graft] def embDoubles(emb: Seq[Any]): Array[Double] = {
    val out = new Array[Double](emb.length)
    var d = 0
    val it = emb.iterator
    while (d < out.length) {
      out(d) = it.next() match {
        case f: java.lang.Float => f.toDouble
        case x: java.lang.Double => x.doubleValue
        case x: Number => x.doubleValue
      }
      d += 1
    }
    out
  }

  /** Unit-normalize (zero-norm rows stay zero) — the same
    * d-ascending square accumulation `collectCorpusOpt` +
    * `quantizeIvfPq` run, so executor-side units are bit-identical
    * to the driver pack's.
    */
  private[graft] def unitVec(v: Array[Double]): Array[Double] = {
    var sq = 0.0; var d = 0
    while (d < v.length) { sq += v(d) * v(d); d += 1 }
    val nrm = math.sqrt(sq)
    val u = new Array[Double](v.length)
    if (nrm > 1e-10) { var d2 = 0; while (d2 < v.length) { u(d2) = v(d2) / nrm; d2 += 1 } }
    u
  }

  /** Build AND persist a sharded IVF+PQ index WITHOUT ever collecting
    * the corpus — the 100 TB build path.
    * [[graft.operators.Similarity.buildIvfPqSharded]] still funnels
    * every raw vector through the driver (one collect per shard:
    * fine at 10M×256 ≈ 20 GB of f64 through one JVM, impossible at
    * corpus scale). This builder keeps the driver sample-bounded:
    *
    *  1. per-shard counts (narrow agg: 8-byte ids + shard key);
    *  2. the SAME strided sample positions `quantizeIvfPq`/
    *     `quantizePq` use, resolved to ids by a narrow `row_number`
    *     window over (shard | id) — only ids ride that exchange;
    *  3. sample embeddings fetched by a broadcast semi-join and
    *     collected (≈ 2·trainSample rows per shard, the only raw
    *     vectors the driver ever holds); coarse centroids + residual
    *     codebooks train through the SHARED loops
    *     (`trainSphericalKmeans`/`trainPqSubspace` — bit-identical to
    *     the driver build by construction);
    *  4. residual SQ8 bounds via an executor-side min/max fold with
    *     the scalar comparison semantics of `quantizeSq8` (skips NaN
    *     exactly like the driver loop; min/max are order-independent,
    *     so the distributed fold equals the driver scan);
    *  5. one encode scan with the broadcast models — each row leaves
    *     the executor as (cell, m-byte PQ code, SQ8 sidecar), ~6×
    *     narrower than the raw vector — through ONE exchange
    *     (partition by shard, `row_number` by id assigns the dense
    *     pack `idx` the persisted format needs) and straight into the
    *     `writeIvfPqShardedIndex` layout inside a single atomic
    *     publish. Raw vectors never shuffle and never collect.
    *
    * The result restores through
    * [[graft.sources.Source.readIvfPqShardedIndex]] BYTE-IDENTICAL to
    * `writeIvfPqShardedIndex(buildIvfPqSharded(...))` (IvfPqSpec +
    * SinkSpec pin ids/codes/centroids/codebooks/cells/SQ8 equality),
    * because every arithmetic step runs the same factored code on the
    * same values in the same order. Ids must be unique (they key the
    * pack order, as in any index); ragged dims throw the kernel's
    * "Dimension mismatch". Same shard split (`xxhash64(id) mod
    * numShards`), same skip-empty-shards compaction, same floors.
    */
  def writeIvfPqShardedIndexDistributed(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numShards: Int,
      nCells: Int,
      m: Int,
      path: String,
      trainSample: Int = 16384,
      iters: Int = 10,
      withRerank: Boolean = true,
      overwrite: Boolean = false,
      rot: Array[Double] = null): Unit = {
    import graft.operators.Similarity
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    require(trainSample >= 256, s"trainSample must be >= 256, got $trainSample")
    // same input contract as the collect-based build (collectCorpusOpt
    // rejects non-float embedding columns; byte parity demands the
    // distributed path refuse the same inputs — round-10 ADVICE)
    requireEmbColType(corpus, embCol)
    val sc = spark.sparkContext
    val shardCol =
      pmod(xxhash64(col(idCol).cast(LongType)), lit(numShards)).cast(LongType)
    val narrow = corpus.select(shardCol.as("shard"), col(idCol).cast(LongType).as("id"))

    // pass 1: ONE (shard, id) aggregation serves both the dup-id
    // refusal and the per-shard counts — ids key the pack order
    // (row_number over id) and the sample map silently dedups, so
    // duplicates would corrupt the pack with no error; a separate
    // groupBy(id) job cost the round-11 gate ~1.3 s (verdict #4), and
    // equal ids land in the same shard, so per-(shard,id) counts see
    // every duplicate. Cached because two actions read it; narrow
    // rows (two longs + a count), spills to disk if a 100 TB corpus'
    // distinct ids outgrow memory.
    val perId = narrow.groupBy("shard", "id").count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts: Map[Long, Long] =
      try {
        val dupId = perId.filter(col("count") > 1).limit(1).collect()
        require(dupId.isEmpty,
          s"duplicate id in corpus: ${dupId.headOption.map(_.getLong(1)).getOrElse(-1L)}")
        perId.groupBy("shard").agg(sum("count").as("count"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally { perId.unpersist(); () }
    require(counts.nonEmpty, "Empty corpus")
    counts.foreach { case (s, c) => require(c <= Int.MaxValue,
      s"shard $s holds $c rows — one shard must fit an index; raise numShards") }
    // non-empty shards in ascending hash order = buildIvfPqSharded's
    // b-ascending loop with empties flattened out
    val shardVals: Seq[Long] = counts.keys.toSeq.sorted
    val kOf = shardVals.map(s => s -> math.min(nCells, counts(s).toInt)).toMap
    val step1 = shardVals.map(s =>
      s -> math.max(1, counts(s).toInt / math.max(trainSample, kOf(s)))).toMap
    val step2 = shardVals.map(s =>
      s -> math.max(1, counts(s).toInt / trainSample)).toMap

    // pass 2: strided sample positions → ids (narrow window; the
    // union of the coarse and PQ sample sets resolves in one pass)
    val wPos = Window.partitionBy("shard").orderBy("id")
    val s1Col = element_at(
      typedLit(step1.map { case (s, v) => s -> v.toLong }), col("shard"))
    val s2Col = element_at(
      typedLit(step2.map { case (s, v) => s -> v.toLong }), col("shard"))
    val sampled = narrow
      .withColumn("pos", row_number().over(wPos).cast(LongType) - 1)
      .filter(col("pos") % s1Col === 0 || col("pos") % s2Col === 0)
      .select("shard", "pos", "id").collect()
    val posBySh = sampled.groupBy(_.getLong(0))
    def sampleIds(s: Long, step: Int): Array[Long] =
      posBySh(s).filter(_.getLong(1) % step == 0).sortBy(_.getLong(1)).map(_.getLong(2))

    // pass 3: fetch ONLY the sampled embeddings (broadcast semi-join)
    import spark.implicits._
    val idsDf = sampled.map(_.getLong(2)).distinct.toSeq.toDF("id")
    val fetched = corpus
      .select(col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
      .join(broadcast(idsDf), "id").collect()
    val embOfRaw: Map[Long, Array[Double]] =
      fetched.map(r => r.getLong(0) -> embDoubles(r.getSeq[Any](1))).toMap
    val dim = embOfRaw.head._2.length
    embOfRaw.valuesIterator.foreach(v => require(v.length == dim,
      s"Dimension mismatch: corpus rows have $dim and ${v.length} elements"))
    require(m >= 1 && m <= dim && dim % m == 0, s"m must divide dim: dim=$dim, m=$m")
    require(rot == null || rot.length == dim.toLong * dim,
      s"rotation must be $dim×$dim, got ${if (rot == null) 0 else rot.length} values")
    // a non-null rot is the IVF+OPQ composition: every vector rotates
    // BEFORE unit-normalization/assignment/encoding — the same
    // rotate-then-build order as the collect path's rotateIndex, via
    // the shared per-row helper so the arithmetic is bit-identical
    val embOf: Map[Long, Array[Double]] =
      if (rot == null) embOfRaw
      else embOfRaw.map { case (id, v) =>
        val out = new Array[Double](dim)
        Similarity.rotateRow(rot, v, 0, dim, out, 0)
        id -> out
      }
    val sub = dim / m

    // train per shard on the driver — sample-bounded work, through the
    // SAME loops the collect-based build runs. Shard trainings are
    // independent pure computations over the shared read-only sample
    // map, so they fan out like the collect build's concurrent shard
    // builds (round-9 verdict #1; per-shard results are bit-identical
    // regardless of scheduling)
    val models: Map[Long, IvfPqShardModel] = Par.shards(shardVals) { s =>
      val n = counts(s).toInt
      val k = kOf(s)
      val ids1 = sampleIds(s, step1(s)); val sn1 = ids1.length
      val samp = new Array[Double](sn1 * dim)
      var i = 0
      while (i < sn1) {
        System.arraycopy(unitVec(embOf(ids1(i))), 0, samp, i * dim, dim); i += 1
      }
      val centroids = Similarity.trainSphericalKmeans(samp, sn1, dim, k, iters)
      val ids2 = sampleIds(s, step2(s)); val sn2 = ids2.length
      val resS = new Array[Double](sn2 * dim)
      var i2 = 0
      while (i2 < sn2) {
        val u = unitVec(embOf(ids2(i2)))
        val cell = Similarity.assignCell(u, 0, centroids, k, dim)
        var d = 0
        while (d < dim) { resS(i2 * dim + d) = u(d) - centroids(cell * dim + d); d += 1 }
        i2 += 1
      }
      val kPq = math.min(256, n)
      val codebooks = new Array[Float](m * 256 * sub)
      var j = 0
      while (j < m) {
        val pts = new Array[Double](sn2 * sub)
        var s2 = 0
        while (s2 < sn2) {
          var d = 0
          while (d < sub) { pts(s2 * sub + d) = resS(s2 * dim + j * sub + d); d += 1 }
          s2 += 1
        }
        val cent = Similarity.trainPqSubspace(pts, sn2, sub, kPq, iters)
        var c = 0
        while (c < kPq) {
          var d = 0
          while (d < sub) {
            codebooks((j * 256 + c) * sub + d) = cent(c * sub + d).toFloat; d += 1
          }
          c += 1
        }
        j += 1
      }
      s -> IvfPqShardModel(n, k, kPq, centroids, codebooks, null, null)
    }.toMap

    val withShard = corpus.select(shardCol.as("shard"),
      col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
    val dd = dim

    // pass 4: corpus-wide residual SQ8 bounds (executor fold with the
    // quantizeSq8 comparison semantics — order-independent, so the
    // distributed fold equals the driver scan bit for bit)
    val finalModels: Map[Long, IvfPqShardModel] =
      if (!withRerank) models
      else {
        val bcM = sc.broadcast(models)
        val bcRotB = if (rot == null) null else sc.broadcast(rot)
        try {
          val partials = withShard.select("shard", "emb").rdd.mapPartitions { it =>
            val ms = bcM.value
            val rm = if (bcRotB == null) null else bcRotB.value
            val acc = scala.collection.mutable.Map.empty[Long, (Array[Double], Array[Double])]
            it.foreach { row =>
              val sh = row.getLong(0)
              val mdl = ms(sh)
              val vRaw = embDoubles(row.getSeq[Any](1))
              if (vRaw.length != dd) throw new IllegalArgumentException(
                s"Dimension mismatch: corpus rows have $dd and ${vRaw.length} elements")
              val v =
                if (rm == null) vRaw
                else {
                  val out = new Array[Double](dd)
                  graft.operators.Similarity.rotateRow(rm, vRaw, 0, dd, out, 0)
                  out
                }
              val u = unitVec(v)
              val cell = graft.operators.Similarity.assignCell(u, 0, mdl.centroids, mdl.k, dd)
              val (mn, mx) = acc.getOrElseUpdate(sh,
                (Array.fill(dd)(Double.MaxValue), Array.fill(dd)(Double.MinValue)))
              var d = 0
              while (d < dd) {
                val r = u(d) - mdl.centroids(cell * dd + d)
                if (r < mn(d)) mn(d) = r
                if (r > mx(d)) mx(d) = r
                d += 1
              }
            }
            Iterator.single(acc)
          }.reduce { (a, b) =>
            b.foreach { case (sh, (bmn, bmx)) =>
              a.get(sh) match {
                case Some((amn, amx)) =>
                  var d = 0
                  while (d < dd) {
                    if (bmn(d) < amn(d)) amn(d) = bmn(d)
                    if (bmx(d) > amx(d)) amx(d) = bmx(d)
                    d += 1
                  }
                case None => a(sh) = (bmn, bmx)
              }
            }
            a
          }
          models.map { case (s, mdl) =>
            val (mn, mx) = partials(s)
            val dimMin = new Array[Float](dd)
            val dimScale = new Array[Float](dd)
            var d = 0
            while (d < dd) {
              dimMin(d) = mn(d).toFloat
              dimScale(d) = if (mx(d) > mn(d)) ((mx(d) - mn(d)) / 255.0).toFloat else 0.0f
              d += 1
            }
            s -> mdl.copy(sq8Min = dimMin, sq8Scale = dimScale)
          }
        } finally { bcM.destroy(); if (bcRotB != null) bcRotB.destroy() }
      }

    // pass 5: encode scan-stage, number by (shard | id) through the
    // one code-width exchange, land in the persisted layout
    val bcF = sc.broadcast(finalModels)
    val bcRotE = if (rot == null) null else sc.broadcast(rot)
    try {
      val shardOut: Map[Long, Int] = shardVals.zipWithIndex.toMap
      publishAtomically(spark, path, overwrite) { tmp =>
        import spark.implicits._
        // the rotation rides the index (the writeIvfOpqShardedIndex
        // layout) so the plain reader refuses and the OPQ reader +
        // append path restore it
        if (rot != null)
          Seq((dd, rot.toSeq)).toDF("dim", "rot")
            .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/rot")
        Seq((shardVals.size, counts.values.sum, "xxhash64_pmod",
            numShards, shardVals))
          .toDF("num_shards", "total_n", "shard_key",
            "hash_modulus", "shard_hash_vals")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
        val encoded = encodeWithModels(withShard, bcF, dd, m, sub, withRerank,
          bcRotE)
        val wIdx = Window.partitionBy("shard").orderBy("id")
        spark.createDataFrame(encoded, ivfPqEncSchema)
          .withColumn("idx", (row_number().over(wIdx) - 1).cast(IntegerType))
          .withColumn("shard_out", element_at(typedLit(shardOut), col("shard")))
          .select("shard_out", "idx", "id", "code", "cell",
            "sq8_code", "sq8_norm", "sq8_sq_norm")
          .write.partitionBy("shard_out").mode(SaveMode.ErrorIfExists)
          .parquet(s"$tmp/__vectors__")
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        Par.shards(shardVals.zipWithIndex) { case (s, i) =>
          val mdl = finalModels(s)
          val shardDir = new org.apache.hadoop.fs.Path(f"$tmp/shard_$i%04d")
          require(fs.mkdirs(shardDir), s"could not create $shardDir")
          val src = new org.apache.hadoop.fs.Path(s"$tmp/__vectors__/shard_out=$i")
          require(fs.exists(src),
            s"encode pass produced no partition for shard $s at $src")
          require(fs.rename(src, new org.apache.hadoop.fs.Path(shardDir, "vectors")),
            s"could not move $src into $shardDir")
          Seq((mdl.n, dd, m, mdl.k,
              mdl.centroids.toSeq, mdl.codebooks.toSeq,
              Option(mdl.sq8Min).map(_.toSeq), Option(mdl.sq8Scale).map(_.toSeq)))
            .toDF("n", "dim", "m", "n_cells", "centroids", "codebooks",
              "sq8_dim_min", "sq8_dim_scale")
            .write.mode(SaveMode.ErrorIfExists).parquet(s"$shardDir/meta")
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/__vectors__"), true)
      }
    } finally { bcF.destroy(); if (bcRotE != null) bcRotE.destroy() }
  }

  /** [[writeIvfPqShardedIndexDistributed]] with an OPQ rotation in
    * front — the 100 TB IVF+OPQ build: train R once on the
    * hash-sampled subset (the SAME sample + training loop the
    * collect-based [[graft.operators.Similarity
    * .buildIvfOpqShardedWithLayout]] uses, so the two builders'
    * rotations — and therefore their entire indexes — are
    * bit-identical), then the standard distributed build with every
    * vector rotated scan-stage before unit-normalization/assignment/
    * encoding. Raw vectors still never collect and never shuffle;
    * the rotation itself persists under `rot/` so the plain reader
    * refuses and [[graft.sources.Source.readIvfOpqShardedIndex]]
    * restores the serve pair.
    */
  def writeIvfOpqShardedIndexDistributed(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numShards: Int,
      nCells: Int,
      m: Int,
      path: String,
      trainSample: Int = 16384,
      iters: Int = 10,
      opqIters: Int = 8,
      withRerank: Boolean = true,
      overwrite: Boolean = false): Unit = {
    import graft.operators.Similarity
    require(opqIters >= 1, s"opqIters must be >= 1, got $opqIters")
    require(trainSample >= 256, s"trainSample must be >= 256, got $trainSample")
    val totalN = corpus.count()
    require(totalN > 0L, "Empty corpus")
    val rot = Similarity.trainOpqRotation(
      Similarity.opqRotationSample(corpus, idCol, embCol, trainSample, totalN),
      m, trainSample, opqIters)
    writeIvfPqShardedIndexDistributed(spark, corpus, idCol, embCol,
      numShards, nCells, m, path, trainSample, iters, withRerank,
      overwrite, rot)
  }

  /** Row shape the scan-stage IVF+PQ encode emits: the shard routing
    * key, the row id, and the ~6×-narrower encoded payload (m-byte PQ
    * code + cell + optional SQ8 sidecar) — shared by the distributed
    * builder's pass 5 and [[appendIvfPqShardedIndex]].
    */
  private val ivfPqEncSchema = StructType(Seq(
    StructField("shard", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("code", BinaryType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("sq8_code", BinaryType, nullable = true),
    StructField("sq8_norm", DoubleType, nullable = true),
    StructField("sq8_sq_norm", DoubleType, nullable = true)))

  /** The scan-stage encode of `(shard, id, emb)` rows against
    * broadcast per-shard models — unit-normalize, assign the coarse
    * cell, PQ-encode the residual over the TRAINED codebook entries
    * (`mdl.kPq`, never the untrained tail), SQ8-encode the sidecar
    * when the model carries bounds. The exact per-row arithmetic of
    * the driver build ([[graft.operators.Similarity.quantizeIvfPq]])
    * through the shared factored helpers, so every caller inherits
    * the byte-parity argument. Raw vectors enter, code-width rows
    * leave.
    */
  private def encodeWithModels(
      withShard: DataFrame,
      bcF: org.apache.spark.broadcast.Broadcast[Map[Long, IvfPqShardModel]],
      dd: Int, mm: Int, subb: Int, wr: Boolean,
      rotBc: org.apache.spark.broadcast.Broadcast[Array[Double]] = null)
      : org.apache.spark.rdd.RDD[Row] =
    withShard.rdd.mapPartitions { it =>
      val ms = bcF.value
      val rm = if (rotBc == null) null else rotBc.value
      it.map { row =>
        val sh = row.getLong(0); val id = row.getLong(1)
        val mdl = ms(sh)
        val vRaw = embDoubles(row.getSeq[Any](2))
        if (vRaw.length != dd) throw new IllegalArgumentException(
          s"Dimension mismatch: corpus rows have $dd and ${vRaw.length} elements")
        val v =
          if (rm == null) vRaw
          else {
            val out = new Array[Double](dd)
            graft.operators.Similarity.rotateRow(rm, vRaw, 0, dd, out, 0)
            out
          }
        val u = unitVec(v)
        val cell = graft.operators.Similarity.assignCell(u, 0, mdl.centroids, mdl.k, dd)
        val res = new Array[Double](dd)
        var d = 0
        while (d < dd) { res(d) = u(d) - mdl.centroids(cell * dd + d); d += 1 }
        val code = new Array[Byte](mm)
        graft.operators.Similarity.pqEncodeRow(
          res, 0, dd, mm, subb, mdl.kPq, mdl.codebooks, code, 0)
        if (wr) {
          val s8 = new Array[Byte](dd)
          val sq = graft.operators.Similarity.sq8EncodeRow(
            res, 0, dd, mdl.sq8Min, mdl.sq8Scale, s8, 0)
          Row(sh, id, code, cell, s8, math.sqrt(sq), sq)
        } else Row(sh, id, code, cell, null, null, null)
      }
    }

  /** Read one persisted shard's TRAINED MODEL (meta only — the
    * vectors never load): the append path needs centroids, codebooks,
    * SQ8 bounds, and the trained-codebook count, not the corpus.
    * `k_pq` is read by name when present (append-written metas carry
    * it); build-written metas lack the column, and there
    * `min(256, n)` IS the trained count because build-time `n` is the
    * training corpus size.
    */
  private def readShardModel(
      spark: org.apache.spark.sql.SparkSession,
      shardDir: String): IvfPqShardModel = {
    val metaDf = spark.read.parquet(s"$shardDir/meta")
    val hasKpq = metaDf.schema.fieldNames.contains("k_pq")
    val meta = metaDf.head()
    val n = meta.getAs[Int]("n")
    val kPq = if (hasKpq) meta.getAs[Int]("k_pq") else math.min(256, n)
    IvfPqShardModel(
      n,
      meta.getAs[Int]("n_cells"),
      kPq,
      meta.getAs[Seq[Double]]("centroids").toArray,
      meta.getAs[Seq[Float]]("codebooks").toArray,
      if (meta.isNullAt(meta.fieldIndex("sq8_dim_min"))) null
      else meta.getAs[Seq[Float]]("sq8_dim_min").toArray,
      if (meta.isNullAt(meta.fieldIndex("sq8_dim_scale"))) null
      else meta.getAs[Seq[Float]]("sq8_dim_scale").toArray)
  }

  /** APPEND new rows to a persisted sharded IVF+PQ index — the daily
    * ingest of a growing corpus: encode-only, NO retraining, no
    * raw-vector collect, and the source index is never mutated (the
    * grown index publishes atomically at `outPath`; readers of
    * `indexPath` are undisturbed, and a crash leaves no torn state
    * anywhere).
    *
    *  - New rows route to shard `pmod(xxhash64(id), num_shards)` —
    *    the build split's own key, so ingest stays balanced and
    *    deterministic. (If the ORIGINAL build compacted away empty
    *    hash shards the dir numbering shifted relative to raw hash
    *    values; routing correctness is unaffected — every query fans
    *    out to all shards, so ANY shard's codebooks can encode any
    *    row — only the exact build-time placement is not reproduced
    *    in that degenerate small-corpus case.)
    *  - Each row is encoded scan-stage with the destination shard's
    *    broadcast model through [[encodeWithModels]] — the same
    *    arithmetic the build ran, against the codebooks as trained
    *    (`k_pq`); residuals outside the frozen SQ8 grid clamp to the
    *    grid edge (rerank degrades gracefully for outliers instead
    *    of corrupting).
    *  - Old vectors are COPIED AS FILES (no decode/re-encode — the
    *    bytes are already right); new rows land as additional parquet
    *    files in each shard's `vectors/` with pack positions
    *    continuing from the old `n`. Meta is rewritten with the grown
    *    `n` and an explicit `k_pq` (appended LAST so the positional
    *    reader of build-written metas is untouched); the manifest's
    *    `total_n` grows to match.
    *
    * Duplicate ids — within `newRows` or against the stored index —
    * throw (ids key an index; silent duplicates would serve the same
    * row twice). Dimension mismatches throw the kernel's named error.
    * Shards that receive no new rows are copied unchanged. The result
    * reads back through
    * [[graft.sources.Source.readIvfPqShardedIndex]] and serves
    * through `topkIvfPqSharded` like any built index (SinkSpec pins
    * old-row byte identity, new-row encode correctness, and search
    * recall over the grown corpus).
    */
  def appendIvfPqShardedIndex(
      spark: org.apache.spark.sql.SparkSession,
      newRows: DataFrame,
      idCol: String,
      embCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    import spark.implicits._
    requireEmbColType(newRows, embCol)
    // an OPQ-rotated index appends fine — new rows must rotate with
    // the STORED R before encoding (frozen like the codebooks), and
    // the rotation is carried forward so the grown index serves
    // through the same OPQ reader
    val rotStored: Array[Double] =
      if (graft.sources.Source.hasOpqRotation(spark, indexPath))
        spark.read.parquet(s"$indexPath/rot").select("rot").head()
          .getSeq[Double](0).toArray
      else null
    val manifestDf = spark.read.parquet(s"$indexPath/manifest")
    val manifest = manifestDf.head()
    val numShards = manifest.getInt(manifest.fieldIndex("num_shards"))
    val totalN = manifest.getLong(manifest.fieldIndex("total_n"))
    val shardKey = manifest.getString(manifest.fieldIndex("shard_key"))
    require(shardKey == "xxhash64_pmod",
      s"cannot append to an index with shard key '$shardKey'")
    // The BUILD's hash modulus + the raw-hash value behind each shard
    // directory (present since round 11; older manifests fall back to
    // the compacted directory count — the pre-fix behavior). Appends
    // route with the ORIGINAL modulus, so new ids land under the same
    // split the build used even when empty hash shards were compacted
    // away; a hash value whose shard was dropped at build time (no
    // model exists for it) maps deterministically to directory
    // `hash mod num_dirs` — any shard's codebooks can encode any row,
    // so only that degenerate placement is approximate.
    val hasModulus = manifestDf.schema.fieldNames.contains("hash_modulus")
    val hashModulus =
      if (hasModulus) manifest.getInt(manifest.fieldIndex("hash_modulus"))
      else numShards
    val dirOfHash: Map[Long, Int] =
      if (hasModulus) {
        val vals = manifest.getSeq[Long](manifest.fieldIndex("shard_hash_vals"))
        val built = vals.zipWithIndex.toMap
        (0L until hashModulus.toLong)
          .map(h => h -> built.getOrElse(h, (h % numShards).toInt)).toMap
      } else (0L until hashModulus.toLong).map(h => h -> h.toInt).toMap
    // independent per-shard model reads fanned out per guide §2.6
    val models: Map[Long, IvfPqShardModel] = Par.shards(0 until numShards) { i =>
      i.toLong -> readShardModel(spark, f"$indexPath/shard_$i%04d")
    }.toMap
    // dim falls out of each shard's centroid block; m does not
    // (codebooks are always m·256·(dim/m) = 256·dim values), so m
    // comes from the first shard's meta — every writer of this layout
    // stamps one m across all shards
    val dd = models.values.head.centroids.length / models.values.head.k
    models.foreach { case (i, m) => require(m.centroids.length / m.k == dd,
      s"shard $i dim ${m.centroids.length / m.k} != $dd — corrupt index") }
    val mm = spark.read.parquet(f"$indexPath/shard_0000/meta")
      .select("m").head().getInt(0)
    val subb = dd / mm
    val withRerank = models.values.head.sq8Min != null
    require(models.values.forall(m => (m.sq8Min != null) == withRerank),
      "corrupt index: shards disagree on the SQ8 sidecar")

    val newNarrow = newRows.select(
      element_at(
        typedLit(dirOfHash.map { case (h, d) => h -> d.toLong }),
        pmod(xxhash64(col(idCol).cast(LongType)), lit(hashModulus)).cast(LongType))
        .as("shard"),
      col(idCol).cast(LongType).as("id"),
      col(embCol).as("emb"))

    // id hygiene: unique within the batch, disjoint from the index
    val dupIn = newNarrow.groupBy("id").count().filter(col("count") > 1).limit(1).collect()
    require(dupIn.isEmpty, s"duplicate id in append batch: ${dupIn.headOption.map(_.getLong(0)).getOrElse(-1L)}")
    val storedIds = spark.read.parquet(
      (0 until numShards).map(i => f"$indexPath/shard_$i%04d/vectors"): _*)
      .select(col("id"))
    val clash = newNarrow.select("id").join(storedIds, Seq("id"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"id ${clash.headOption.map(_.getLong(0)).getOrElse(-1L)} already exists in the index at $indexPath")

    val newCounts: Map[Long, Long] = newNarrow.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newTotal = newCounts.values.sum
    (0 until numShards).foreach { i =>
      val grown = models(i.toLong).n.toLong + newCounts.getOrElse(i.toLong, 0L)
      require(grown <= Int.MaxValue,
        s"shard $i would grow to $grown rows — one shard must fit an index")
    }

    val sc = spark.sparkContext
    val bcF = sc.broadcast(models)
    val bcRotA = if (rotStored == null) null else sc.broadcast(rotStored)
    try {
      publishAtomically(spark, outPath, overwrite) { tmp =>
        // carry the build's routing identity forward (old manifests
        // upgrade to the identity layout they in fact had)
        val hashVals: Seq[Long] =
          if (hasModulus) manifest.getSeq[Long](manifest.fieldIndex("shard_hash_vals"))
          else (0 until numShards).map(_.toLong)
        Seq((numShards, totalN + newTotal, shardKey, hashModulus, hashVals))
          .toDF("num_shards", "total_n", "shard_key",
            "hash_modulus", "shard_hash_vals")
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
        val encoded = encodeWithModels(newNarrow, bcF, dd, mm, subb, withRerank,
          bcRotA)
        val oldN: Map[Long, Int] = models.map { case (i, m) => i -> m.n }
        val wIdx = Window.partitionBy("shard").orderBy("id")
        val baseCol = element_at(
          typedLit(oldN.map { case (i, n) => i -> n.toLong }), col("shard"))
        spark.createDataFrame(encoded, ivfPqEncSchema)
          .withColumn("idx",
            (baseCol + row_number().over(wIdx) - 1).cast(IntegerType))
          .withColumn("shard_out", col("shard").cast(IntegerType))
          .select("shard_out", "idx", "id", "code", "cell",
            "sq8_code", "sq8_norm", "sq8_sq_norm")
          .write.partitionBy("shard_out").mode(SaveMode.ErrorIfExists)
          .parquet(s"$tmp/__append__")
        val conf = sc.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
        // per-shard copy/move/meta tails are independent — guide §2.6
        Par.shards(0 until numShards) { i =>
          val mdl = models(i.toLong)
          val shardDir = new org.apache.hadoop.fs.Path(f"$tmp/shard_$i%04d")
          require(fs.mkdirs(shardDir), s"could not create $shardDir")
          val oldVec = new org.apache.hadoop.fs.Path(f"$indexPath/shard_$i%04d/vectors")
          val dstVec = new org.apache.hadoop.fs.Path(shardDir, "vectors")
          require(org.apache.hadoop.fs.FileUtil.copy(
            oldVec.getFileSystem(conf), oldVec, fs, dstVec, false, conf),
            s"could not copy $oldVec into $shardDir")
          val part = new org.apache.hadoop.fs.Path(s"$tmp/__append__/shard_out=$i")
          if (fs.exists(part)) {
            fs.listStatus(part).foreach { st =>
              val nm = st.getPath.getName
              if (nm.startsWith("part-"))
                require(fs.rename(st.getPath,
                  new org.apache.hadoop.fs.Path(dstVec, s"append-$nm")),
                  s"could not move ${st.getPath} into $dstVec")
            }
          }
          Seq((mdl.n + newCounts.getOrElse(i.toLong, 0L).toInt, dd, mm, mdl.k,
              mdl.centroids.toSeq, mdl.codebooks.toSeq,
              Option(mdl.sq8Min).map(_.toSeq), Option(mdl.sq8Scale).map(_.toSeq),
              mdl.kPq))
            .toDF("n", "dim", "m", "n_cells", "centroids", "codebooks",
              "sq8_dim_min", "sq8_dim_scale", "k_pq")
            .write.mode(SaveMode.ErrorIfExists).parquet(s"$shardDir/meta")
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/__append__"), true)
        // carry tombstones forward: a delete-then-append index keeps
        // serving with the deleted rows masked (re-adding a
        // tombstoned id is refused by the stored-id clash above —
        // compact first to free the id)
        val oldTs = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
        if (oldTs.getFileSystem(conf).exists(oldTs))
          require(org.apache.hadoop.fs.FileUtil.copy(
            oldTs.getFileSystem(conf), oldTs, fs,
            new org.apache.hadoop.fs.Path(s"$tmp/tombstones"), false, conf),
            s"could not carry $oldTs forward")
        // carry the OPQ rotation forward: the grown index's geometry
        // IS the stored rotation's
        val oldRot = new org.apache.hadoop.fs.Path(s"$indexPath/rot")
        if (oldRot.getFileSystem(conf).exists(oldRot))
          require(org.apache.hadoop.fs.FileUtil.copy(
            oldRot.getFileSystem(conf), oldRot, fs,
            new org.apache.hadoop.fs.Path(s"$tmp/rot"), false, conf),
            s"could not carry $oldRot forward")
      }
    } finally { bcF.destroy(); if (bcRotA != null) bcRotA.destroy() }
  }

  /** TOMBSTONE delete from a persisted sharded IVF+PQ index — the
    * takedown/GDPR path that does NOT rebuild: the output index is a
    * file-level copy of the input (codes untouched, byte-identical)
    * plus the grown tombstone id set under `tombstones/`. Serving
    * applies the set as an always-on deny mask
    * ([[graft.operators.Similarity.topkIvfPqShardedTombstoned]] —
    * bit-identical results to the compacted index), and
    * [[compactIvfPqShardedIndex]] eventually rewrites the shards
    * dropping tombstoned rows so the masks retire.
    *
    * Contracts: every deleted id must be STORED in the index (a
    * takedown for a row that was never there is a caller bug, not a
    * no-op), and must not already be tombstoned (double-delete
    * refused — the caller's bookkeeping is broken if it deletes
    * twice). The plain [[graft.sources.Source.readIvfPqShardedIndex]]
    * REFUSES a tombstoned index so no reader can serve deleted rows
    * by accident; read through
    * [[graft.sources.Source.readIvfPqShardedIndexWithTombstones]].
    */
  def deleteFromIvfPqShardedIndex(
      spark: SparkSession,
      deleteIds: DataFrame,
      idCol: String,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    val manifest = spark.read.parquet(s"$indexPath/manifest").head()
    val numShards = manifest.getInt(manifest.fieldIndex("num_shards"))
    val del = deleteIds.select(col(idCol).cast(LongType).as("id"))
      .na.drop().distinct()
    val storedIds = spark.read.parquet(
      (0 until numShards).map(i => f"$indexPath/shard_$i%04d/vectors"): _*)
      .select(col("id"))
    val conf = spark.sparkContext.hadoopConfiguration
    val tsPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val hadTs = tsPath.getFileSystem(conf).exists(tsPath)
    val existing =
      if (hadTs) spark.read.parquet(tsPath.toString).select(col("id"))
      else spark.emptyDataFrame.select(lit(0L).as("id")).limit(0)
    // ONE validation job for all three refusal contracts (empty set /
    // unknown id / double delete) — they were three sequential
    // actions, each re-scanning the delete set; stored and tombstone
    // ids are unique by the index contract, so the left joins
    // preserve the delete-set cardinality exactly. That uniqueness is
    // VERIFIED, not assumed (round-16 advisor): `del` is distinct, so
    // any join-row multiplication (n > distinct n) can only come from
    // a duplicated stored/tombstone id — a corrupt index — and
    // refuses by name instead of silently passing the count checks.
    val chk = del
      .join(storedIds.withColumn("__stored", lit(1)), Seq("id"), "left")
      .join(existing.withColumn("__ts", lit(1)), Seq("id"), "left")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("nd"),
        min(when(col("__stored").isNull, col("id"))).as("unknown"),
        min(when(col("__ts").isNotNull, col("id"))).as("dbl"))
      .head()
    require(chk.getLong(0) > 0L, "empty delete set")
    require(chk.getLong(0) == chk.getLong(1),
      s"corrupt index at $indexPath: a stored or tombstone id is " +
        s"duplicated (delete validation saw ${chk.getLong(0)} rows for " +
        s"${chk.getLong(1)} distinct delete ids)")
    require(chk.isNullAt(2),
      s"cannot delete id ${chk.getLong(2)}: " +
        s"not stored in the index at $indexPath")
    require(chk.isNullAt(3),
      s"id ${chk.getLong(3)} is already " +
        "tombstoned (double delete)")
    publishAtomically(spark, outPath, overwrite) { tmp =>
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
      val rotDirs =
        if (graft.sources.Source.hasOpqRotation(spark, indexPath)) Seq("rot")
        else Seq.empty[String]
      Par.shards(Seq("manifest") ++ rotDirs ++
          (0 until numShards).map(i => f"shard_$i%04d")) { d =>
        val src = new org.apache.hadoop.fs.Path(s"$indexPath/$d")
        require(org.apache.hadoop.fs.FileUtil.copy(
          src.getFileSystem(conf), src, fs,
          new org.apache.hadoop.fs.Path(s"$tmp/$d"), false, conf),
          s"could not copy $src")
      }
      existing.unionAll(del).repartition(1)
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/tombstones")
    }
  }

  /** Compact a tombstoned sharded IVF+PQ index: rewrite each shard's
    * `vectors/` DROPPING tombstoned rows (pack positions renumbered
    * contiguously in original order — a pure permutation-free
    * deletion, trained models untouched), shrink each shard meta's
    * `n` and the manifest's `total_n` to the live population, and
    * emit NO tombstone set — the compacted index serves through the
    * plain reader with zero masks, and freed ids become appendable
    * again. Serving the compacted index is bit-identical to serving
    * the tombstoned input through
    * [[graft.operators.Similarity.topkIvfPqShardedTombstoned]]
    * (same geometry, same surviving candidates — SinkSpec pins it).
    */
  def compactIvfPqShardedIndex(
      spark: SparkSession,
      indexPath: String,
      outPath: String,
      overwrite: Boolean = false): Unit = {
    val manifestDf = spark.read.parquet(s"$indexPath/manifest")
    val manifest = manifestDf.head()
    val numShards = manifest.getInt(manifest.fieldIndex("num_shards"))
    val conf = spark.sparkContext.hadoopConfiguration
    val tsPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    require(tsPath.getFileSystem(conf).exists(tsPath),
      s"no tombstones at $indexPath — nothing to compact")
    val ts = spark.read.parquet(tsPath.toString).select(col("id"))
      .localCheckpoint(eager = true)
    publishAtomically(spark, outPath, overwrite) { tmp =>
      // independent per-shard rewrites fanned out per guide §2.6
      val liveTotal = Par.shards(0 until numShards) { i =>
        val shardDir = f"shard_$i%04d"
        val vecs = spark.read.parquet(s"$indexPath/$shardDir/vectors")
        // renumber pack positions contiguously in original order:
        // positions are 0..n-1 per shard, so a kept row's new
        // position is its old one minus the dropped positions below
        // it — a MAP-ONLY renumber (zero shuffle; the previous
        // global-orderBy window funneled the whole shard through one
        // task, guide §2). Dropped set bounded by the tombstone batch.
        val dropped = vecs.select("id", "idx")
          .join(ts, Seq("id"), "left_semi")
          .select("idx").collect().map(_.getInt(0)).sorted
        val bcDropped = spark.sparkContext.broadcast(dropped)
        val newIdx = udf { (p: Int) =>
          val d = bcDropped.value
          var lo = 0; var hi = d.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (d(mid) < p) lo = mid + 1 else hi = mid
          }
          p - lo
        }.asNonNullable()
        val renumbered = vecs.join(ts, Seq("id"), "left_anti")
          .withColumn("idx", newIdx(col("idx")))
        renumbered.write.mode(SaveMode.ErrorIfExists)
          .parquet(s"$tmp/$shardDir/vectors")
        bcDropped.destroy()
        val liveN = spark.read.parquet(s"$tmp/$shardDir/vectors").count()
        // meta rewritten by NAME so both build-written (8-col) and
        // append-written (9-col, k_pq) schemas survive unchanged
        spark.read.parquet(s"$indexPath/$shardDir/meta")
          .withColumn("n", lit(liveN).cast(IntegerType))
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/$shardDir/meta")
        liveN
      }.sum
      manifestDf.withColumn("total_n", lit(liveTotal))
        .write.mode(SaveMode.ErrorIfExists).parquet(s"$tmp/manifest")
      // the compacted index keeps its geometry: carry rot/ forward
      if (graft.sources.Source.hasOpqRotation(spark, indexPath)) {
        val src = new org.apache.hadoop.fs.Path(s"$indexPath/rot")
        val fs2 = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
        require(org.apache.hadoop.fs.FileUtil.copy(
          src.getFileSystem(conf), src, fs2,
          new org.apache.hadoop.fs.Path(s"$tmp/rot"), false, conf),
          s"could not carry $src forward")
      }
    }
  }
}
