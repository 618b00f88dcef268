package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.InternalRowBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal-column plumbing (SURVEY §2.3 #32): treat media as
  * opaque `binary` payloads with typed metadata, decoded/featurized
  * per partition in batches.
  *
  * PNG, JPEG, and GIF decode for REAL (`javax.imageio` ships all
  * three with the bare JVM — [[decodePixels]]); the other codecs
  * aren't in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic fake for them —
  * but everything Spark-side
  * is real and load-bearing: the binary column, the schema of the
  * feature struct, partition-batched iteration (the `mapPartitions`
  * shape a Pandas-UDF/Arrow batch pipeline has on a cluster), and the
  * downstream joinability of the features. Like the similarity
  * kernels, the pipeline runs on InternalRow
  * ([[InternalRowBridge]]) — payload bytes go straight from the scan's
  * UnsafeRows into the decoder with no per-row boxing, so swapping the
  * stub for a real codec inherits a real throughput path.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Containers `javax.imageio` decodes natively on a bare JVM — the
    * formats whose pixels are REAL, not stubbed. A web crawl is mostly
    * JPEG, so stopping at PNG (rounds 4-6) left the dominant format
    * invisible to image near-dup.
    */
  private val imageioFormats = Set("png", "jpeg", "gif")

  /** Decode dispatcher: REAL pixel decode for the formats the bare
    * JVM ships codecs for (PNG/JPEG/GIF via `javax.imageio`); the
    * deterministic stub for every other container (their codecs are
    * absent in this environment). Both arms return the same
    * (md5, feature-vector) shape, so the downstream schema and
    * pipeline are codec-agnostic.
    */
  private[graft] def decode(payload: Array[Byte]): (String, Array[Double]) =
    (if (imageioFormats(parseHeader(payload)._2)) decodePixels(payload) else None)
      .getOrElse(decodeStub(payload))

  /** Image bytes → BufferedImage with the decompression-bomb guard —
    * the shared decode front of [[decodePixels]] and [[imageHashes]].
    */
  private[graft] def decodeImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    // Bound the raster from the ALREADY-PARSED container header before
    // ImageIO allocates it: a decompression-bomb image declares a huge
    // canvas in a tiny file, and the resulting OutOfMemoryError is
    // fatal — it must not be caught and reported as "malformed data"
    // (that would mask genuine executor heap exhaustion; round-5
    // advice). The dimensions come from [[parseHeader]]'s per-format
    // parse (PNG IHDR / JPEG SOF walk / GIF LSD), NOT from fixed byte
    // offsets — round 6 read PNG IHDR offsets unconditionally, so any
    // JPEG/GIF whose arbitrary bytes at 16..23 multiplied past the
    // ceiling was spuriously rejected (round-6 advice). A format whose
    // dims the header parse can't see gets no guard (its decode risk
    // is bounded by what ImageIO recognizes at all). 64M px ≈ 256 MB
    // of ARGB, a sane per-row ceiling.
    val (_, _, w, h, _) = parseHeader(payload)
    if (w.toLong * h > (64L << 20)) return None
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL pixel decode via `javax.imageio` (PNG/JPEG/GIF) — NOT a
    * stub. Feature layout: [width, height, mean R, mean G, mean B]
    * over all pixels (0-255 scale), the plumbing-sized stand-in for a
    * model embedding. A payload ImageIO can't actually decode
    * (truncated/corrupt body behind a valid magic) falls back to the
    * stub rather than failing the pipeline — malformed blobs are
    * data, not bugs, at 100 TB.
    */
  private[graft] def decodePixels(payload: Array[Byte]): Option[(String, Array[Double])] = {
    try {
      val img = decodeImage(payload).orNull
      if (img == null) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(payload).map("%02x".format(_)).mkString
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        val n = math.max(w.toLong * h, 1L).toDouble
        Some((hex, Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB decode for codecs absent from this environment: md5 + a
    * 4-dim feature derived from byte statistics, deterministic so
    * tests are stable.
    */
  private def decodeStub(payload: Array[Byte]): (String, Array[Double]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    var sum = 0L; var mx = 0L; var i = 0
    while (i < payload.length) { val b = payload(i) & 0xFF; sum += b; if (b > mx) mx = b; i += 1 }
    val n = math.max(payload.length, 1)
    (hex, Array(payload.length.toDouble, sum.toDouble / n, mx.toDouble,
      (sum % 251).toDouble))
  }

  /** Binary payload pipeline: documents → utf-8 payload bytes (stand-in
    * for an image/audio blob column) → per-partition batched decode →
    * typed features. `getBinary` copies the payload out of the scan's
    * reused UnsafeRow, so batching needs no row copies.
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val outRdd = InternalRowBridge.toInternalRdd(withPayload).mapPartitions { it =>
      // batch shape: decode in groups, as an Arrow/Pandas batch would
      it.map(row => (row.getLong(0), row.getBinary(1)))
        .grouped(256).flatMap(_.iterator.map { case (id, payload) =>
          val (hex, feat) = decode(payload)
          new GenericInternalRow(Array[Any](id, payload.length.toLong,
            UTF8String.fromString(hex), new GenericArrayData(feat))): InternalRow
        })
    }
    InternalRowBridge.fromInternalRdd(s, outRdd, featureSchema).orderBy("doc_id")
  }

  // ---- perceptual image hashing (REAL decode, PNG) ----------------------

  /** 64-bit AVERAGE-HASH (aHash) perceptual fingerprint: box-average
    * the grayscale image onto an 8×8 grid, threshold each cell at the
    * grid mean, read row-major bits. Re-encodes, small noise, and
    * minor edits move a few bits; unrelated images differ in ~32 —
    * the standard first-tier image near-dup signal (same family as
    * pHash/dHash; average-hash chosen because it is exactly
    * reproducible with integer box sums — no DCT/resample kernel to
    * pin down across platforms). Deterministic: pure arithmetic over
    * `getRGB`, no Graphics2D rescaling.
    */
  private[graft] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val gy = math.min(7, y * 8 / math.max(h, 1))
      var x = 0
      while (x < w) {
        val gx = math.min(7, x * 8 / math.max(w, 1))
        val rgb = img.getRGB(x, y)
        val gray = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        val c = gy * 8 + gx
        sums(c) += gray; counts(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = new Array[Double](64)
    var i = 0; var total = 0.0
    while (i < 64) {
      cells(i) = if (counts(i) > 0) sums(i) / counts(i) else 0.0
      total += cells(i); i += 1
    }
    val mean = total / 64.0
    var bits = 0L; i = 0
    while (i < 64) { if (cells(i) >= mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** 64-bit DIFFERENCE-HASH (dHash): box-average onto a 9×8 grid,
    * bit = cell brighter than its right neighbor. The standard
    * complement to [[aHash64]] — aHash thresholds against the global
    * mean (weak on smooth global gradients, strong on layout), dHash
    * encodes local gradients (insensitive to global brightness
    * shifts). Production image dedup runs both and cross-checks, the
    * [[Dedup.simhashPairsAuto]] pattern one modality over.
    */
  private[graft] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](72)
    val counts = new Array[Long](72)
    var y = 0
    while (y < h) {
      val gy = math.min(7, y * 8 / math.max(h, 1))
      var x = 0
      while (x < w) {
        val gx = math.min(8, x * 9 / math.max(w, 1))
        val rgb = img.getRGB(x, y)
        val gray = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        val c = gy * 9 + gx
        sums(c) += gray; counts(c) += 1
        x += 1
      }
      y += 1
    }
    def cell(i: Int): Double = if (counts(i) > 0) sums(i) / counts(i) else 0.0
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (cell(gy * 9 + gx) > cell(gy * 9 + gx + 1))
          bits |= (1L << (gy * 8 + gx))
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Fingerprint column is named `sig`, method-neutrally: the same
    * schema carries aHash, dHash, AND the audio energy hash — round 6
    * called it `ahash`, which lied to downstream callers about what a
    * dHash/audio fingerprint was (round-6 advice).
    */
  val imageHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sig", LongType, nullable = true)))

  /** Per-row perceptual hash of a binary image column — REAL decode
    * (PNG/JPEG/GIF via `javax.imageio`; null for payloads no available
    * codec decodes, which downstream near-dup simply skips —
    * undecodable blobs are data, not bugs). Scan-stage `mapPartitions`
    * on InternalRow, the same batch shape as [[features]].
    */
  def imageHashes(docs: DataFrame, idCol: String, payloadCol: String,
      method: String = "ahash"): DataFrame = {
    require(Set("ahash", "dhash").contains(method),
      s"method must be ahash or dhash, got $method")
    val useD = method == "dhash"
    val in = docs.select(col(idCol).cast(LongType).as("doc_id"),
      col(payloadCol).as("payload"))
    val outRdd = InternalRowBridge.toInternalRdd(in).mapPartitions { it =>
      it.map(row => (row.getLong(0), row.getBinary(1)))
        .grouped(256).flatMap(_.iterator.map { case (id, payload) =>
          val hash = decodeImage(payload).map(i => if (useD) dHash64(i) else aHash64(i))
          new GenericInternalRow(Array[Any](id,
            hash.map(java.lang.Long.valueOf).orNull)): InternalRow
        })
    }
    InternalRowBridge.fromInternalRdd(docs.sparkSession, outRdd, imageHashSchema)
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("img", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** IMAGE RESIZE / container normalization — the vision-model
    * preprocessing step (decode → fit-within (maxW, maxH) preserving
    * aspect ratio, never upscaling → re-encode so downstream sees
    * ONE container regardless of source format). REAL
    * decode+scale+encode on the JVM (`javax.imageio` + bilinear
    * `Graphics2D`), same bomb-guarded [[decodeImage]] as the hash
    * path; undecodable payloads yield null (data, not bugs).
    * Transparency composites onto WHITE (the vision-preprocessing
    * convention — the default black canvas would invert every
    * white-on-transparent logo for downstream hashing). `format` is
    * `png` (lossless; can be LARGER than a photographic JPEG input)
    * or `jpg` (lossy, compact for photos — the web-corpus default
    * trade). Pixels stay inside the scan-stage `mapPartitions`.
    */
  def resizeImages(docs: DataFrame, idCol: String, payloadCol: String,
      maxW: Int, maxH: Int, format: String = "png"): DataFrame = {
    require(maxW >= 1 && maxH >= 1, s"target must be >= 1x1, got ${maxW}x$maxH")
    require(Set("png", "jpg").contains(format), s"format must be png or jpg, got $format")
    val in = docs.select(col(idCol).cast(LongType).as("doc_id"),
      col(payloadCol).as("payload"))
    val outRdd = InternalRowBridge.toInternalRdd(in).mapPartitions { it =>
      it.map(row => (row.getLong(0), row.getBinary(1)))
        .grouped(256).flatMap(_.iterator.map { case (id, payload) =>
          val out = decodeImage(payload).map { img =>
            val scale = math.min(1.0, math.min(
              maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
            val (tw, th) = (math.max(1, math.round(img.getWidth * scale).toInt),
              math.max(1, math.round(img.getHeight * scale).toInt))
            val dst = new java.awt.image.BufferedImage(tw, th,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              // composite transparency onto white, not the default
              // black canvas (a white-on-transparent logo must not
              // invert for downstream perceptual hashing)
              g.setColor(java.awt.Color.WHITE)
              g.fillRect(0, 0, tw, th)
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, tw, th, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, format, bos)
            (bos.toByteArray, tw, th)
          }
          new GenericInternalRow(Array[Any](id,
            out.map(_._1).orNull,
            out.map(o => java.lang.Integer.valueOf(o._2)).orNull,
            out.map(o => java.lang.Integer.valueOf(o._3)).orNull)): InternalRow
        })
    }
    InternalRowBridge.fromInternalRdd(docs.sparkSession, outRdd, resizeSchema)
  }

  /** IMAGE near-duplicate pairs: perceptual aHash + the same
    * pigeonhole hamming join the text SimHash path uses
    * ([[Dedup.hammingPairs]]) — one decode scan, then candidates are
    * (id, fingerprint) rows only; pixels never cross an exchange.
    * The multimodal half of corpus dedup: re-encoded/lightly-edited
    * images that byte-level exact dedup cannot see.
    */
  def imageNearDupPairs(
      docs: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 5, method: String = "ahash"): DataFrame =
    Dedup.hammingPairs(
      imageHashes(docs, idCol, payloadCol, method).filter(col("sig").isNotNull),
      "doc_id", "sig", maxDist)

  /** Deterministic planted image corpus for the driver-visible
    * near-dup GATE (`multimodal_neardup_gate`): `nGroups` groups of 4
    * docs — a PNG original, its JPEG RE-ENCODE (the real-world web-dup
    * case: same pixels, different container), a sparse-noise copy, and
    * an undecodable junk blob. Every group's pattern is a rotation of
    * one 8-level brightness ramp painted in 8-px columns:
    * - adjacent columns differ by ≥ 30 gray levels, so JPEG error
    *   (±2-3 on block-aligned flat fields) can flip no dHash gradient
    *   sign and no aHash mean-threshold bit;
    * - distinct rotations are ≥ 16 fingerprint bits apart (each
    *   column shift moves 2 threshold bits × 8 grid rows), far past
    *   any near-dup cutoff.
    * So by CONSTRUCTION: each group contributes exactly its 3
    * decodable pairs, zero pairs cross groups, junk decodes to null,
    * and aHash/dHash agree — the constants the gate's oracle pins.
    * Driver-side render of 4·nGroups tiny images — bounded by
    * construction, like the corpus index.
    */
  def syntheticImages(spark: SparkSession, nGroups: Int = 6): DataFrame = {
    require(nGroups >= 1 && nGroups <= 8, s"rotations support 1..8 groups, got $nGroups")
    val levels = Array(15, 45, 75, 105, 150, 180, 210, 240)
    def render(g: Int, fmt: String, noise: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 64) {
          val v =
            if (noise && (x * 13 + y * 7) % 101 == 0) 128
            else levels((x / 8 + g) % 8)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = (0 until nGroups).flatMap { g =>
      Seq(
        (4L * g, render(g, "png", noise = false)),
        (4L * g + 1, render(g, "jpg", noise = false)),
        (4L * g + 2, render(g, "png", noise = true)),
        (4L * g + 3, s"not an image $g".getBytes("UTF-8")))
    }
    spark.createDataFrame(rows).toDF("doc_id", "payload")
  }

  // ---- perceptual audio hashing (REAL decode, PCM WAV) ------------------

  /** Decode a PCM WAV payload to mono samples in [-1, 1] — REAL audio
    * decode, no codec needed (PCM is just bytes behind a RIFF chunk
    * walk): 8-bit unsigned and 16-bit signed little-endian, any
    * channel count (averaged to mono). Returns None for anything else
    * (compressed WAV, truncated chunks, non-WAV) — undecodable blobs
    * are data, not bugs.
    */
  private[graft] def decodeWav(p: Array[Byte]): Option[Array[Double]] = {
    def u8(i: Int) = p(i) & 0xFF
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) = p.length >= i + 4 &&
      (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (pos + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(pos + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      val body = pos + 8
      if (tag(pos, "fmt ") && body + 16 <= p.length)
        fmt = Some((le16(body), le16(body + 2), le16(body + 14)))
      else if (tag(pos, "data"))
        data = Some((body, math.min(size.toInt, p.length - body)))
      pos = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, bits)), Some((off, len)))
          if ch >= 1 && (bits == 8 || bits == 16) =>
        val bytesPerFrame = ch * bits / 8
        val n = len / bytesPerFrame
        if (n == 0) return None
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0; var c = 0
          while (c < ch) {
            val sOff = off + i * bytesPerFrame + c * bits / 8
            acc +=
              (if (bits == 8) (u8(sOff) - 128) / 128.0
               else {
                 val v = (u8(sOff) | (p(sOff + 1).toInt << 8)).toShort
                 v / 32768.0
               })
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        Some(out)
      case _ => None
    }
  }

  /** 64-bit audio ENERGY-ENVELOPE fingerprint: the mono signal splits
    * into 64 equal frames, each frame's RMS energy thresholds at the
    * mean frame energy, bits read in time order. Amplitude-scale
    * invariant (threshold at the signal's own mean) and robust to
    * light noise; unrelated material differs in ~32 bits — the
    * first-tier audio near-dup signal (the chromaprint family's
    * coarse ancestor, built on the REAL PCM decode above).
    */
  private[graft] def audioHash64(samples: Array[Double]): Long = {
    val n = samples.length
    val energy = new Array[Double](64)
    var f = 0
    while (f < 64) {
      val from = (f.toLong * n / 64).toInt
      val to = math.max(((f + 1).toLong * n / 64).toInt, from + 1)
      var acc = 0.0; var i = from
      while (i < to && i < n) { acc += samples(i) * samples(i); i += 1 }
      energy(f) = math.sqrt(acc / math.max(to - from, 1))
      f += 1
    }
    val mean = energy.sum / 64.0
    var bits = 0L; f = 0
    while (f < 64) { if (energy(f) >= mean) bits |= (1L << f); f += 1 }
    bits
  }

  /** Per-row audio fingerprint of a binary column (REAL PCM WAV
    * decode; null for undecodable payloads). Same scan shape as
    * [[imageHashes]].
    */
  def audioHashes(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val in = docs.select(col(idCol).cast(LongType).as("doc_id"),
      col(payloadCol).as("payload"))
    val outRdd = InternalRowBridge.toInternalRdd(in).mapPartitions { it =>
      it.map(row => (row.getLong(0), row.getBinary(1)))
        .grouped(256).flatMap(_.iterator.map { case (id, payload) =>
          val hash = decodeWav(payload).map(audioHash64)
          new GenericInternalRow(Array[Any](id,
            hash.map(java.lang.Long.valueOf).orNull)): InternalRow
        })
    }
    InternalRowBridge.fromInternalRdd(docs.sparkSession, outRdd, imageHashSchema)
  }

  /** AUDIO near-duplicate pairs — [[audioHashes]] +
    * [[Dedup.hammingPairs]], the audio half of [[imageNearDupPairs]].
    */
  def audioNearDupPairs(
      docs: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 5): DataFrame =
    Dedup.hammingPairs(
      audioHashes(docs, idCol, payloadCol).filter(col("sig").isNotNull),
      "doc_id", "sig", maxDist)

  // ---- media metadata + frame sampling (decode STUBBED) -----------------

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** REAL container-header parse for the common formats — pure byte
    * inspection, no codec required, so this part is NOT stubbed:
    * - PNG  (\\x89PNG\\r\\n\\x1a\\n): width/height big-endian in IHDR
    * - JPEG (FFD8): marker walk to the first SOF0-SOF3 frame header
    * - GIF  (GIF87a/89a): width/height little-endian in the LSD
    * - WAV  (RIFF····WAVE): audio, no pixel dimensions
    * - MP4  (ftyp at offset 4): video; dimensions live in moov, which
    *   needs a box walk over the (possibly huge) tail — left 0 here
    * Anything unrecognized falls back to [[parseHeaderStub]] — the
    * only remaining stub, standing in for exotic containers.
    * Returns (kind, format, width, height, n_frames).
    */
  private[graft] def parseHeader(p: Array[Byte]): (String, String, Int, Int, Int) = {
    def u8(i: Int) = p(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i).toLong << 24 | u8(i + 1) << 16 | u8(i + 2) << 8 | u8(i + 3)).toInt
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def ascii(i: Int, s: String) =
      p.length >= i + s.length && s.indices.forall(k => p(i + k) == s.charAt(k).toByte)
    if (p.length >= 24 && u8(0) == 0x89 && ascii(1, "PNG") && ascii(12, "IHDR"))
      ("image", "png", be32(16), be32(20), 1)
    else if (p.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG marker walk: FF xx [len.2 payload]; SOF0-3 carry
      // precision(1), height(2), width(2) after the length. The spec
      // allows any number of 0xFF FILL bytes before a marker, and
      // TEM (0x01) / RSTn / SOI / EOI are STANDALONE (no length) —
      // treating either as length-prefixed would consume a garbage
      // "length" and skip past the SOF header.
      var i = 2
      var res: (String, String, Int, Int, Int) = ("image", "jpeg", 0, 0, 1)
      var done = false
      while (!done && i + 1 < p.length && u8(i) == 0xFF) {
        if (u8(i + 1) == 0xFF) i += 1 // fill byte
        else {
          val marker = u8(i + 1)
          if (marker >= 0xC0 && marker <= 0xC3) {
            if (i + 8 < p.length) res = ("image", "jpeg", be16(i + 7), be16(i + 5), 1)
            done = true
          } else if (marker == 0x01 ||
            (marker >= 0xD0 && marker <= 0xD9)) i += 2 // standalone (TEM/RSTn/SOI/EOI)
          else if (i + 3 < p.length) i += 2 + be16(i + 2)
          else done = true
        }
      }
      res
    }
    else if (p.length >= 10 && (ascii(0, "GIF87a") || ascii(0, "GIF89a")))
      ("image", "gif", le16(6), le16(8), 1)
    else if (p.length >= 12 && ascii(0, "RIFF") && ascii(8, "WAVE"))
      ("audio", "wav", 0, 0, 0)
    else if (p.length >= 8 && ascii(4, "ftyp")) {
      // ISO-BMFF: the brand at offset 8 distinguishes audio (M4A),
      // image (HEIC/HEIF/AVIF), and video containers; a payload
      // truncated before the brand is still recognizably BMFF →
      // default to video rather than the fake-dimension stub
      if (p.length < 12) ("video", "mp4", 0, 0, 0)
      else {
        val brand = new String(p, 8, 4, "US-ASCII")
        if (brand.startsWith("M4A")) ("audio", "m4a", 0, 0, 0)
        else if (Set("heic", "heix", "heif", "mif1", "avif")(brand))
          ("image", brand.trim, 0, 0, 1)
        else ("video", "mp4", 0, 0, 0)
      }
    }
    else {
      val (kind, w, h, f) = parseHeaderStub(p)
      (kind, "unknown", w, h, f)
    }
  }

  /** STUB fallback for unrecognized containers: deterministic fake
    * derived from payload bytes so tests are stable.
    */
  private def parseHeaderStub(payload: Array[Byte]): (String, Int, Int, Int) = {
    val b0 = if (payload.isEmpty) 0 else payload(0) & 0xFF
    val kind = if (b0 % 2 == 0) "image" else "video"
    val w = 64 + (b0 % 8) * 32
    val h = 64 + ((payload.length / 7) % 8) * 32
    val frames = if (kind == "image") 1 else 8 + b0 % 24
    (kind, w, h, frames)
  }

  /** Typed media metadata per blob — the schema a catalog/filter stage
    * works on without ever decoding pixels. The parse is per-partition
    * batched like [[features]].
    */
  def mediaMeta(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val s = docs.sparkSession
    val src = docs.select(col(idCol).cast("long"), col(payloadCol))
    val outRdd = InternalRowBridge.toInternalRdd(src).mapPartitions { it =>
      it.map(row => (row.getLong(0), row.getBinary(1)))
        .grouped(256).flatMap(_.iterator.map { case (id, payload) =>
          val (kind, fmt, w, h, f) = parseHeader(payload)
          new GenericInternalRow(Array[Any](id, UTF8String.fromString(kind),
            UTF8String.fromString(fmt), w, h, f)): InternalRow
        })
    }
    InternalRowBridge.fromInternalRdd(s, outRdd, mediaMetaSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Uniform frame sampling: `nSample` evenly spaced frames per video
    * blob, one output row per frame — the explode-shaped stage a
    * video-training pipeline runs before per-frame featurization.
    * Decode is STUBBED (frames are deterministic byte slices); the
    * row-explosion shape, schema, and partition behavior are real.
    *
    * LIMITATION (honest, not silent): a real MP4's frame count lives
    * in the moov box, which [[parseHeader]] does not walk — real MP4
    * payloads therefore report n_frames = 0 and emit NO frame rows
    * here (a decoder integration would replace both the count and the
    * slice stub). Unrecognized containers go through the stub parse
    * and exercise the full explosion path, which is what the tests
    * drive.
    */
  def sampleFrames(docs: DataFrame, idCol: String, payloadCol: String, nSample: Int): DataFrame = {
    require(nSample > 0)
    val s = docs.sparkSession
    val src = docs.select(col(idCol).cast("long"), col(payloadCol))
    val outRdd = InternalRowBridge.toInternalRdd(src).mapPartitions { it =>
      it.map(row => (row.getLong(0), row.getBinary(1)))
        .grouped(64).flatMap(_.iterator.flatMap { case (id, payload) =>
          val (kind, _, _, _, nFrames) = parseHeader(payload)
          if (kind != "video" || nFrames <= 0) Iterator.empty
          else {
            val take = math.min(nSample, nFrames)
            (0 until take).iterator.map { i =>
              val frameIdx = (i.toLong * nFrames / take).toInt
              // STUB decode: a deterministic slice stands in for the frame
              val chunk = math.max(1, payload.length / nFrames)
              val from = math.min(frameIdx * chunk, math.max(payload.length - 1, 0))
              val until = math.min(from + chunk, payload.length)
              new GenericInternalRow(Array[Any](id, frameIdx,
                java.util.Arrays.copyOfRange(payload, from, until))): InternalRow
            }
          }
        })
    }
    InternalRowBridge.fromInternalRdd(s, outRdd, frameSchema)
  }
}
