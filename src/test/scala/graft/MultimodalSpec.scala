package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]", 4)

  val dir = "/root/testdata/sf0.001"

  test("binary feature pipeline: schema, md5 parity, feature shape") {
    val out = Multimodal.features(spark, dir)
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.limit(20).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getSeq[Double](3).length == 4))
    // md5 over payload bytes == Spark's md5 over the same utf-8 text
    val expected = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("m")).limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(r.getString(2) == expected(r.getLong(0))))
    // byte_len consistent with the first feature component
    rows.foreach(r => assert(r.getSeq[Double](3).head == r.getLong(1).toDouble))
  }

  test("media metadata: typed schema, deterministic, joins back to features") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val meta = Multimodal.mediaMeta(docs, "doc_id", "payload")
    assert(meta.schema == Multimodal.mediaMetaSchema)
    val rows = meta.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      // utf-8 text payloads carry no container magic → stub fallback
      assert(Set("image", "video")(r.getString(1)))
      assert(r.getString(2) == "unknown")
      assert(r.getInt(3) > 0 && r.getInt(4) > 0)
      assert(if (r.getString(1) == "image") r.getInt(5) == 1 else r.getInt(5) > 1)
    }
    // deterministic across runs
    assert(meta.collect().toSeq == rows.toSeq)
    // composes with the feature pipeline through a plain join
    val joined = meta.join(Multimodal.features(spark, dir), "doc_id")
    assert(joined.count() == rows.length)
  }

  test("frame sampling: video-only explosion, evenly spaced, bounded by n_frames") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val meta = Multimodal.mediaMeta(docs, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(5))).toMap
    val frames = Multimodal.sampleFrames(docs, "doc_id", "payload", nSample = 4)
    assert(frames.schema == Multimodal.frameSchema)
    val byDoc = frames.collect().groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, fs) =>
      val (kind, nFrames) = meta(id)
      assert(kind == "video", "image rows must not emit frames")
      assert(fs.length == math.min(4, nFrames))
      val idxs = fs.map(_.getInt(1)).sorted
      assert(idxs.distinct.length == idxs.length && idxs.forall(i => i >= 0 && i < nFrames))
      fs.foreach(f => assert(f.getAs[Array[Byte]](2).nonEmpty))
    }
    // every video doc is represented
    assert(byDoc.keySet == meta.collect { case (id, ("video", _)) => id }.toSet)
  }

  test("real container headers parse without codecs: PNG, JPEG, GIF, WAV, MP4") {
    import spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // minimal-but-valid headers, dimensions 640x480
    val png = b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // magic
      0, 0, 0, 13, 'I', 'H', 'D', 'R',                        // IHDR len+type
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xE0,                     // 640, 480
      8, 2, 0, 0, 0)
    val jpeg = b(0xFF, 0xD8,                                  // SOI
      0xFF, 0xE0, 0, 4, 0, 0,                                 // APP0 (len 4)
      0xFF, 0xC0, 0, 11, 8, 0x01, 0xE0, 0x02, 0x80, 3, 0, 0, 0) // SOF0 h=480 w=640
    val gif = b('G', 'I', 'F', '8', '9', 'a',
      0x80, 0x02, 0xE0, 0x01, 0, 0, 0)                        // 640x480 LE
    val wav = b('R', 'I', 'F', 'F', 4, 0, 0, 0, 'W', 'A', 'V', 'E')
    val mp4 = b(0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm')
    val docs = Seq(
      (1L, png), (2L, jpeg), (3L, gif), (4L, wav), (5L, mp4),
      (6L, "just text".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = Multimodal.mediaMeta(docs, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L) == (("image", "png", 640, 480)))
    assert(got(2L) == (("image", "jpeg", 640, 480)))
    assert(got(3L) == (("image", "gif", 640, 480)))
    assert(got(4L)._1 == "audio" && got(4L)._2 == "wav")
    assert(got(5L)._1 == "video" && got(5L)._2 == "mp4")
    assert(got(6L)._2 == "unknown") // stub fallback
  }

  test("PNG decode is REAL: javax.imageio pixel stats, exact on a known fixture") {
    // render a known image: left half pure red, right half pure blue
    val (w, h) = (8, 4)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xFF0000 else 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    // real decode: [width, height, meanR, meanG, meanB] — exact values
    val (hex, feat) = Multimodal.decode(png)
    assert(feat.toSeq == Seq(8.0, 4.0, 127.5, 0.0, 127.5))
    // md5 is over the payload bytes, same contract as the stub arm
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(hex == md.digest(png).map("%02x".format(_)).mkString)
    // non-PNG payloads still take the deterministic stub arm:
    // feature(0) = byte_len is the stub's signature layout
    val txt = "just text".getBytes("UTF-8")
    assert(Multimodal.decode(txt)._2.head == txt.length.toDouble)
    // a PNG magic with a corrupt body falls back to the stub, not a crash
    val corrupt = png.take(24)
    assert(Multimodal.decode(corrupt)._2.length == 4)
  }

  test("header-parse edge cases: JPEG fill bytes/TEM, ISO-BMFF brands") {
    import spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // fill bytes (FF FF) and a standalone TEM (FF 01) before SOF0
    val jpegFill = b(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0x01,
      0xFF, 0xC0, 0, 11, 8, 0x01, 0xE0, 0x02, 0x80, 3, 0, 0, 0)
    val m4a = b(0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'M', '4', 'A', ' ')
    val heic = b(0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'h', 'e', 'i', 'c')
    val docs = Seq((1L, jpegFill), (2L, m4a), (3L, heic)).toDF("doc_id", "payload")
    val got = Multimodal.mediaMeta(docs, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L) == (("image", "jpeg", 640, 480)))
    assert(got(2L)._1 == "audio" && got(2L)._2 == "m4a")
    assert(got(3L)._1 == "image" && got(3L)._2 == "heic")
  }

  private def render(fmt: String, w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  private def renderPng(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] =
    render("png", w, h)(pixel)

  test("JPEG and GIF pixels decode for REAL (javax.imageio), exact/near-exact stats") {
    // GIF: black/white survive ANY palette quantization exactly (the
    // writer's default palette mangles saturated primaries, and the
    // JDK round-trip corrupts the last row of TINY rasters — 64x32 is
    // verified exact) — left half black, right half white
    val gif = render("gif", 64, 32)((x, _) => if (x < 32) 0x000000 else 0xFFFFFF)
    assert(Multimodal.parseHeader(gif)._2 == "gif")
    val (_, gfeat) = Multimodal.decode(gif)
    assert(gfeat.toSeq == Seq(64.0, 32.0, 127.5, 127.5, 127.5),
      s"gif decoded ${gfeat.toSeq}")
    // JPEG is lossy: pin dimensions exactly, channel means to ±3 on a
    // solid mid-gray (a constant Y plane is the JPEG best case)
    val jpeg = render("jpg", 8, 4)((_, _) => 0x808080)
    assert(Multimodal.parseHeader(jpeg)._2 == "jpeg")
    val (_, jfeat) = Multimodal.decode(jpeg)
    assert(jfeat.length == 5, "jpeg must take the REAL pixel arm (5-dim), not the 4-dim stub")
    assert(jfeat(0) == 8.0 && jfeat(1) == 4.0)
    (2 to 4).foreach(i => assert(math.abs(jfeat(i) - 0x80) <= 3.0,
      s"jpeg channel mean ${jfeat(i)} drifted from 128"))
  }

  test("decompression-bomb guard is per-format: JPEG metadata bytes can't spuriously reject") {
    // Splice a COM segment whose 0xFF payload puts huge values at byte
    // offsets 16..23 — the round-6 guard read PNG IHDR offsets
    // unconditionally and rejected exactly this payload as a "bomb"
    val base = render("jpg", 64, 32)((x, y) => { val v = x * 4; (v << 16) | (v << 8) | v })
    val com = Array(0xFF, 0xFE, 0x00, 26).map(_.toByte) ++ Array.fill(24)(0xFF.toByte)
    val spliced = base.take(2) ++ com ++ base.drop(2)
    assert(Multimodal.parseHeader(spliced) == (("image", "jpeg", 64, 32, 1)))
    assert(Multimodal.decodeImage(spliced).nonEmpty,
      "valid JPEG rejected by a PNG-offset bomb guard")
    // a REAL declared bomb is still refused before allocation: a PNG
    // IHDR announcing 100000x100000 (10 Gpx) in a tiny payload
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val bomb = b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0x00, 0x01, 0x86, 0xA0, 0x00, 0x01, 0x86, 0xA0, 8, 2, 0, 0, 0)
    assert(Multimodal.decodeImage(bomb).isEmpty)
  }

  test("imageNearDupPairs finds a PNG↔JPEG re-encode of the same image — the web-dup case") {
    import spark.implicits._
    def halves(x: Int, y: Int) = { val v = if (x < 32) 30 else 220; (v << 16) | (v << 8) | v }
    def checker(x: Int, y: Int) = { val v = if (((x / 8) + (y / 4)) % 2 == 0) 30 else 220; (v << 16) | (v << 8) | v }
    val df = Seq(
      (1L, render("png", 64, 32)(halves)),
      (2L, render("jpg", 64, 32)(halves)), // same pixels, lossy re-encode
      (3L, render("gif", 64, 32)(checker)))
      .toDF("doc_id", "payload")
    for (m <- Seq("ahash", "dhash")) {
      val pairs = Multimodal.imageNearDupPairs(df, "doc_id", "payload",
          maxDist = 6, method = m)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"$m expected the re-encode pair only, got $pairs")
    }
  }

  test("image aHash: re-encode-stable, noise-robust, unrelated images far apart") {
    // a horizontal gradient; a copy with sparse noise; its inverse
    def grad(x: Int, y: Int) = { val v = x * 255 / 63; (v << 16) | (v << 8) | v }
    val base = renderPng(64, 32)(grad)
    val noisy = renderPng(64, 32)((x, y) =>
      if ((x * 31 + y * 17) % 97 == 0) 0x808080 else grad(x, y))
    val inverse = renderPng(64, 32)((x, y) => grad(63 - x, y))
    def hashOf(png: Array[Byte]) =
      Multimodal.aHash64(Multimodal.decodeImage(png).get)
    val (hb, hn, hi) = (hashOf(base), hashOf(noisy), hashOf(inverse))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hb, hn) <= 4, s"noisy copy drifted ${ham(hb, hn)} bits")
    assert(ham(hb, hi) >= 20, s"unrelated image only ${ham(hb, hi)} bits away")
    // re-encoding the same pixels must hash identically
    assert(hashOf(renderPng(64, 32)(grad)) == hb)
  }

  test("imageNearDupPairs: finds the edited copy, skips undecodable blobs, pixels stay in the scan") {
    import spark.implicits._
    def grad(x: Int, y: Int) = { val v = y * 255 / 31; (v << 16) | (v << 8) | v }
    val base = renderPng(64, 32)(grad)
    val edited = renderPng(64, 32)((x, y) =>
      if (x < 3 && y < 3) 0xFFFFFF else grad(x, y))
    val other = renderPng(64, 32)((x, y) => grad(x, 31 - y))
    val junk = "not an image".getBytes("UTF-8")
    val df = Seq((1L, base), (2L, edited), (3L, other), (4L, junk))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(df, "doc_id", "payload", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the edited-copy pair, got $pairs")
    // undecodable rows surface as null hashes, not failures
    val hashes = Multimodal.imageHashes(df, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashes(4L).isEmpty && hashes(1L).nonEmpty)
  }

  test("image dHash: brightness-shift invariant where aHash is gradient-weak; methods cross-check") {
    // a vertical step pattern; a +40-brightness copy; an unrelated checker
    def step(x: Int, y: Int) = { val v = if ((x / 8) % 2 == 0) 40 else 200; (v << 16) | (v << 8) | v }
    def stepBright(x: Int, y: Int) = { val v = (if ((x / 8) % 2 == 0) 80 else 240); (v << 16) | (v << 8) | v }
    def checker(x: Int, y: Int) = { val v = if (((x / 8) + (y / 4)) % 2 == 0) 30 else 220; (v << 16) | (v << 8) | v }
    def h(png: Array[Byte], d: Boolean) = {
      val img = Multimodal.decodeImage(png).get
      if (d) Multimodal.dHash64(img) else Multimodal.aHash64(img)
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (p1, p2, p3) = (renderPng(64, 32)(step), renderPng(64, 32)(stepBright),
      renderPng(64, 32)(checker))
    // dHash: global brightness shift leaves every local gradient sign
    // unchanged → identical fingerprint
    assert(h(p1, d = true) == h(p2, d = true), "dHash must ignore a global brightness shift")
    assert(ham(h(p1, d = true), h(p3, d = true)) >= 16, "unrelated pattern must be far in dHash")
    // cross-check: BOTH methods find the same near-dup pair on the
    // image set (the simhash-xcheck pattern, one modality over)
    import spark.implicits._
    val df = Seq((1L, p1), (2L, p2), (3L, p3)).toDF("doc_id", "payload")
    val viaA = Multimodal.imageNearDupPairs(df, "doc_id", "payload", maxDist = 6)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaD = Multimodal.imageNearDupPairs(df, "doc_id", "payload", maxDist = 6,
        method = "dhash")
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaD == Set((1L, 2L)), s"dhash pairs: $viaD")
    assert(viaA == viaD, s"methods disagree: ahash=$viaA dhash=$viaD")
  }

  test("syntheticImages: planted pair structure is exact — the neardup gate's contract") {
    val imgs = Multimodal.syntheticImages(spark)
    assert(imgs.count() == 24)
    val expected = (0 until 6).flatMap { g =>
      val b = 4L * g
      Seq((b, b + 1), (b, b + 2), (b + 1, b + 2))
    }.toSet
    for (m <- Seq("ahash", "dhash")) {
      val pairs = Multimodal.imageNearDupPairs(imgs, "doc_id", "payload",
          maxDist = 6, method = m)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == expected, s"$m pairs: ${pairs -- expected} extra, ${expected -- pairs} missing")
    }
    // the junk blob in each group decodes to null and never pairs
    val sigs = Multimodal.imageHashes(imgs, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert((0 until 6).forall(g => sigs(4L * g + 3)), "junk must be null-sig")
  }

  private def renderWav(samples: Array[Double], channels: Int = 1): Array[Byte] = {
    val n = samples.length
    val dataLen = n * 2 * channels
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(8000)
    bb.putInt(8000 * 2 * channels); bb.putShort((2 * channels).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach { s =>
      val v = math.max(-1.0, math.min(1.0, s))
      (0 until channels).foreach(_ => bb.putShort((v * 32767).toShort))
    }
    bb.array()
  }

  test("audio fingerprint: REAL PCM decode, scale-invariant hash, unrelated audio far apart") {
    // beep pattern: loud frames 0-31, quiet 32-63 (of the 64 hash frames)
    val n = 6400
    val beepFirst = Array.tabulate(n)(i =>
      if (i < n / 2) math.sin(i * 0.7) * 0.9 else math.sin(i * 0.7) * 0.01)
    val beepLast = Array.tabulate(n)(i =>
      if (i >= n / 2) math.sin(i * 0.7) * 0.9 else math.sin(i * 0.7) * 0.01)
    val samples = Multimodal.decodeWav(renderWav(beepFirst)).get
    assert(samples.length == n)
    assert(math.abs(samples(10) - math.sin(10 * 0.7) * 0.9) < 1e-3, "16-bit round-trip")
    val h1 = Multimodal.audioHash64(samples)
    // half-volume copy hashes identically (mean-threshold scale invariance)
    val hHalf = Multimodal.audioHash64(
      Multimodal.decodeWav(renderWav(beepFirst.map(_ * 0.5))).get)
    assert(h1 == hHalf, "amplitude scaling must not move the fingerprint")
    // stereo render of the same material decodes to the same mono signal
    val hStereo = Multimodal.audioHash64(
      Multimodal.decodeWav(renderWav(beepFirst, channels = 2)).get)
    assert(java.lang.Long.bitCount(h1 ^ hStereo) <= 2)
    // opposite envelope is ~all 64 bits away (energy bits invert)
    val h2 = Multimodal.audioHash64(
      Multimodal.decodeWav(renderWav(beepLast)).get)
    assert(java.lang.Long.bitCount(h1 ^ h2) >= 32)
    // non-WAV and compressed-format payloads decode to None
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeWav("plain text".getBytes).isEmpty)
  }

  test("audioNearDupPairs: finds the lightly-noised re-render, not different material") {
    import spark.implicits._
    val n = 6400
    val rnd = new scala.util.Random(11)
    val a = Array.tabulate(n)(i => math.sin(i * 0.3) * (if ((i / 100) % 3 == 0) 0.9 else 0.05))
    val aNoisy = a.map(v => v + rnd.nextGaussian() * 0.01)
    val b = Array.tabulate(n)(i => math.sin(i * 0.3) * (if ((i / 100) % 3 == 2) 0.9 else 0.05))
    val df = Seq(
      (1L, renderWav(a)), (2L, renderWav(aNoisy)), (3L, renderWav(b)),
      (4L, "junk".getBytes)).toDF("doc_id", "payload")
    val pairs = Multimodal.audioNearDupPairs(df, "doc_id", "payload", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the noised re-render pair, got $pairs")
  }

  test("resizeImages: aspect-preserving fit, no upscale, PNG normalization, junk -> null") {
    // the 64x32 ramp fixtures: fit-within 32x32 halves both dims
    val imgs = Multimodal.syntheticImages(spark, nGroups = 2)
    val out = Multimodal.resizeImages(imgs, "doc_id", "payload", 32, 32)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3)))))
      .toMap
    // junk blobs (ids 3, 7) are null; everything decodable resizes
    assert(out(3L).isEmpty && out(7L).isEmpty)
    val decodable = out.filter(_._2.isDefined)
    assert(decodable.size == 6)
    decodable.values.flatten.foreach { case (png, w, h) =>
      assert((w, h) == (32, 16))
      // output is a real PNG that decodes to the reported dims
      val back = Multimodal.decodeImage(png).get
      assert(back.getWidth == 32 && back.getHeight == 16)
      // the brightness ramp survives scaling: columns still ascend
      // (mod rotation), so leftmost and rightmost 4-px bands differ
      def bandMean(x0: Int) = {
        var s = 0L
        for (x <- x0 until x0 + 4; y <- 0 until 16) s += back.getRGB(x, y) & 0xFF
        s / (4 * 16)
      }
      assert(math.abs(bandMean(0) - bandMean(28)) > 10)
    }
    // already-small images pass through at original dims (no upscale)
    val small = Multimodal.resizeImages(imgs, "doc_id", "payload", 1024, 1024)
      .filter(col("img").isNotNull).select("width", "height")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(small == Set((64, 32)))
  }
}
