package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** The real-decode contracts: the synthesized containers are genuinely
  * DECODABLE media, the closed forms the oracle replays agree with the
  * JDK's own implementations, and the decode stage's integer stats match
  * independent per-pixel / per-sample math. These pins are what lets the
  * DuckDB gate check a real codec path (inflate, Huffman+IDCT, PCM)
  * against pure arithmetic. */
class MediaDecodeSpec extends SparkTestBase {

  // ---- the Adler-32 closed form used by BOTH engines' synthesis ----
  private def adlerClosedForm(w: Long, h: Long, v0: Long): Long = {
    val r = h * (w + 1)
    val s1 = (1 + w * v0 + (h - 1) * (w + 2)) % 65521
    val s2 = (r + v0 * (w * r - (w * (w + 1)) / 2)
      + 2 * ((h - 1) * r - (w + 1) * ((h * (h - 1)) / 2))
      + (w * ((h - 1) * r - (w + 1) * ((h * (h - 1)) / 2))
        - (h - 1) * ((w * (w + 1)) / 2))) % 65521
    (s2 << 16) | s1
  }

  private def gradientRaster(w: Int, h: Int, v0: Int): Array[Byte] = {
    val out = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      out(y * (w + 1)) = if (y == 0) 0 else 2
      val v: Byte = if (y == 0) v0.toByte else 1
      java.util.Arrays.fill(out, y * (w + 1) + 1, (y + 1) * (w + 1), v)
      y += 1
    }
    out
  }

  test("Adler-32 closed form equals java.util.zip.Adler32 across the dim/seed grid") {
    // the formula both the Spark synthesis expression and the DuckDB
    // oracle embed, checked against the JDK's reference implementation
    // over the actual filter-byte/gradient raster layout
    for (w <- Seq(1, 2, 7, 64, 255, 256); h <- Seq(1, 2, 5, 191, 192);
         v0 <- Seq(0, 1, 100, 200, 255)) {
      val ad = new java.util.zip.Adler32()
      ad.update(gradientRaster(w, h, v0))
      assert(adlerClosedForm(w, h, v0) == ad.getValue,
        s"adler mismatch at w=$w h=$h v0=$v0")
    }
  }

  // deterministic md5-derived generator seeds, same as the synthesis
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("PNG decode: engine pixels equal both ImageIO and the gradient closed form") {
    // docs 6/12/18 are PNG image ids with texts sized to hit the mod-256
    // wrap (v0 + h > 256), the no-wrap case, and a 1-row raster
    val dir = documentsFixture(Seq(
      (6L, "x" * 300, "en", "s"),     // w=45, h=109
      (12L, "y" * 191, "en", "s"),    // h=192: max rows (wrap likely)
      (18L, "z" * 192, "en", "s")))   // h=1 (192 % 192 = 0)
    val stats = MultimodalOps.decodeStats(spark, dir).collect()
      .map(s => s.asset_id -> s).toMap
    val payloads = MultimodalOps.assets(spark, dir)
      .select("asset_id", "payload").collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    for ((id, text) <- Seq((6L, "x" * 300), (12L, "y" * 191), (18L, "z" * 192))) {
      val n = text.length
      val w = n % MultimodalOps.PngMaxW.toInt + 1
      val h = n % MultimodalOps.PngMaxH.toInt + 1
      val v0 = Integer.parseInt(md5hex(text).substring(0, 2), 16)
      // independent decode: the JDK's own PNG reader on the same bytes
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payloads(id)))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"ImageIO rejected the synthesized PNG for asset $id")
      var sum = 0L; var sumsq = 0L; var mn = 256L; var mx = -1L
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRaster.getSample(x, y, 0).toLong
        assert(p == (v0 + y) % 256, s"pixel ($x,$y) of asset $id")
        sum += p; sumsq += p * p; mn = math.min(mn, p); mx = math.max(mx, p)
      }
      val s = stats(id)
      assert(s.format == "png" && s.n_units == w.toLong * h &&
        s.u_sum.contains(sum) && s.u_sumsq.contains(sumsq) &&
        s.u_min.contains(mn) && s.u_max.contains(mx),
        s"engine decode stats diverge from ImageIO for asset $id: $s")
    }
  }

  test("JPEG decode: the JDK codec returns the constant gray the scan encodes") {
    val dir = documentsFixture(Seq(
      (3L, "a" * 57, "en", "s"),      // small: 58×58
      (9L, "b" * 639, "en", "s"),     // full-width frame: 640×160
      (15L, "c" * 7, "en", "s")))     // single MCU: 8×8
    val stats = MultimodalOps.decodeStats(spark, dir).collect()
      .map(s => s.asset_id -> s).toMap
    for ((id, text) <- Seq((3L, "a" * 57), (9L, "b" * 639), (15L, "c" * 7))) {
      val n = text.length
      val w = n % 640 + 1; val h = n % 480 + 1
      val vj = 144 + Integer.parseInt(md5hex(text).substring(0, 1), 16)
      val s = stats(id)
      assert(s.format == "jpeg" && s.n_units == w.toLong * h &&
        s.u_min.contains(vj.toLong) && s.u_max.contains(vj.toLong) &&
        s.u_sum.contains(w.toLong * h * vj),
        s"JPEG decode for asset $id (expect constant $vj at ${w}x$h): $s")
    }
  }

  test("WAV decode + energy windows: stats and window sums match a manual PCM parse") {
    val text = "pcm sample payload with enough bytes to fill several windows " + ("q" * 200)
    val dir = documentsFixture(Seq((1L, text, "en", "s")))
    val body = text.getBytes("UTF-8")
    val samples = (0 until body.length / 2).map(k =>
      (((body(2 * k + 1) & 0xFF) << 8) | (body(2 * k) & 0xFF)).toShort.toLong)
    val s = MultimodalOps.decodeStats(spark, dir).collect().head
    assert(s.format == "wav" && s.n_units == samples.length &&
      s.u_sum.contains(samples.sum) &&
      s.u_sumsq.contains(samples.map(v => v * v).sum) &&
      s.u_min.contains(samples.min) && s.u_max.contains(samples.max))
    // window spec: 64-sample windows, hop 32; every window's energy is
    // the sum of squares over its manual slice; ascii PCM is never silent
    val win = MultimodalOps.EnergyWin.toInt; val hop = MultimodalOps.EnergyHop.toInt
    val got = MultimodalOps.audioEnergy(spark, dir).collect()
      .map(r => (r.getAs[Long]("win_idx"), r.getAs[Long]("n_samples"),
        r.getAs[Long]("energy"), r.getAs[Boolean]("silence")))
    val expWins = (samples.length - win) / hop + 1
    assert(got.length == expWins && got.head._1 == 0L)
    got.foreach { case (i, nw, e, silent) =>
      val slice = samples.slice(i.toInt * hop, math.min(i.toInt * hop + win, samples.length))
      assert(nw == slice.length && e == slice.map(v => v * v).sum && !silent,
        s"window $i")
    }
    // degenerate clip: shorter than one window → exactly one window
    val tiny = MultimodalOps.audioEnergy(spark,
      documentsFixture(Seq((4L, "ab", "en", "s")))).collect()
    assert(tiny.length == 1 && tiny.head.getAs[Long]("n_samples") == 1L)
    // fingerprint: LSB-first energy-delta signs over the same windows,
    // recomputed manually from the slices
    val energies = got.sortBy(_._1).map(_._3).toList
    val expFp = energies.zip(energies.tail).zipWithIndex.collect {
      case ((a, b), i) if i < MultimodalOps.AudioFpBits && b > a => 1L << i
    }.sum
    val fp = MultimodalOps.audioFingerprint(spark, dir).collect().head
    assert(fp.getAs[Long]("n_windows") == expWins.toLong &&
      fp.getAs[String]("afp") == "%08X".format(expFp), s"afp: $fp")
    // one-window clip: no delta → the all-zero flat-audio class
    val tinyFp = MultimodalOps.audioFingerprint(spark,
      documentsFixture(Seq((4L, "ab", "en", "s")))).collect().head
    assert(tinyFp.getAs[String]("afp") == "00000000")
  }

  test("corrupt containers quarantine (n_units = 0), never throw") {
    import spark.implicits._
    // a PNG whose IDAT bytes are garbage (inflate fails), a JPEG with a
    // truncated scan, and a foreign blob — the decode stage must emit
    // quarantine rows for all of them
    val goodPng = MultimodalOps.assets(spark,
      documentsFixture(Seq((6L, "ok body", "en", "s"))))
      .select("payload").collect().head.getAs[Array[Byte]](0)
    val brokenPng = goodPng.clone()
    // stomp the stored-deflate block header inside IDAT
    (41 until 52).foreach(i => brokenPng(i) = 0x77.toByte)
    val truncatedJpeg = MultimodalOps.assets(spark,
      documentsFixture(Seq((3L, "jpeg body", "en", "s"))))
      .select("payload").collect().head.getAs[Array[Byte]](0).take(120)
    val foreign = "not media at all".getBytes("UTF-8")
    // a HOSTILE header: valid signature/IHDR framing claiming 65535×65535
    // — h·(w+1) wraps Int and the raster allocation would be multi-GB;
    // the decoder must quarantine on the dimension cap, not throw/OOM
    val hostilePng = goodPng.clone()
    (16 until 24).foreach { i =>
      hostilePng(i) = (if (i % 4 < 2) 0x00 else 0xFF).toByte }
    val ds = Seq(
      MultimodalOps.Asset(1L, "image", brokenPng, 1, 1, 0),
      MultimodalOps.Asset(2L, "image", truncatedJpeg, 1, 1, 0),
      MultimodalOps.Asset(3L, "video", foreign, 1, 1, 0),
      MultimodalOps.Asset(4L, "image", hostilePng, 1, 1, 0)).toDS()
    val out = ds.mapPartitions(MultimodalOps.decodeBatchForTest).collect()
      .map(s => s.asset_id -> s).toMap
    assert(out.values.forall(s => s.n_units == 0L && s.u_sum.isEmpty))
    assert(out(1L).format == "png" && out(2L).format == "jpeg" &&
      out(3L).format == "unknown" && out(4L).format == "png")
  }

  test("FDICT zlib header quarantines instead of hanging the inflate loop") {
    import spark.implicits._
    // 0x78 0x20 passes the zlib FCHECK (0x7820 % 31 == 0) with FDICT set:
    // Inflater.inflate() then returns 0 forever with needsInput()==false
    // and finished()==false (it wants a preset dictionary). The decoder
    // must treat ANY zero-progress iteration as corrupt and quarantine —
    // a crafted payload must cost one pass, not a hung task
    val goodPng = MultimodalOps.assets(spark,
      documentsFixture(Seq((6L, "ok body", "en", "s"))))
      .select("payload").collect().head.getAs[Array[Byte]](0)
    val fdictPng = goodPng.clone()
    fdictPng(41) = 0x78.toByte // zlib CMF (unchanged)
    fdictPng(42) = 0x20.toByte // FLG with FDICT bit set, FCHECK valid
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = done.submit(new java.util.concurrent.Callable[MultimodalOps.DecodedStats] {
        def call() = MultimodalOps.decodeBatchForTest(Iterator(
          MultimodalOps.Asset(1L, "image", fdictPng, 1, 1, 0))).next()
      })
      val s = fut.get(30, java.util.concurrent.TimeUnit.SECONDS) // hang = fail
      assert(s.format == "png" && s.n_units == 0L && s.u_sum.isEmpty,
        s"FDICT payload must quarantine: $s")
    } finally done.shutdownNow()
  }

  test("reusable JPEG reader: bit-parity with ImageIO.read across reuse and after a failed decode") {
    // the r16-opt reader-reuse path must decode byte-identically to
    // ImageIO.read on every call of a reused reader, and must RECOVER
    // (recreate the reader) after garbage bytes made a decode throw
    val dir = documentsFixture(Seq(
      (3L, "a" * 57, "en", "s"),     // 58×58 JPEG
      (9L, "b" * 639, "en", "s")))   // 640×160 JPEG
    val payloads = MultimodalOps.assets(spark, dir)
      .select("payload").collect().map(_.getAs[Array[Byte]](0))
    def rasterOf(img: java.awt.image.BufferedImage): (Int, Int, Long) = {
      var sum = 0L
      val ra = img.getRaster
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        sum += ra.getSample(x, y, 0)
      (img.getWidth, img.getHeight, sum)
    }
    // two passes over both payloads on ONE thread: the second pass runs
    // entirely on the cached reader
    for (pass <- 1 to 2; b <- payloads) {
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      val got = MultimodalOps.readJpegForTest(b, 0, b.length)
      assert(got != null, s"pass $pass: cached reader rejected a valid JPEG")
      assert(rasterOf(got) == rasterOf(ref), s"pass $pass: decoded raster diverges")
    }
    // garbage (JPEG SOI then noise) must yield null AND not poison the
    // thread's reader for the next valid decode
    val garbage = Array[Byte](0xFF.toByte, 0xD8.toByte, 0x00, 0x12, 0x34, 0x56)
    assert(MultimodalOps.readJpegForTest(garbage, 0, garbage.length) == null)
    val after = MultimodalOps.readJpegForTest(payloads.head, 0, payloads.head.length)
    assert(after != null && rasterOf(after) == rasterOf(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payloads.head))),
      "reader did not recover after a failed decode")
  }

  test("reusable JPEG reader: a non-JPEG but ImageIO-decodable extent quarantines by design") {
    // The r16-opt reader resolves the JPEG plugin BY FORMAT NAME, where
    // the replaced ImageIO.read content-probed the stream — so a sample
    // extent in another ImageIO-decodable codec (a valid PNG here, which
    // ImageIO.read happily decodes) now quarantines instead of decoding.
    // That narrowing is intentional (a Motion-JPEG mdat's extents are
    // JPEG frames by spec; anything else is a malformed container) —
    // this case makes it explicit and pins that the reader survives it.
    val dir = documentsFixture(Seq((6L, "p" * 100, "en", "s"))) // id%6==0 → PNG
    val png = MultimodalOps.assets(spark, dir)
      .select("payload").collect().map(_.getAs[Array[Byte]](0)).head
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png)) != null,
      "fixture must be ImageIO-decodable for the case to mean anything")
    assert(MultimodalOps.readJpegForTest(png, 0, png.length) == null,
      "non-JPEG extent must quarantine (null), not decode through the JPEG reader")
    // and the thread's reader is not poisoned for the next valid JPEG
    val jdir = documentsFixture(Seq((3L, "a" * 57, "en", "s")))
    val jpeg = MultimodalOps.assets(spark, jdir)
      .select("payload").collect().map(_.getAs[Array[Byte]](0)).head
    assert(MultimodalOps.readJpegForTest(jpeg, 0, jpeg.length) != null,
      "reader did not recover after the quarantined PNG extent")
  }

  test("incremental decode: ledger digests served from cache, new digests decoded once per payload") {
    // ledger = id%10 < 8, batch = the rest. Asset 8 repeats the ledger
    // video byte-for-byte (same text, same container) → excluded; three
    // batch copies of a NEW clip decode ONCE with n_batch_copies = 3;
    // a new jpeg decodes with real pixel counts
    val dir = documentsFixture(Seq(
      (2L, "cached clip", "en", "s"),    // ledger video
      (8L, "cached clip", "en", "s"),    // batch video, digest in ledger
      (29L, "fresh clip", "en", "s"),    // batch video ×3 (29/59/89)
      (59L, "fresh clip", "en", "s"),
      (89L, "fresh clip", "en", "s"),
      (9L, "fresh pic", "en", "s")))     // batch jpeg, new digest
    val got = MultimodalOps.snapshotDecode(spark, dir).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Long]("n_batch_copies"), r.getAs[String]("modality"),
          r.getAs[String]("format"), r.getAs[Long]("n_units"))))
      .toMap
    assert(got.keySet == Set(9L, 29L), s"served-from-cache leak: $got")
    // the fresh clip REALLY decodes now (Motion-JPEG): 400 ms → one
    // sample → one variant-A frame of fwa×fha constant-gray pixels
    val v0 = java.security.MessageDigest.getInstance("MD5")
      .digest("fresh clip".getBytes("UTF-8"))(0) & 0xFF
    val (fwa, fha) = (8 * (1 + v0 % 4), 8 * (1 + (v0 / 4) % 4))
    assert(got(29L) == ((3L, "video", "mp4", (fwa * fha).toLong)))
    val n = "fresh pic".length
    assert(got(9L) == ((1L, "image", "jpeg", (n % 640 + 1).toLong * (n % 480 + 1))))
  }

  test("q_mm_pack conserves every document and every image exactly once, in order") {
    val packed = MultimodalOps.packMultimodal(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("volume"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("position"), r.getAs[String]("kind"),
        r.getAs[Long]("ref_id"), r.getAs[Long]("n_toks")))
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val texts = packed.filter(_._4 == "text").map(_._5)
    val images = packed.filter(_._4 == "image").map(_._5)
    assert(texts.toSet == docs && texts.length == docs.size,
      "every document packs exactly once")
    assert(images.toSet == docs.filter(_ % 3 == 0) &&
      images.length == docs.count(_ % 3 == 0),
      "every image-modality asset packs exactly once")
    // interleaving contract: within a (volume, seq), items are doc-id
    // ordered with each image immediately before its own text
    packed.groupBy(p => (p._1, p._2)).foreach { case (k, items) =>
      val sorted = items.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to items.length).toSeq,
        s"positions dense in $k")
      val keys = sorted.map(p => (p._5, if (p._4 == "image") 0 else 1))
      assert(keys.sortBy(identity).toSeq == keys.toSeq,
        s"doc order preserved in $k")
    }
    // budget: a sequence's tokens-before-last-item stays under budget
    // (offset-bucket packing may overflow by at most the last item)
    packed.groupBy(p => (p._1, p._2)).foreach { case (k, items) =>
      val tot = items.map(_._6).sum
      val last = items.maxBy(_._3)._6
      assert(tot - last < MultimodalOps.SeqBudget, s"pre-overflow budget in $k")
    }
  }

  test("perceptual hash: engine aHash equals an independent ImageIO-pixel recomputation") {
    // mixed PNG (gradient) and JPEG (constant) images, including tiny
    // dims with empty grid cells; the reference hash is recomputed here
    // from ImageIO's OWN decode of the same payload bytes
    val dir = documentsFixture(Seq(
      (6L, "p" * 300, "en", "s"),
      (12L, "q" * 7, "en", "s"),      // 8x8 PNG
      (18L, "r" * 192, "en", "s"),    // 1-row PNG (empty cells)
      (3L, "j" * 100, "en", "s"),     // JPEG
      (9L, "k" * 5, "en", "s")))      // tiny JPEG
    val payloads = MultimodalOps.assets(spark, dir)
      .select("asset_id", "payload").collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Array[Byte]]("payload"))
      .toMap
    def refHash(b: Array[Byte]): String = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img != null)
      val w = img.getWidth; val h = img.getHeight; val ra = img.getRaster
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) total += ra.getSample(x, y, 0)
      val bytes = new Array[Int](8)
      for (gy <- 0 until 8; gx <- 0 until 8) {
        val (x0, x1) = (gx * w / 8, (gx + 1) * w / 8)
        val (y0, y1) = (gy * h / 8, (gy + 1) * h / 8)
        var cs = 0L
        for (y <- y0 until y1; x <- x0 until x1) cs += ra.getSample(x, y, 0)
        if (cs * w.toLong * h > total * ((x1 - x0).toLong * (y1 - y0)))
          bytes(gy) |= 1 << gx
      }
      bytes.map("%02X".format(_)).mkString
    }
    val got = MultimodalOps.imageHashes(spark, dir).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[String]("format"), r.getAs[String]("phash")))).toMap
    assert(got.keySet == payloads.keySet)
    got.foreach { case (id, (_, ph)) =>
      assert(ph == refHash(payloads(id)), s"asset $id") }
    // constant-gray JPEGs are the classic aHash flat-image collision:
    // all-zero hash, so byte-distinct JPEGs land in one perceptual class
    assert(got(3L)._2 == "0000000000000000" && got(9L)._2 == "0000000000000000")
    val classes = MultimodalOps.phashDedup(spark, dir).collect()
      .map(r => (r.getAs[String]("phash"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("n_members"), r.getAs[Long]("n_formats")))
    val flat = classes.find(_._1 == "0000000000000000").get
    assert(flat._3 >= 2L, "byte-distinct flat images must share a class")
  }
}
