package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column handling for a training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, plus a
  * batch feature-extraction stage, the exact binary dedup + per-modality
  * dataset card, and the integer PLANNING ops (resize geometry, video
  * frame sampling, audio STFT windows, fetch coalescing, shard packing)
  * that decide WHAT media work happens before any byte is decoded.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB — but all the Spark-side plumbing is
  * real and tested: the asset schema, the binary payloads, the typed meta
  * struct, and the partition-batched extraction (mapPartitions over a typed
  * Dataset — the Scala analogue of mapInPandas: one iterator per partition,
  * amortizing model/codec init once per partition, which is exactly the
  * shape a real decoder needs at 100 TB).
  */
object MultimodalOps {

  case class Asset(asset_id: Long, modality: String, payload: Array[Byte],
      width: Long, height: Long, duration_ms: Long)
  case class AssetFeatures(asset_id: Long, modality: String, byte_len: Int,
      features: Array[Double])

  // ------------------------------------------- container framing (r13)
  // The fixture payloads carry GENUINE media wire framing — a parser
  // that doesn't actually read magic bytes and header fields cannot
  // answer q_mm_parse. Construction goes through HEX STRINGS on both
  // engines (Spark unhex ∘ concat ∘ lpad∘hex == DuckDB's identical
  // chain), which is what makes the blob byte-identical cross-engine
  // without either side being able to copy the other's binary literals.
  /** PNG signature + IHDR(len+type) prefix, then width/height BE u32s. */
  private[graft] val PngPreHex = "89504E470D0A1A0A" + "0000000D" + "49484452"
  /** bit-depth 8, color-type 2 (truecolor), compression/filter/interlace
    * 0, then a zeroed CRC placeholder — dimension parsers don't validate
    * CRC, and no offline engine can replay CRC-32 in SQL. */
  private[graft] val PngPostHex = "08" + "02" + "00" + "00" + "00" + "00000000"
  /** "WAVE" + "fmt " + fmt-chunk size 16 (LE) + PCM (1, LE16) + mono. */
  private[graft] val WavStaticHex = "57415645" + "666D7420" + "10000000" + "0100" + "0100"
  /** block-align 2 (LE16) + bits-per-sample 16 (LE16), then "data". */
  private[graft] val WavTailHex = "02001000" + "64617461"
  /** 16-byte `ftyp` box: BE size 16 + "ftyp" + "isom" + minor 0x200. */
  private[graft] val Mp4HeaderHex = "00000010" + "66747970" + "69736F6D" + "00000200"
  /** JPEG: SOI, then a canonical 18-byte JFIF APP0 segment (len 16,
    * "JFIF\0", version 1.1, aspect-ratio units, 1:1 density, no thumb). */
  private[graft] val JpegApp0Hex =
    "FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
      "0001" + "0001" + "00" + "00"
  /** SOF0 (baseline) prefix: marker, segment length 17, precision 8 —
    * the BE16 height and width follow, then the 3-component spec. */
  private[graft] val JpegSof0PreHex = "FFC0" + "0011" + "08"
  /** YCbCr component spec: (id, sampling, q-table) × 3 — 2x2/1x1/1x1. */
  private[graft] val JpegSofCompHex = "03" + "012200" + "021101" + "031101"
  val PngHeaderBytes = 33L  // 8 sig + 4 len + 4 type + 13 data + 4 crc
  val WavHeaderBytes = 44L  // the canonical RIFF/PCM header
  val Mp4HeaderBytes = 16L  // the ftyp box alone
  val JpegHeaderBytes = 39L // SOI(2) + APP0(18) + SOF0(19)
  /** Audio sample rates round-robined into the WAV headers. */
  val SampleRates = Seq(16000L, 22050L, 24000L, 44100L, 48000L)

  private def be32Hex(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
  private def be16Hex(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
  private def le32Hex(c: org.apache.spark.sql.Column) = {
    val h = be32Hex(c)
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Asset table synthesized from `documents`: payload = a REAL media
    * container (PNG / WAV / MP4-ftyp framing by modality, dimensions and
    * sample rate written into the actual header bytes) wrapping the
    * text's utf-8 bytes as the opaque body; modality round-robined,
    * metadata derived deterministically from n_chars — and REDUNDANTLY
    * present in the payload bytes, so the parse path (`q_mm_parse`,
    * [[resizePlan]]) can be checked against the meta columns. */
  def assets(spark: SparkSession, dir: String): DataFrame =
    assetsFrom(Tables.documents(spark, dir))

  /** The synthesis itself, over ANY documents-shaped frame — a streaming
    * source included (assetIntakeStream's stream≡batch spec applies this
    * to a readStream, so stream and batch literally share the shape). */
  def assetsFrom(docs: DataFrame): DataFrame = {
    val modality = element_at(typedlit(Seq("image", "audio", "video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val width = col("n_chars") % 640 + 1
    val height = col("n_chars") % 480 + 1
    val rate = element_at(typedlit(SampleRates),
      (col("doc_id") % 5 + 1).cast("int"))
    val body = col("text").cast("binary")
    val bodyLen = length(body).cast("long")
    val headerHex =
      // image assets split across the two dominant wire formats: even
      // image ids are PNG (u32 BE dims in IHDR), odd ones JPEG (u16 BE
      // dims in SOF0, HEIGHT first — the format's own field order)
      when(modality === "image" && col("doc_id") % 6 === 0,
        concat(lit(PngPreHex), be32Hex(width), be32Hex(height),
          lit(PngPostHex)))
      .when(modality === "image",
        concat(lit(JpegApp0Hex), lit(JpegSof0PreHex),
          be16Hex(height), be16Hex(width), lit(JpegSofCompHex)))
      .when(modality === "audio",
        concat(lit("52494646"), le32Hex(bodyLen + 36L), lit(WavStaticHex),
          le32Hex(rate), le32Hex(rate * 2), lit(WavTailHex),
          le32Hex(bodyLen)))
      .otherwise(lit(Mp4HeaderHex))
    docs.select(
      col("doc_id").as("asset_id"),
      modality.as("modality"),
      concat(unhex(headerHex), body).as("payload"),
      width.as("width"),
      height.as("height"),
      when(modality === "audio", rate).as("sample_rate"),
      (col("n_chars") * 40L).as("duration_ms"))
  }

  /** Feature dimension produced by the (stub) decoder. */
  val FeatureDim = 8

  /** STUB decode/feature-extract: stands in for an image/audio decoder that
    * is not installed in this container. Deterministic per payload —
    * an 8-bin byte histogram normalized by length, over the FULL container
    * bytes (since r13 the payloads carry REAL PNG/WAV/MP4 framing — magic
    * numbers, BE/LE header fields — so a real decoder dropped in here
    * receives genuinely parseable containers; header PROBING is already
    * real, see [[headerParse]]/MediaHeaderParse). The batch shape is the
    * production one: mapPartitions gives one iterator per partition, so a
    * real codec/model would be initialized once per partition, not per
    * row (same contract as mapInPandas batches).
    */
  // STUB: replace the body with a real decoder (e.g. JNI codec / DL model)
  // when the runtime has one; keep the per-partition init pattern.
  private def stubDecodeBatch(batch: Iterator[Asset]): Iterator[AssetFeatures] = {
    // (real code would init the codec/model HERE, once per partition)
    batch.map { a =>
      val hist = new Array[Double](FeatureDim)
      var i = 0
      while (i < a.payload.length) {
        hist((a.payload(i) & 0xFF) % FeatureDim) += 1.0
        i += 1
      }
      val n = math.max(a.payload.length, 1).toDouble
      AssetFeatures(a.asset_id, a.modality, a.payload.length,
        hist.map(_ / n))
    }
  }

  /** Partition-batched feature extraction over the asset table. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets(spark, dir).as[Asset].mapPartitions(stubDecodeBatch)
  }

  /** Metadata/byte-length projection — the oracle-checkable part of the
    * multimodal plumbing (byte lengths of the binary payloads + meta;
    * byte_len includes the container header the payload now carries). */
  def assetMeta(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .select(col("asset_id"), col("modality"),
        length(col("payload")).cast("long").as("byte_len"),
        col("width"), col("height"), col("sample_rate"),
        col("duration_ms"))
      .orderBy("asset_id")

  /** HEADER PARSE over the payload BYTES — the native
    * [[org.apache.spark.sql.graftext.MediaHeaderParse]] probe reading
    * format magic, PNG BE dimensions, WAV LE sample rate and data size,
    * and the ftyp box size, per asset. The oracle twin re-parses the
    * identically-constructed blob from its hex image, so a synthesis/
    * parse disagreement on ANY byte breaks the gate. Pure map-side scan:
    * at 100 TB this is the probe pass that runs WITH the ingest read —
    * payload bytes are consumed where they already are, never moved. */
  def headerParse(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftext.MediaColumns.mm_header_parse
    assets(spark, dir)
      .select(col("asset_id"), col("modality"),
        mm_header_parse(col("payload")).as("p"))
      .select(col("asset_id"), col("modality"),
        col("p.format").as("format"),
        col("p.width").as("width"),
        col("p.height").as("height"),
        col("p.sample_rate").as("sample_rate"),
        col("p.body_bytes").as("body_bytes"))
      .orderBy("asset_id")
  }

  /** Feature stats through the stub decoder. Oracle-checked: the stub's
    * byte-histogram math is replayed in DuckDB over `hex(encode(text))`
    * byte pairs, and the f0/f1 values are raw count/len double divisions —
    * the same exact integers divided the same way on both sides, so they
    * are BIT-identical (no rounding needed; rounding would only add a
    * half-up-vs-half-even parity hazard). */
  def featureStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, dir).toDF()
      .select(col("asset_id"), col("modality"), col("byte_len"),
        element_at(col("features"), 1).as("f0"),
        element_at(col("features"), 2).as("f1"))
      .orderBy("asset_id")
  }

  /** End-to-end multimodal retrieval: stub-decoded features → cosine
    * top-3 within each modality block (the decode → embed → ANN pipeline
    * a multimodal training set needs, with the modality playing the
    * ANN-block role). Feature vectors come from the typed Dataset path
    * and are cast to float[] for the native dot expression.
    * Driver-oracle-checked end-to-end: DuckDB replays the byte-histogram
    * features (as q_mm_features), the double→float cast (same IEEE
    * round-to-nearest in both engines) and the cosine ranking
    * (list_cosine_similarity — parity proven by q_ann_bruteforce); the
    * zero-norm exclusion is exactly `byte_len > 0` (a non-empty payload
    * always fills some bin). */
  def featureAnn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = extractFeatures(spark, dir).toDF()
      .select(col("asset_id"), col("modality"),
        // array-level cast, NOT transform(x -> cast): Cast on an array
        // stays inside whole-stage codegen; the lambda form is the one
        // interpreted HOF the engine's invariant bans on per-asset paths
        col("features").cast("array<float>").as("fv"))
      .withColumn("nrm", VectorOps.norm(col("fv")))
      // zero-norm vectors (empty payloads) produce NaN cosines, which
      // ORDER BY DESC would rank FIRST — a junk asset would beat every
      // real neighbor. Exclude them from both sides of the retrieval.
      .where(col("nrm") > 0.0)
    val q = feats.where(col("asset_id") < 10)
      .select(col("asset_id").as("query_id"), col("modality").as("q_mod"),
        col("fv").as("qv"), col("nrm").as("nq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    feats.join(broadcast(q),
        col("modality") === col("q_mod") && col("asset_id") =!= col("query_id"))
      .select(col("query_id"), col("asset_id").as("neighbor_id"),
        VectorOps.cosinePrenorm(col("qv"), col("fv"), col("nq"), col("nrm"))
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Target shard payload bytes (WebDataset-style tar shards would use
    * ~100 MB–1 GB; small here so the verify SFs produce multiple shards). */
  val ShardBytes = 65536L
  /** Resize target: longest side after resize (the CLIP/ViT-style
    * preprocessing budget). Never upscale. */
  val ResizeMaxSide = 224L

  /** RESIZE PLAN for image assets: the output geometry each image gets
    * under an aspect-preserving max-side-224 policy — the planning half
    * of the resize stage (the pixel work is the stub decoder's job; WHAT
    * to decode into is this). Integer arithmetic only (scaled dims are
    * `(side·224) DIV max_side`, floored, clamped to ≥1), so the plan is
    * engine-replayable and deterministic; pure map-side over the asset
    * scan — the 100 TB shape is a narrow projection that never touches
    * payload bytes. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftext.MediaColumns.mm_header_parse
    // dims come from the PAYLOAD BYTES via the native header probe, not
    // from the fixture meta columns — the plan is computed the way a real
    // pipeline computes it (probe the container, then plan the decode)
    assets(spark, dir).where(col("modality") === "image")
      .select(col("asset_id"), mm_header_parse(col("payload")).as("p"))
      .select(col("asset_id"),
        col("p.width").as("width"), col("p.height").as("height"))
      .withColumn("max_side", greatest(col("width"), col("height")))
      .withColumn("out_w",
        when(col("max_side") <= ResizeMaxSide, col("width"))
          .otherwise(greatest(lit(1L),
            expr(s"(width * $ResizeMaxSide) DIV max_side"))))
      .withColumn("out_h",
        when(col("max_side") <= ResizeMaxSide, col("height"))
          .otherwise(greatest(lit(1L),
            expr(s"(height * $ResizeMaxSide) DIV max_side"))))
      .withColumn("scaled", col("max_side") > ResizeMaxSide)
      .orderBy("asset_id")
  }

  /** Frame-sampling budget: at most this many frames per video. */
  val MaxFrames = 16L

  /** FRAME-SAMPLE PLAN for video assets: which timestamps to sample
    * (uniform, ≤[[MaxFrames]], at least one) and WHICH BYTE OFFSET of
    * the payload each maps to — at 100 TB frame sampling is first an
    * I/O plan (which byte ranges to fetch from object storage) before it
    * is a decode. All integer arithmetic (`(idx·duration) DIV n`,
    * proportional byte offset with a zero-duration guard), replayable;
    * the explode fans out ≤16 rows per asset — bounded, map-side. */
  def framePlan(spark: SparkSession, dir: String): DataFrame =
    framePlanWithLen(spark, dir)
      .select(col("asset_id"), col("n_frames"), col("frame_idx"),
        col("t_ms"), col("byte_offset"))
      .orderBy("asset_id", "frame_idx")

  /** [[framePlan]] before its final projection, keeping `byte_len` — so
    * [[fetchPlan]] doesn't need a SECOND payload-bearing scan + join just
    * to recover a length the plan already computed. */
  private def framePlanWithLen(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).where(col("modality") === "video")
      .select(col("asset_id"), col("duration_ms"),
        length(col("payload")).cast("long").as("byte_len"))
      .withColumn("n_frames",
        expr(s"least($MaxFrames, duration_ms DIV 1000 + 1)"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1)))
      .withColumn("t_ms", expr("(frame_idx * duration_ms) DIV n_frames"))
      .withColumn("byte_offset",
        expr("(t_ms * byte_len) DIV greatest(duration_ms, 1)"))

  /** Manifest volume width: shards are scoped per (modality, volume =
    * asset_id DIV width), so the packing window never sorts more than one
    * volume on one task — the same per-scope parallelization as
    * PipelineOps.packSequences' per-shard windows. */
  val VolumeAssets = 100000L

  /** Shard manifest: assign every asset to a byte-budgeted output shard
    * and compute its offset within the shard — the WebDataset-style
    * tar-packing manifest a multimodal training pipeline materializes
    * before the (IO-bound) shard writer runs. Assignment is the
    * offset-bucket approximation also used by `q_pack_sequences`:
    * shard = floor(preceding-bytes / target), so a shard can overflow its
    * budget by at most one asset — in exchange the whole manifest is one
    * window pass (running sum of byte lengths per (modality, volume)),
    * deterministic, and engine-exact (pure integer arithmetic). */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("modality", "volume").orderBy("asset_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    assets(spark, dir)
      .select(col("asset_id"), col("modality"),
        expr(s"asset_id DIV $VolumeAssets").as("volume"),
        length(col("payload")).cast("long").as("byte_len"))
      .withColumn("cum_before", coalesce(sum(col("byte_len")).over(w), lit(0L)))
      .select(col("asset_id"), col("modality"), col("volume"), col("byte_len"),
        expr(s"cum_before DIV $ShardBytes").as("shard_id"),
        expr(s"cum_before % $ShardBytes").as("offset_in_shard"))
      .orderBy("modality", "asset_id")
  }

  /** EXACT BINARY DEDUP over the asset payloads — the image-pipeline
    * standard (LAION/DataComp dedupe stage): hash the OPAQUE BYTES, group,
    * keep the lowest asset id, price the duplicate storage. Blocked by
    * modality (an image is never compared against an audio clip — the
    * same blocking-key role `source` plays in the text dedups). One
    * shuffle on (modality, md5(payload)) with map-side partial
    * aggregation; payload bytes never move — only their 16-byte digests
    * do, which is the whole reason this survives 100 TB of media.
    * `dup_bytes` = (n_copies−1) × byte_len (copies are byte-identical,
    * so one length prices them all): the bytes a dedup pass would free. */
  def assetDedup(spark: SparkSession, dir: String): DataFrame =
    // md5 over the payload's HEX image, not the raw bytes: DuckDB 1.0 has
    // only md5(VARCHAR), and the framed payload is no longer valid utf-8.
    // hex() is injective, so the dedup answer is identical; the
    // production path (x_mm_dedup_fast) still hashes the raw bytes.
    assetDedupWith(spark, dir, c => md5(hex(c)))

  /** The one dedup dataflow, parameterized by the fingerprint function —
    * the chunkScrubWith/minhashLshImpl pattern: a semantics change (the
    * pricing, the blocking key) can never half-apply to the md5/xxhash
    * pair. */
  private def assetDedupWith(spark: SparkSession, dir: String,
      fp: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame =
    assets(spark, dir)
      .select(col("asset_id"), col("modality"),
        fp(col("payload")).as("payload_fp"),
        length(col("payload")).cast("long").as("byte_len"))
      .groupBy(col("modality"), col("payload_fp"))
      .agg(min(col("asset_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        min(col("byte_len")).as("byte_len"))
      .select(col("modality"), col("payload_fp"), col("keep_id"),
        col("n_copies"),
        ((col("n_copies") - 1) * col("byte_len")).as("dup_bytes"))
      .orderBy("modality", "keep_id")

  /** Production path of [[assetDedup]]: xxhash64 instead of md5 — half
    * the digest bytes and a far cheaper non-cryptographic hash, the right
    * trade for non-adversarial corpus dedup at 100 TB (md5 stays in the
    * REGISTERED query because DuckDB has no xxhash64 to replay). Bench-
    * only (`x_mm_dedup_fast`); spec pins the group structure (keep_id,
    * n_copies, dup_bytes per modality) identical to the md5 form. */
  def assetDedupFast(spark: SparkSession, dir: String): DataFrame =
    assetDedupWith(spark, dir, c => xxhash64(c))

  /** DATASET CARD for the media corpus, per modality — the numbers a
    * multimodal training set publishes (and a curation pass reads before
    * deciding what to dedup): asset and distinct-payload counts, the
    * duplicate fraction, total stored bytes vs the bytes a dedup pass
    * would keep, and the total media duration. Two exact integer
    * aggregations (per-(modality, digest) rollup, then per modality);
    * `dup_frac` is one double division of two exact longs, so it is
    * bit-identical across engines. Scale shape: the same digest-grain
    * groupBy as [[assetDedup]] — payload bytes never shuffle. */
  def assetCard(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .select(col("modality"), md5(hex(col("payload"))).as("payload_fp"),
        length(col("payload")).cast("long").as("byte_len"),
        col("duration_ms"))
      .groupBy(col("modality"), col("payload_fp"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("byte_len")).as("byte_len"),
        sum(col("duration_ms")).as("dur_sum"))
      .groupBy(col("modality"))
      .agg(sum(col("n_copies")).as("n_assets"),
        count(lit(1)).as("n_payloads"),
        sum(col("n_copies") * col("byte_len")).as("total_bytes"),
        sum(col("byte_len")).as("kept_bytes"),
        sum(col("dur_sum")).as("total_duration_ms"))
      .select(col("modality"), col("n_assets"), col("n_payloads"),
        (lit(1.0) - col("n_payloads").cast("double") /
          col("n_assets")).as("dup_frac"),
        col("total_bytes"),
        (col("total_bytes") - col("kept_bytes")).as("dup_bytes"),
        col("total_duration_ms"))
      .orderBy("modality")

  /** Spectrogram window geometry (Whisper-style 25 ms frames scale to a
    * 400 ms window / 160 ms hop at this corpus's ms grain). */
  val WinMs = 400L
  val HopMs = 160L
  /** Per-asset window cap — long audio is CHUNKED in real pipelines
    * (Whisper's 30 s segments); the cap bounds the explode fan-out the
    * same way MaxFrames bounds the video plan. */
  val MaxWindows = 64L

  /** WINDOW PLAN for audio assets: which (start, end) ms slices feed the
    * spectrogram/encoder — the audio twin of [[framePlan]], with OVERLAP
    * (hop < window, the STFT shape) where frames are point samples.
    * Short clips (< one window) still get one zero-padded window; the
    * explode fans out ≤ [[MaxWindows]] rows per asset. All integer
    * arithmetic, engine-replayable; map-side over the asset scan. */
  def windowPlan(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).where(col("modality") === "audio")
      .select(col("asset_id"), col("duration_ms"))
      .withColumn("n_windows",
        expr(s"""CASE WHEN duration_ms >= $WinMs
                 THEN least($MaxWindows, (duration_ms - $WinMs) DIV $HopMs + 1)
                 ELSE 1 END"""))
      .withColumn("win_idx", explode(sequence(lit(0L), col("n_windows") - 1)))
      .withColumn("start_ms", expr(s"win_idx * $HopMs"))
      .withColumn("end_ms", expr(s"least(start_ms + $WinMs, duration_ms)"))
      .select(col("asset_id"), col("n_windows"), col("win_idx"),
        col("start_ms"), col("end_ms"))
      .orderBy("asset_id", "win_idx")

  /** Bytes one frame fetch reads (container-level slice around the
    * sampled timestamp) and the gap under which two fetches coalesce
    * into one object-store GET. */
  val FrameBytes = 4096L
  val CoalesceGap = 512L

  /** FETCH PLAN: coalesce [[framePlan]]'s per-frame byte ranges into
    * object-store GET requests — at 100 TB, frame sampling is an I/O
    * problem before it is a decode problem, and issuing one ranged GET
    * per frame (16 per video) would 16× the request bill for bytes that
    * are usually adjacent. Ranges [off, off+FrameBytes) merge when the
    * next start is within [[CoalesceGap]] of the previous end (paying
    * ≤ gap wasted bytes to save a round trip — the classic vectored-IO
    * trade). Frame offsets are monotone per asset (timestamps are), so
    * one lag() flags range starts and a running sum numbers them: two
    * window passes + one groupBy, ALL partitioned by asset — no global
    * shuffle beyond the hash on asset_id. */
  def fetchPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byIdx = Window.partitionBy("asset_id").orderBy("frame_idx")
    val ranges = framePlanWithLen(spark, dir)
      .select(col("asset_id"), col("frame_idx"), col("byte_offset"),
        expr(s"least(byte_offset + $FrameBytes, byte_len)").as("byte_end"))
      .withColumn("prev_end", lag(col("byte_end"), 1).over(byIdx))
      .withColumn("new_range",
        when(col("prev_end").isNull ||
          col("byte_offset") > col("prev_end") + CoalesceGap, 1L)
          .otherwise(0L))
      .withColumn("range_id", sum(col("new_range")).over(
        byIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
    ranges.groupBy("asset_id", "range_id")
      .agg(min(col("byte_offset")).as("range_start"),
        max(col("byte_end")).as("range_end"),
        count(lit(1)).as("n_frames"))
      .withColumn("io_bytes", col("range_end") - col("range_start"))
      .orderBy("asset_id", "range_id")
  }

  /** ASSET VALIDATION REPORT — the QA pass a media pipeline runs between
    * ingest and decode, built entirely on the header PROBE: per modality,
    * how many assets (a) carry the format their modality claims, (b) have
    * header FIELDS agreeing with the catalog metadata (PNG dims, WAV
    * sample rate), (c) have a self-consistent size story (parsed body
    * bytes + header == stored bytes — for WAV that checks the data-size
    * FIELD against reality), and how many trip the decode-budget flags
    * (clips shorter than one STFT window; videos past the frame cap).
    * Map-side flags + one small groupBy: nothing but booleans shuffle. */
  def assetValidate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftext.MediaColumns.mm_header_parse
    // header size by PARSED format (image splits across png/jpeg)
    val hdrLen = typedlit(Map(
      "png" -> PngHeaderBytes, "jpeg" -> JpegHeaderBytes,
      "wav" -> WavHeaderBytes, "mp4" -> Mp4HeaderBytes))
    val flags = assets(spark, dir)
      .select(col("asset_id"), col("modality"),
        length(col("payload")).cast("long").as("byte_len"),
        col("width"), col("height"), col("sample_rate"), col("duration_ms"),
        mm_header_parse(col("payload")).as("p"))
      .select(col("modality"),
        // the format each asset SHOULD carry: image ids split across
        // png (even image ids) and jpeg (odd), audio wav, video mp4
        (col("p.format") ===
          when(col("modality") === "image",
            when(col("asset_id") % 6 === 0, "png").otherwise("jpeg"))
          .when(col("modality") === "audio", lit("wav"))
          .otherwise(lit("mp4"))).as("format_ok"),
        when(col("modality") === "image",
            col("p.width") === col("width") &&
            col("p.height") === col("height"))
          .when(col("modality") === "audio",
            col("p.sample_rate") === col("sample_rate"))
          .otherwise(lit(true)).as("fields_ok"),
        (col("p.body_bytes") + element_at(hdrLen, col("p.format"))
          === col("byte_len")).as("size_ok"),
        (col("modality") === "audio" && col("duration_ms") < WinMs)
          .as("short_clip"),
        (col("modality") === "video" &&
          expr("duration_ms DIV 1000 + 1") > MaxFrames).as("over_cap"))
    flags.groupBy("modality")
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("format_ok"), 1L).otherwise(0L)).as("n_format_ok"),
        sum(when(col("fields_ok"), 1L).otherwise(0L)).as("n_fields_ok"),
        sum(when(col("size_ok"), 1L).otherwise(0L)).as("n_size_ok"),
        sum(when(col("short_clip"), 1L).otherwise(0L)).as("n_short_clips"),
        sum(when(col("over_cap"), 1L).otherwise(0L)).as("n_over_cap"))
      .orderBy("modality")
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_parse" -> (headerParse _),
    "q_mm_validate" -> (assetValidate _),
    "q_mm_meta" -> (assetMeta _),
    "q_mm_features" -> (featureStats _),
    "q_mm_feature_ann" -> (featureAnn _),
    "q_mm_shards" -> (shardManifest _),
    "q_mm_resize" -> (resizePlan _),
    "q_mm_frames" -> (framePlan _),
    "q_mm_dedup" -> (assetDedup _),
    "q_mm_card" -> (assetCard _),
    "q_mm_windows" -> (windowPlan _),
    "q_mm_fetch_plan" -> (fetchPlan _),
  )

  /** The DuckDB image of the asset synthesis, GENERATED from the same
    * framing constants as [[assetsFrom]] — the oracle builds the payload
    * through the IDENTICAL hex chain (lpad∘hex for BE fields, the
    * 4-substr pair swap for LE), so `phx` is character-for-character the
    * hex of the Spark payload and every downstream oracle (digest,
    * histogram, PARSE) reads the same bytes. Exposed CTEs: `assets`
    * (modality/meta/phx) and `a` (adds byte_len = header + body). */
  private lazy val AssetSqlCte: String = {
    def be(e: String) = s"lpad(hex($e), 8, '0')"
    def le(e: String) = {
      val h = be(e)
      s"substr($h,7,2)||substr($h,5,2)||substr($h,3,2)||substr($h,1,2)"
    }
    s"""ax AS (
         SELECT doc_id AS asset_id,
                CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                ELSE 'video' END AS modality,
                n_chars % 640 + 1 AS width,
                n_chars % 480 + 1 AS height,
                CASE doc_id % 5 WHEN 0 THEN 16000 WHEN 1 THEN 22050
                     WHEN 2 THEN 24000 WHEN 3 THEN 44100
                     ELSE 48000 END AS rate,
                n_chars * 40 AS duration_ms,
                CAST(octet_length(encode(text)) AS BIGINT) AS body_len,
                hex(encode(text)) AS body_hex
         FROM documents),
       assets AS (
         SELECT asset_id, modality, width, height, rate, duration_ms,
                body_len,
                CASE WHEN modality = 'image' AND asset_id % 6 = 0
                     THEN '$PngPreHex' || ${be("width")} ||
                          ${be("height")} || '$PngPostHex'
                     WHEN modality = 'image'
                     THEN '$JpegApp0Hex' || '$JpegSof0PreHex' ||
                          lpad(hex(height), 4, '0') ||
                          lpad(hex(width), 4, '0') || '$JpegSofCompHex'
                     WHEN modality = 'audio'
                     THEN '52494646' || ${le("body_len + 36")} ||
                          '$WavStaticHex' || ${le("rate")} ||
                          ${le("rate * 2")} || '$WavTailHex' ||
                          ${le("body_len")}
                  ELSE '$Mp4HeaderHex'
                END || body_hex AS phx
         FROM ax),
       a AS (
         SELECT *, CAST(length(phx) // 2 AS BIGINT) AS byte_len
         FROM assets)"""
  }

  /** DuckDB replay of [[featureAnn]] — GENERATED over the FeatureDim bins
    * so the histogram/float-cast chain can't drift from the stub. */
  private lazy val FeatureAnnSql: String = {
    val binSums = (0 until FeatureDim)
      .map(i => s"sum(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS c$i")
      .mkString(",\n                  ")
    val fvList = (0 until FeatureDim)
      .map(i => s"CAST(CAST(c.c$i AS DOUBLE) / e.n AS FLOAT)")
      .mkString("[", ",\n                  ", "]")
    s"""WITH $AssetSqlCte,
         enc AS (
           SELECT asset_id, modality, phx AS hx,
                  CAST(byte_len AS INT) AS n
           FROM a),
         cnt AS (
           SELECT asset_id,
                  $binSums
           FROM (SELECT asset_id,
                        ('0x' || substr(hx, 2*i - 1, 2))::INT % $FeatureDim AS bin
                 FROM enc, unnest(generate_series(1, n)) AS u(i))
           GROUP BY asset_id),
         f AS (
           SELECT e.asset_id, e.modality,
                  $fvList AS v
           FROM enc e JOIN cnt c USING (asset_id)
           WHERE e.n > 0),
         q AS (
           SELECT asset_id AS query_id, modality AS q_mod, v AS qv
           FROM f WHERE asset_id < 10),
         s AS (
           SELECT q.query_id, f.asset_id AS neighbor_id,
                  list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                         CAST(f.v AS DOUBLE[])) AS cos_sim
           FROM q JOIN f ON f.modality = q.q_mod AND f.asset_id != q.query_id)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
           FROM s)
         WHERE rank <= 3 ORDER BY query_id, rank"""
  }

  val oracleSql: Map[String, String] = Map(
    "q_mm_feature_ann" -> FeatureAnnSql,
    // resize plan now reads dims by PARSING the PNG IHDR out of the
    // constructed blob's hex image — both engines read the same BYTES,
    // not the same fixture arithmetic; then the same DIV/greatest/CASE
    "q_mm_resize" ->
      s"""WITH $AssetSqlCte,
         i AS (
           SELECT asset_id,
                  CASE WHEN substr(phx, 1, 4) = 'FFD8'
                       THEN ('0x' || substr(phx, 55, 4))::BIGINT
                       ELSE ('0x' || substr(phx, 33, 8))::BIGINT
                  END AS width,
                  CASE WHEN substr(phx, 1, 4) = 'FFD8'
                       THEN ('0x' || substr(phx, 51, 4))::BIGINT
                       ELSE ('0x' || substr(phx, 41, 8))::BIGINT
                  END AS height
           FROM a
           WHERE substr(phx, 1, 16) = '89504E470D0A1A0A'
              OR (substr(phx, 1, 4) = 'FFD8'
                  AND substr(phx, 41, 4) = 'FFC0')),
         m AS (SELECT *, greatest(width, height) AS max_side FROM i)
         SELECT asset_id, width, height, max_side,
                CASE WHEN max_side <= $ResizeMaxSide THEN width
                     ELSE greatest(1, (width * $ResizeMaxSide) // max_side)
                END AS out_w,
                CASE WHEN max_side <= $ResizeMaxSide THEN height
                     ELSE greatest(1, (height * $ResizeMaxSide) // max_side)
                END AS out_h,
                max_side > $ResizeMaxSide AS scaled
         FROM m ORDER BY asset_id""",
    // validation report: re-parse the blob's hex image, compare against
    // the catalog columns the synthesis wrote, aggregate the flags
    "q_mm_validate" ->
      s"""WITH $AssetSqlCte,
         p AS (
           SELECT *,
             substr(phx,1,16) = '89504E470D0A1A0A'
               AND length(phx) >= 66
               AND substr(phx,25,8) = '49484452' AS is_png,
             substr(phx,1,8) = '52494646'
               AND length(phx) >= 88
               AND substr(phx,17,8) = '57415645'
               AND substr(phx,25,8) = '666D7420' AS is_wav,
             length(phx) >= 32
               AND substr(phx,9,8) = '66747970'
               AND ('0x' || substr(phx,1,8))::BIGINT
                     BETWEEN 8 AND length(phx) // 2 AS is_mp4,
             substr(phx,1,4) = 'FFD8'
               AND length(phx) >= 78
               AND substr(phx,41,4) = 'FFC0' AS is_jpeg
           FROM a),
         f AS (
           SELECT modality,
             CASE WHEN is_png THEN 'png' WHEN is_wav THEN 'wav'
                  WHEN is_mp4 THEN 'mp4' WHEN is_jpeg THEN 'jpeg' END =
               CASE WHEN modality = 'image' AND asset_id % 6 = 0 THEN 'png'
                    WHEN modality = 'image' THEN 'jpeg'
                    WHEN modality = 'audio' THEN 'wav'
                    ELSE 'mp4' END AS format_ok,
             CASE WHEN modality = 'image' AND is_png THEN
                 ('0x' || substr(phx,33,8))::BIGINT = width
                 AND ('0x' || substr(phx,41,8))::BIGINT = height
               WHEN modality = 'image' THEN
                 is_jpeg
                 AND ('0x' || substr(phx,55,4))::BIGINT = width
                 AND ('0x' || substr(phx,51,4))::BIGINT = height
               WHEN modality = 'audio' THEN
                 ('0x' || substr(phx,55,2) || substr(phx,53,2)
                  || substr(phx,51,2) || substr(phx,49,2))::BIGINT = rate
               ELSE TRUE END AS fields_ok,
             CASE WHEN is_png THEN byte_len - $PngHeaderBytes
                  WHEN is_wav
                  THEN ('0x' || substr(phx,87,2) || substr(phx,85,2)
                        || substr(phx,83,2) || substr(phx,81,2))::BIGINT
                  WHEN is_mp4
                  THEN byte_len - ('0x' || substr(phx,1,8))::BIGINT
                  WHEN is_jpeg THEN byte_len - $JpegHeaderBytes
             END + CASE WHEN is_png THEN $PngHeaderBytes
                    WHEN is_jpeg THEN $JpegHeaderBytes
                    WHEN is_wav THEN $WavHeaderBytes
                    WHEN is_mp4 THEN $Mp4HeaderBytes END
               = byte_len AS size_ok,
             modality = 'audio' AND duration_ms < $WinMs AS short_clip,
             modality = 'video'
               AND duration_ms // 1000 + 1 > $MaxFrames AS over_cap
           FROM p)
         SELECT modality,
                count(*) AS n_assets,
                CAST(sum(CASE WHEN format_ok THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_format_ok,
                CAST(sum(CASE WHEN fields_ok THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_fields_ok,
                CAST(sum(CASE WHEN size_ok THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_size_ok,
                CAST(sum(CASE WHEN short_clip THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_short_clips,
                CAST(sum(CASE WHEN over_cap THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_over_cap
         FROM f GROUP BY modality ORDER BY modality""",
    // header parse: the oracle re-parses the identically-constructed
    // blob from its hex image — format by magic, PNG BE u32 dims, WAV
    // LE u32 rate/data-size (the 4-substr pair swap), ftyp box size —
    // in the SAME precedence order as the native expression
    "q_mm_parse" ->
      s"""WITH $AssetSqlCte,
         p AS (
           SELECT *,
             substr(phx,1,16) = '89504E470D0A1A0A'
               AND length(phx) >= 66
               AND substr(phx,25,8) = '49484452' AS is_png,
             substr(phx,1,8) = '52494646'
               AND length(phx) >= 88
               AND substr(phx,17,8) = '57415645'
               AND substr(phx,25,8) = '666D7420' AS is_wav,
             length(phx) >= 32
               AND substr(phx,9,8) = '66747970'
               AND ('0x' || substr(phx,1,8))::BIGINT
                     BETWEEN 8 AND length(phx) // 2 AS is_mp4,
             -- fixed-offset image of the walker: the constructed layout
             -- is always SOI + APP0(16) + SOF0, so SOF0 sits at byte 20
             substr(phx,1,4) = 'FFD8'
               AND length(phx) >= 78
               AND substr(phx,41,4) = 'FFC0' AS is_jpeg
           FROM a)
         SELECT asset_id, modality,
                CASE WHEN is_png THEN 'png' WHEN is_wav THEN 'wav'
                     WHEN is_mp4 THEN 'mp4'
                     WHEN is_jpeg THEN 'jpeg' END AS format,
                CASE WHEN is_png
                     THEN ('0x' || substr(phx,33,8))::BIGINT
                     WHEN is_jpeg
                     THEN ('0x' || substr(phx,55,4))::BIGINT END AS width,
                CASE WHEN is_png
                     THEN ('0x' || substr(phx,41,8))::BIGINT
                     WHEN is_jpeg
                     THEN ('0x' || substr(phx,51,4))::BIGINT END AS height,
                CASE WHEN is_wav
                     THEN ('0x' || substr(phx,55,2) || substr(phx,53,2)
                           || substr(phx,51,2) || substr(phx,49,2))::BIGINT
                END AS sample_rate,
                CASE WHEN is_png THEN byte_len - $PngHeaderBytes
                     WHEN is_wav
                     THEN ('0x' || substr(phx,87,2) || substr(phx,85,2)
                           || substr(phx,83,2) || substr(phx,81,2))::BIGINT
                     WHEN is_mp4
                     THEN byte_len - ('0x' || substr(phx,1,8))::BIGINT
                     WHEN is_jpeg THEN byte_len - $JpegHeaderBytes
                END AS body_bytes
         FROM p ORDER BY asset_id""",
    // integer frame plan: uniform timestamps + proportional byte offsets
    // (byte_len is the FULL container length, header included — ranged
    // GETs address the container file, not the logical body)
    "q_mm_frames" ->
      s"""WITH $AssetSqlCte,
         v AS (
           SELECT asset_id, duration_ms, byte_len
           FROM a WHERE modality = 'video'),
         f AS (
           SELECT asset_id, duration_ms, byte_len,
                  least($MaxFrames, duration_ms // 1000 + 1) AS n_frames
           FROM v),
         g AS (
           SELECT asset_id, n_frames, CAST(u.i AS BIGINT) AS frame_idx,
                  (u.i * duration_ms) // n_frames AS t_ms,
                  duration_ms, byte_len
           FROM f, unnest(generate_series(0, n_frames - 1)) AS u(i))
         SELECT asset_id, n_frames, frame_idx, t_ms,
                (t_ms * byte_len) // greatest(duration_ms, 1) AS byte_offset
         FROM g ORDER BY asset_id, frame_idx""",
    // per-modality dataset card off the same digest-grain rollup as the
    // dedup; every emitted number is an exact long (or one double
    // division of two exact longs), BIGINT/DOUBLE-cast on both sides
    "q_mm_card" ->
      s"""WITH $AssetSqlCte,
         c AS (
           SELECT modality, md5(phx) AS payload_fp, byte_len, duration_ms
           FROM a),
         g AS (
           SELECT modality, payload_fp,
                  count(*) AS n_copies,
                  min(byte_len) AS byte_len,
                  CAST(sum(duration_ms) AS BIGINT) AS dur_sum
           FROM c GROUP BY modality, payload_fp)
         SELECT modality,
                CAST(sum(n_copies) AS BIGINT) AS n_assets,
                count(*) AS n_payloads,
                1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(n_copies) AS DOUBLE)
                  AS dup_frac,
                CAST(sum(n_copies * byte_len) AS BIGINT) AS total_bytes,
                CAST(sum(n_copies * byte_len) - sum(byte_len) AS BIGINT)
                  AS dup_bytes,
                CAST(sum(dur_sum) AS BIGINT) AS total_duration_ms
         FROM g GROUP BY modality ORDER BY modality""",
    // binary exact dedup: both engines md5 the payload's HEX image (the
    // same uppercase characters — DuckDB 1.0 has only md5(VARCHAR) and
    // the framed payload is no longer valid utf-8); hex() is injective,
    // so the groups are exactly the byte-identical payload groups
    "q_mm_dedup" ->
      s"""WITH $AssetSqlCte,
         d AS (
           SELECT asset_id, modality, md5(phx) AS payload_fp, byte_len
           FROM a)
         SELECT modality, payload_fp, min(asset_id) AS keep_id,
                count(*) AS n_copies,
                CAST((count(*) - 1) * min(byte_len) AS BIGINT) AS dup_bytes
         FROM d GROUP BY modality, payload_fp
         ORDER BY modality, keep_id""",
    // audio window plan: same capped (duration-win)//hop+1 arithmetic
    "q_mm_windows" ->
      s"""WITH au AS (
           SELECT doc_id AS asset_id, n_chars * 40 AS duration_ms
           FROM documents WHERE doc_id % 3 = 1),
         w AS (
           SELECT asset_id, duration_ms,
                  CASE WHEN duration_ms >= $WinMs
                       THEN least($MaxWindows,
                                  (duration_ms - $WinMs) // $HopMs + 1)
                       ELSE 1 END AS n_windows
           FROM au)
         SELECT asset_id, n_windows, CAST(u.i AS BIGINT) AS win_idx,
                u.i * $HopMs AS start_ms,
                least(u.i * $HopMs + $WinMs, duration_ms) AS end_ms
         FROM w, unnest(generate_series(0, n_windows - 1)) AS u(i)
         ORDER BY asset_id, win_idx""",
    // fetch coalescing: replay the frame plan, then the same
    // lag/flag/running-sum range numbering and rollup
    "q_mm_fetch_plan" ->
      s"""WITH $AssetSqlCte,
         v AS (
           SELECT asset_id, duration_ms, byte_len
           FROM a WHERE modality = 'video'),
         f AS (
           SELECT asset_id, duration_ms, byte_len,
                  least($MaxFrames, duration_ms // 1000 + 1) AS n_frames
           FROM v),
         g AS (
           SELECT asset_id, byte_len, CAST(u.i AS BIGINT) AS frame_idx,
                  (u.i * duration_ms) // n_frames AS t_ms,
                  duration_ms
           FROM f, unnest(generate_series(0, n_frames - 1)) AS u(i)),
         o AS (
           SELECT asset_id, frame_idx,
                  (t_ms * byte_len) // greatest(duration_ms, 1) AS byte_offset,
                  least((t_ms * byte_len) // greatest(duration_ms, 1)
                        + $FrameBytes, byte_len) AS byte_end
           FROM g),
         r AS (
           SELECT asset_id, frame_idx, byte_offset, byte_end,
                  lag(byte_end) OVER (
                    PARTITION BY asset_id ORDER BY frame_idx) AS prev_end
           FROM o),
         n AS (
           SELECT *, CASE WHEN prev_end IS NULL
                          OR byte_offset > prev_end + $CoalesceGap
                          THEN 1 ELSE 0 END AS new_range
           FROM r),
         ri AS (
           SELECT *, CAST(sum(new_range) OVER (
                    PARTITION BY asset_id ORDER BY frame_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - 1 AS range_id
           FROM n)
         SELECT asset_id, range_id,
                min(byte_offset) AS range_start,
                max(byte_end) AS range_end,
                count(*) AS n_frames,
                max(byte_end) - min(byte_offset) AS io_bytes
         FROM ri GROUP BY asset_id, range_id
         ORDER BY asset_id, range_id""",
    "q_mm_meta" ->
      s"""WITH $AssetSqlCte
         SELECT asset_id, modality, byte_len, width, height,
                CASE WHEN modality = 'audio'
                     THEN CAST(rate AS BIGINT) END AS sample_rate,
                duration_ms
         FROM a ORDER BY asset_id""",
    "q_mm_shards" ->
      s"""WITH $AssetSqlCte,
         sh AS (
           SELECT asset_id, modality,
                  asset_id // 100000 AS volume, byte_len
           FROM a),
         c AS (
           SELECT asset_id, modality, volume, byte_len,
                  CAST(coalesce(sum(byte_len) OVER (
                    PARTITION BY modality, volume ORDER BY asset_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cum_before
           FROM sh)
         SELECT asset_id, modality, volume, byte_len,
                cum_before // 65536 AS shard_id,
                cum_before % 65536 AS offset_in_shard
         FROM c ORDER BY modality, asset_id""",
    // The stub decoder's 8-bin byte histogram, replayed byte-for-byte
    // over the FULL container (header bytes included — the stub decodes
    // whatever bytes arrive): phx → 2-char pairs → ('0x'||pair)::INT % 8.
    // The LEFT JOIN + greatest(n,1) guard mirrors the stub's max(len,1)
    // divisor (n is now always ≥ the header size, but the guard is the
    // stub's contract, not the fixture's).
    "q_mm_features" ->
      s"""WITH $AssetSqlCte,
         enc AS (
           SELECT asset_id, modality, phx AS hx,
                  CAST(byte_len AS INT) AS n
           FROM a),
         cnt AS (
           SELECT asset_id,
                  sum(CASE WHEN ('0x' || substr(hx, 2*i - 1, 2))::INT % 8 = 0
                           THEN 1 ELSE 0 END) AS c0,
                  sum(CASE WHEN ('0x' || substr(hx, 2*i - 1, 2))::INT % 8 = 1
                           THEN 1 ELSE 0 END) AS c1
           FROM enc, unnest(generate_series(1, n)) AS u(i)
           GROUP BY asset_id)
         SELECT e.asset_id, e.modality, e.n AS byte_len,
                CAST(coalesce(c.c0, 0) AS DOUBLE) / greatest(e.n, 1) AS f0,
                CAST(coalesce(c.c1, 0) AS DOUBLE) / greatest(e.n, 1) AS f1
         FROM enc e LEFT JOIN cnt c USING (asset_id)
         ORDER BY asset_id""",
  )
}
