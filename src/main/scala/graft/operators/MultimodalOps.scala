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

  /** Asset table synthesized from `documents`: payload = utf-8 bytes of the
    * text (an opaque blob as far as the pipeline is concerned), modality
    * round-robined, metadata derived deterministically from n_chars. */
  def assets(spark: SparkSession, dir: String): DataFrame =
    assetsFrom(Tables.documents(spark, dir))

  /** The synthesis itself, over ANY documents-shaped frame — a streaming
    * source included (assetIntakeStream's stream≡batch spec applies this
    * to a readStream, so stream and batch literally share the shape). */
  def assetsFrom(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640 + 1).as("width"),
      (col("n_chars") % 480 + 1).as("height"),
      (col("n_chars") * 40L).as("duration_ms"))

  /** Feature dimension produced by the (stub) decoder. */
  val FeatureDim = 8

  /** STUB decode/feature-extract: stands in for an image/audio decoder that
    * is not installed in this container. Deterministic per payload —
    * an 8-bin byte histogram normalized by length. The REAL part is the
    * batch shape around it: mapPartitions gives one iterator per partition,
    * so a real codec/model would be initialized once per partition, not per
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
    * multimodal plumbing (byte lengths of the binary payloads + meta). */
  def assetMeta(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .select(col("asset_id"), col("modality"),
        length(col("payload")).cast("long").as("byte_len"),
        col("width"), col("height"), col("duration_ms"))
      .orderBy("asset_id")

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
        expr("transform(features, x -> cast(x as float))").as("fv"))
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
  def resizePlan(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).where(col("modality") === "image")
      .select(col("asset_id"), col("width"), col("height"),
        greatest(col("width"), col("height")).as("max_side"))
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
    assetDedupWith(spark, dir, md5)

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
      .select(col("modality"), md5(col("payload")).as("payload_fp"),
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

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

  /** DuckDB replay of [[featureAnn]] — GENERATED over the FeatureDim bins
    * so the histogram/float-cast chain can't drift from the stub. */
  private val FeatureAnnSql: String = {
    val binSums = (0 until FeatureDim)
      .map(i => s"sum(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS c$i")
      .mkString(",\n                  ")
    val fvList = (0 until FeatureDim)
      .map(i => s"CAST(CAST(c.c$i AS DOUBLE) / e.n AS FLOAT)")
      .mkString("[", ",\n                  ", "]")
    s"""WITH enc AS (
           SELECT doc_id AS asset_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                  ELSE 'video' END AS modality,
                  hex(encode(text)) AS hx,
                  CAST(octet_length(encode(text)) AS INT) AS n
           FROM documents),
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
    // integer resize plan: same DIV/greatest/CASE arithmetic both engines
    "q_mm_resize" ->
      s"""WITH i AS (
           SELECT doc_id AS asset_id,
                  n_chars % 640 + 1 AS width,
                  n_chars % 480 + 1 AS height
           FROM documents WHERE doc_id % 3 = 0),
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
    // integer frame plan: uniform timestamps + proportional byte offsets
    "q_mm_frames" ->
      s"""WITH v AS (
           SELECT doc_id AS asset_id,
                  n_chars * 40 AS duration_ms,
                  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents WHERE doc_id % 3 = 2),
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
      """WITH a AS (
           SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                  ELSE 'video' END AS modality,
                  md5(text) AS payload_fp,
                  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                  n_chars * 40 AS duration_ms
           FROM documents),
         g AS (
           SELECT modality, payload_fp,
                  count(*) AS n_copies,
                  min(byte_len) AS byte_len,
                  CAST(sum(duration_ms) AS BIGINT) AS dur_sum
           FROM a GROUP BY modality, payload_fp)
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
    // binary exact dedup: md5 over the SAME utf-8 payload bytes —
    // DuckDB 1.0 has only md5(VARCHAR), which hashes the string's UTF-8
    // bytes, i.e. exactly Spark's md5(text.cast(binary)); lowercase hex
    // both sides; count(*)/min are BIGINT both sides
    "q_mm_dedup" ->
      """WITH a AS (
           SELECT doc_id AS asset_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                  ELSE 'video' END AS modality,
                  md5(text) AS payload_fp,
                  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents)
         SELECT modality, payload_fp, min(asset_id) AS keep_id,
                count(*) AS n_copies,
                CAST((count(*) - 1) * min(byte_len) AS BIGINT) AS dup_bytes
         FROM a GROUP BY modality, payload_fp
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
      s"""WITH v AS (
           SELECT doc_id AS asset_id,
                  n_chars * 40 AS duration_ms,
                  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents WHERE doc_id % 3 = 2),
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
      """SELECT doc_id AS asset_id,
                CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                ELSE 'video' END AS modality,
                octet_length(encode(text)) AS byte_len,
                n_chars % 640 + 1 AS width,
                n_chars % 480 + 1 AS height,
                n_chars * 40 AS duration_ms
         FROM documents ORDER BY asset_id""",
    "q_mm_shards" ->
      """WITH a AS (
           SELECT doc_id AS asset_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                  ELSE 'video' END AS modality,
                  doc_id // 100000 AS volume,
                  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents),
         c AS (
           SELECT asset_id, modality, volume, byte_len,
                  CAST(coalesce(sum(byte_len) OVER (
                    PARTITION BY modality, volume ORDER BY asset_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cum_before
           FROM a)
         SELECT asset_id, modality, volume, byte_len,
                cum_before // 65536 AS shard_id,
                cum_before % 65536 AS offset_in_shard
         FROM c ORDER BY modality, asset_id""",
    // The stub decoder's 8-bin byte histogram, replayed byte-for-byte:
    // hex(encode(text)) → 2-char pairs → ('0x'||pair)::INT % 8. Empty
    // payloads keep a row with f0=f1=0 via the LEFT JOIN + greatest(n,1)
    // — mirroring the stub's max(len,1) divisor.
    "q_mm_features" ->
      """WITH enc AS (
           SELECT doc_id AS asset_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                  ELSE 'video' END AS modality,
                  hex(encode(text)) AS hx,
                  CAST(octet_length(encode(text)) AS INT) AS n
           FROM documents),
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
