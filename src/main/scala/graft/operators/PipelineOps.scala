package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data pipeline operators beyond dedup/similarity: event
  * sessionization, text scrubbing, corpus statistics, and deterministic
  * dataset splitting. All single-shuffle, oracle-checkable designs.
  */
object PipelineOps {

  /** Session gap threshold (seconds). */
  private val SessionGap = 1800L

  /** Sessionization: split each user's event stream into sessions at
    * >30-minute gaps — lag + running sum of boundary flags, the canonical
    * two-window formulation (one shuffle on user_id; both windows share
    * the same partitioning so Catalyst plans a single sort+exchange).
    * Timestamps are truncated to whole epoch seconds so nanosecond (DuckDB)
    * vs microsecond (Spark) precision cannot flip a boundary. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val flagged = ev
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > SessionGap, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy("user_id", "session_idx")
      .agg(min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_idx")
  }

  /** Scrubbing: mask digit runs (the PII-redaction shape — phone numbers,
    * ids) in the raw event payload. Pure regexp_replace, fully map-side. */
  def scrubPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "#").as("props_scrubbed"))
      .orderBy("event_id")

  /** Corpus length statistics per language: exact interpolated quantiles
    * (Spark `percentile` and DuckDB `quantile_cont` share the (n−1)p
    * linear-interpolation definition). */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** The 100 TB form of lengthQuantiles: `percentile_approx` (KLL-style
    * mergeable sketch). Exact `percentile` buffers every value per group
    * on one reducer — fine at dashboard scale, fatal on a trillion rows;
    * the sketch is fixed-size per partition and merges map-side, so the
    * shuffle carries sketches, not data. No DuckDB oracle (the sketch is
    * engine-specific); the spec bounds the approx values' rank error
    * against the exact path instead. */
  def lengthQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        expr("percentile_approx(n_chars, 0.5, 10000)").as("p50_approx"),
        expr("percentile_approx(n_chars, 0.9, 10000)").as("p90_approx"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** 64-bit content hash (md5 first 8 hex chars): the ONE hash all
    * content-keyed assignments (split buckets, shards) derive from, so
    * they can never disagree on what "same content" means. */
  private def contentHash64: org.apache.spark.sql.Column =
    conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")

  /** Deterministic train/val/test split: content-hash bucket (mod 100) →
    * 80/10/10. Content-keyed so replicated documents always land in the
    * same split — the leakage-safe way to split a training corpus, and
    * fully reproducible across engines and runs. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (contentHash64 % 100).as("bucket")
    Tables.documents(spark, dir)
      .select(col("doc_id"), bucket)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .orderBy("doc_id")
  }

  /** Per-language mixture rates (per-mille) for stratified sampling — the
    * corpus-mixing knob of a training run (e.g. upsample zh, downsample
    * boilerplate-heavy strata). Values are arbitrary demo weights; the
    * MECHANISM is the operator. */
  private val StrataRates: Seq[(String, Int)] =
    Seq("en" -> 500, "zh" -> 800, "de" -> 250, "es" -> 250, "fr" -> 250)
  private val DefaultRate = 100

  /** Stratified (per-language) deterministic sampling: keep a doc iff its
    * content-hash residue mod 1000 falls under its stratum's per-mille
    * rate. Content-keyed like splitAssign, so the sample is reproducible
    * across engines/runs, replicas sample identically (no dup leakage),
    * and — critically at 100 TB — it is a pure map-side filter: no
    * shuffle, no sort, no per-stratum pass; the mixture materializes in
    * one scan regardless of how many strata exist. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = StrataRates.foldLeft(lit(DefaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .withColumn("rate_pm", rate)
      .where(pmod(contentHash64, lit(1000)) < col("rate_pm"))
      .select(col("doc_id"), col("lang"), col("rate_pm").cast("long").as("rate_pm"))
      .orderBy("doc_id")
  }

  /** Importance (length-weighted) deterministic sampling: keep probability
    * proportional to min(n_chars, 500)/1000 — longer documents survive
    * more often, the standard quality-proxy importance sampler. Uses a
    * DIFFERENT md5 slice (hex chars 9-16) than splitAssign/stratified so
    * the keep decisions are independent of split/stratum assignment
    * (slicing one digest is free; a second full hash is not). Map-side
    * only, like stratifiedSample. */
  def importanceSample(spark: SparkSession, dir: String): DataFrame = {
    val h2 = conv(substring(md5(col("text")), 9, 8), 16, 10).cast("long")
    Tables.documents(spark, dir)
      .withColumn("w_pm", least(col("n_chars"), lit(500L)))
      .where(pmod(h2, lit(1000)) < col("w_pm"))
      .select(col("doc_id"), col("n_chars"), col("w_pm"))
      .orderBy("doc_id")
  }

  /** Tokens per pack for sequence packing. */
  private val PackBudget = 512L
  private val NumShards = 16

  private def contentShard: org.apache.spark.sql.Column =
    pmod(contentHash64, lit(NumShards))

  /** Training-output sharding: content-hash shard assignment + per-shard
    * doc/token totals — the stats a data-loader needs to validate balanced
    * shards. Stable across runs and engines (content-keyed). */
  def shardStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(contentShard.as("shard"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("total_tokens"))
      .orderBy("shard")

  /** Offset-bucketed sequence packing: within each shard, documents (in
    * doc_id order) are assigned pack_id = floor(tokens-before / budget).
    * This is the windowed APPROXIMATION of greedy bin packing: a pack may
    * overflow the budget by up to one document (a doc spanning a boundary
    * stays in the earlier pack) — the standard one-pass formulation;
    * exact greedy packing is inherently sequential per shard and would
    * need mapGroups. The window is PARTITIONED BY SHARD, so packing
    * parallelizes across shards at 100 TB (a global packing order would
    * serialize). */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), contentShard.as("shard"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("pack_id", expr(s"(cum - toks) div $PackBudget"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("shard", "pack_id")
  }

  /** Data-quality gate: one row per invariant with its violation count —
    * referential integrity, key uniqueness, null rates, derived-column
    * consistency, embedding dimensionality. The validation step that runs
    * before any training-data export; each check is a single aggregate,
    * all unioned into one small report. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val ev = Tables.events(spark, dir)
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    def check(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"),
          (col("n_violations") === 0).as("pass"))
    val orphanLines = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
    val dupOrders = o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
    val nullUsers = ev.where(col("user_id").isNull)
    val badNChars = docs.where(col("n_chars") =!= length(col("text")))
    val badDims = emb.where(size(col("embedding")) =!= 64)
    check("lineitem_orderkey_fk", orphanLines)
      .unionAll(check("orders_pk_unique", dupOrders))
      .unionAll(check("events_user_not_null", nullUsers))
      .unionAll(check("documents_nchars_consistent", badNChars))
      .unionAll(check("embeddings_dim_64", badDims))
      .orderBy("check_name")
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> (dqChecks _),
    "q_sessionize" -> (sessionize _),
    "q_scrub" -> (scrubPayload _),
    "q_len_quantiles" -> (lengthQuantiles _),
    "q_len_quantiles_approx" -> (lengthQuantilesApprox _),
    "q_split_assign" -> (splitAssign _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_importance_sample" -> (importanceSample _),
    "q_shard_stats" -> (shardStats _),
    "q_pack_sequences" -> (packSequences _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_sessionize" ->
      """WITH ev AS (
           SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         flagged AS (
           SELECT user_id, event_id, sec,
                  lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec
           FROM ev),
         marked AS (
           SELECT user_id, event_id, sec,
                  CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                       THEN 1 ELSE 0 END AS new_sess
           FROM flagged),
         numbered AS (
           SELECT user_id, sec,
                  CAST(sum(new_sess) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           FROM marked)
         SELECT user_id, session_idx, min(sec) AS start_sec,
                max(sec) AS end_sec, count(*) AS n_events
         FROM numbered GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",
    "q_scrub" ->
      """SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS props_scrubbed
         FROM events ORDER BY event_id""",
    "q_len_quantiles" ->
      """SELECT lang, quantile_cont(n_chars, 0.5) AS p50,
                quantile_cont(n_chars, 0.9) AS p90, count(*) AS n_docs
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_dq_checks" ->
      """SELECT * FROM (
           SELECT 'lineitem_orderkey_fk' AS check_name, count(*) AS n_violations,
                  count(*) = 0 AS pass
           FROM lineitem l WHERE NOT EXISTS (
             SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
           UNION ALL
           SELECT 'orders_pk_unique', count(*), count(*) = 0 FROM (
             SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
           UNION ALL
           SELECT 'events_user_not_null', count(*), count(*) = 0
           FROM events WHERE user_id IS NULL
           UNION ALL
           SELECT 'documents_nchars_consistent', count(*), count(*) = 0
           FROM documents WHERE n_chars != length(text)
           UNION ALL
           SELECT 'embeddings_dim_64', count(*), count(*) = 0
           FROM embeddings WHERE len(embedding) != 64)
         ORDER BY check_name""",
    "q_shard_stats" ->
      s"""WITH d AS (
           SELECT ('0x' || substr(md5(text), 1, 8))::BIGINT % $NumShards AS shard,
                  len(string_split(text, ' ')) AS toks
           FROM documents)
         SELECT shard, count(*) AS n_docs,
                CAST(sum(toks) AS BIGINT) AS total_tokens
         FROM d GROUP BY shard ORDER BY shard""",
    "q_pack_sequences" ->
      s"""WITH d AS (
           SELECT doc_id,
                  ('0x' || substr(md5(text), 1, 8))::BIGINT % $NumShards AS shard,
                  len(string_split(text, ' ')) AS toks
           FROM documents),
         c AS (
           SELECT doc_id, shard, toks,
                  CAST(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM d)
         SELECT shard, (cum - toks) // $PackBudget AS pack_id, count(*) AS n_docs,
                CAST(sum(toks) AS BIGINT) AS pack_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM c GROUP BY shard, pack_id ORDER BY shard, pack_id""",
    "q_split_assign" ->
      """SELECT doc_id,
                ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
                CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                     WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q_stratified_sample" ->
      """WITH r AS (
           SELECT doc_id, lang,
                  CASE lang WHEN 'fr' THEN 250 WHEN 'es' THEN 250
                            WHEN 'de' THEN 250 WHEN 'zh' THEN 800
                            WHEN 'en' THEN 500 ELSE 100 END AS rate_pm,
                  ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000 AS h
           FROM documents)
         SELECT doc_id, lang, CAST(rate_pm AS BIGINT) AS rate_pm
         FROM r WHERE h < rate_pm ORDER BY doc_id""",
    "q_importance_sample" ->
      """WITH r AS (
           SELECT doc_id, n_chars, least(n_chars, 500) AS w_pm,
                  ('0x' || substr(md5(text), 9, 8))::BIGINT % 1000 AS h
           FROM documents)
         SELECT doc_id, n_chars, w_pm
         FROM r WHERE h < w_pm ORDER BY doc_id""",
  )
}
