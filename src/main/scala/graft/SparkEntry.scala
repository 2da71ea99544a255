package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnalyticOps, CoreOps, DedupOps, GraphOps, MultimodalOps, PipelineOps, ScaleOps, ServingOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per implemented
  * operator from SURVEY.md §2 + the training-data-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible query. Column names/aliases match between the two —
  * the driver's compare hashes values under sorted column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hourly DAU: the reference's signature pipeline
    * (ingest → derive dt/hr → dedup → agg), SURVEY.md §7.2. */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.dauHourly(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreOps.queries ++ TextOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++ ServingOps.queries ++
      PipelineOps.queries ++ AnalyticOps.queries ++ ScaleOps.queries ++
      GraphOps.queries

  /** Queries measured slowest at sf0.01 (multi-action sketch/graph plans).
    * Both gate harnesses schedule these LAST so an external budget kill
    * costs the fewest measurements — the many fast queries all land before
    * the first slow one starts. Shared here so Verify and Bench can't
    * drift apart. */
  val knownSlow: Seq[String] = Seq(
    // multi-action / cached multi-stage queries: cheap in a healthy window
    // but the first to balloon when the host degrades (sketch head-fetches,
    // shared cached frames) — run them after the single-plan majority
    "q_heavy_hitters_cms", "q_minhash_oracle", "q_dedup_report", "q_funnel",
    "q_copurchase_lift", "q_containment", "q_contamination_bloom",
    // the measured-slowest tail (iterative / trained / many-exchange)
    "q_retention", "q_semdedup", "q_minhash_lsh", "q_contrastive_pairs",
    "q_snap_neardup", "q_ann_bruteforce",
    "q_pagerank", "q_bpe_train", "q_bpe_encode", "q_ann_lsh", "q_dup_components",
    "q_curation", "q_ann_pq", "q_dup_canon", "q_ann_ivf")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreOps.oracleSql ++ TextOps.oracleSql ++ DedupOps.oracleSql ++
      SimilarityOps.oracleSql ++ MultimodalOps.oracleSql ++ ServingOps.oracleSql ++
      PipelineOps.oracleSql ++ AnalyticOps.oracleSql ++ ScaleOps.oracleSql ++
      GraphOps.oracleSql
}
