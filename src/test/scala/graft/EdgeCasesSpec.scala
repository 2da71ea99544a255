package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, PipelineOps, TextOps}

class EdgeCasesSpec extends SparkTestBase {

  test("document ops survive empty / whitespace / single-token / unicode texts") {
    val dir = documentsFixture(Seq(
      (0L, "", "en", "s0"),
      (1L, " ", "en", "s0"),
      (2L, "solo", "en", "s0"),
      (3L, "двух слов 语言", "zh", "s1"),
      (4L, "a b", "en", "s1"), // 2 tokens: below shingle threshold
    ))
    // none of these should throw; counts must cover all docs
    assert(TextOps.tokenCount(spark, dir).count() == 5)
    assert(TextOps.langId(spark, dir).count() == 5)
    assert(TextOps.qualityScore(spark, dir).count() == 5)
    assert(TextOps.fingerprint(spark, dir).count() == 5)
    assert(PipelineOps.splitAssign(spark, dir).count() == 5)
    // dedup paths: docs under 3 tokens have no shingles and simply drop out
    assert(DedupOps.ngramJaccard(spark, dir).count() == 0)
    assert(DedupOps.minhashLsh(spark, dir).count() == 0)
    // exact dedup still sees everything
    assert(DedupOps.dedupExact(spark, dir).count() == 5)
  }

  test("empty corpus: dedup and similarity return empty, not errors") {
    val dir = documentsFixture(Seq.empty)
    assert(DedupOps.dedupExact(spark, dir).count() == 0)
    assert(DedupOps.ngramJaccard(spark, dir).count() == 0)
    assert(DedupOps.simhashPairs(spark, dir).count() == 0)
    assert(TextOps.tokenCount(spark, dir).count() == 0)
    // iterative components: empty pair graph exits the loop without a round
    assert(DedupOps.dupComponents(spark, dir).count() == 0)
    assert(TextOps.tfidf(spark, dir).count() == 0)
    // the attribution rollup of an empty pair frame is empty, not an error
    assert(DedupOps.sourceOverlap(spark, dir).count() == 0)
    // the round-12 multimodal family: empty asset table → empty plans,
    // empty dedup/card, no errors (the window/explode/lag chains all
    // tolerate zero input rows)
    assert(graft.operators.MultimodalOps.assetDedup(spark, dir).count() == 0)
    assert(graft.operators.MultimodalOps.assetCard(spark, dir).count() == 0)
    assert(graft.operators.MultimodalOps.windowPlan(spark, dir).count() == 0)
    assert(graft.operators.MultimodalOps.fetchPlan(spark, dir).count() == 0)
    // r13: the header probe and parse-fed resize over zero assets
    assert(graft.operators.MultimodalOps.headerParse(spark, dir).count() == 0)
    assert(graft.operators.MultimodalOps.resizePlan(spark, dir).count() == 0)
    // r14: the decode stage, energy windows, interleaved packing, and
    // the hashed-feature trainer over zero docs — the trainer still
    // emits its 3-step trajectory (all-zero gradients), like kmeans
    // tuning's literal-driven rows
    assert(graft.operators.MultimodalOps.decodeReport(spark, dir).count() == 0)
    assert(graft.operators.MultimodalOps.audioEnergy(spark, dir).count() == 0)
    assert(graft.operators.MultimodalOps.packMultimodal(spark, dir).count() == 0)
    val clf = graft.operators.PipelineOps.qualityClfTrain(spark, dir).collect()
    assert(clf.length == 3 && clf.forall(_.getAs[Long]("n_mis") == 0L))
    // r16: the video decode family and the substring detector over zero
    // docs — decode scans, bit-vote aggregation, Manku blocking, and the
    // k-gram position join all tolerate empty input
    assert(graft.operators.MultimodalOps.videoFrames(spark, dir).count() == 0)
    assert(graft.operators.MultimodalOps.videoDedup(spark, dir).count() == 0)
    assert(DedupOps.substrDedup(spark, dir).count() == 0)
    // r16 session 2: the scrub apply step and the snapshot probe ride the
    // same empty position frame — no spans, no rewrites, no probe rows
    assert(DedupOps.substrIntra(spark, dir).count() == 0)
    assert(DedupOps.substrScrub(spark, dir).count() == 0)
    assert(DedupOps.substrSnap(spark, dir).count() == 0)
    assert(DedupOps.substrStats(spark, dir).count() == 0)
    assert(DedupOps.contaminationSpans(spark, dir).count() == 0)
    assert(DedupOps.contaminationScrub(spark, dir).count() == 0)
  }

  test("substring dedup edge grain: short texts (< k tokens) and single-doc corpora are span-free") {
    // a 10-token text has no 20-token window (the kgram array is empty);
    // a single distinct text can never cross-pair; an intra-text repeat
    // is NOT a cross-doc span (the fp < fp join excludes self-pairs)
    val rep = ((1 to 30).map(i => s"t$i") ++ (1 to 30).map(i => s"t$i")).mkString(" ")
    val dir = documentsFixture(Seq(
      (1L, "only ten tokens live in this very short text here", "en", "s"),
      (2L, rep, "en", "s")))
    assert(DedupOps.substrDedup(spark, dir).count() == 0,
      "short texts and intra-text repeats must produce no cross-doc span")
    // the 30-token intra period is below the 50-token report threshold,
    // so neither the intra detector nor the scrub may fire on it
    assert(DedupOps.substrIntra(spark, dir).count() == 0,
      "sub-threshold intra repeats must not be reported")
    assert(DedupOps.substrScrub(spark, dir).count() == 0,
      "no reportable span (cross or intra) → nothing to scrub")
  }

  test("kmeans tuning on an empty embeddings corpus: 3 null-stat rows, no error") {
    // aggregates without GROUP BY emit one all-NULL row per K on an empty
    // corpus in BOTH engines (the k literal survives), so the sweep
    // degrades identically instead of throwing
    val dir = embeddingsFixture(Seq.empty)
    val rows = graft.operators.SimilarityOps.kmeansTuning(spark, dir).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L, 8L, 16L))
    assert(rows.forall(_.isNullAt(5)), "mean_cos must be NULL, not NaN/0")
  }

  test("source overlap with no qualifying pairs: empty, not zero-rows") {
    // shingled docs that share nothing: groups must be ABSENT (matching
    // the oracle, which only emits groups with >= 1 real doc pair), not
    // present with dup_pairs = 0
    val dir = documentsFixture(Seq(
      (1L, "alpha beta gamma delta", "en", "src0"),
      (2L, "eta theta iota kappa", "en", "src1")))
    assert(DedupOps.sourceOverlap(spark, dir).count() == 0)
  }

  test("contamination with no eval-source docs: all zero overlap, no errors") {
    val dir = documentsFixture(Seq(
      (1L, "alpha beta gamma delta", "en", "src7"),
      (2L, "eta theta iota kappa", "en", "src8")))
    val got = DedupOps.contamination(spark, dir).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("n_shared") == 0L &&
        r.getAs[Double]("contam_frac") == 0.0)
    }
  }

  test("event ops survive empty and single-row event tables") {
    import spark.implicits._
    import graft.operators.{CoreOps, PipelineOps, ServingOps}
    def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ev_").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val empty = eventsDir(Seq.empty)
    assert(CoreOps.dauTotal(spark, empty).count() == 0)
    assert(CoreOps.cdcRoute(spark, empty).count() == 0)
    assert(CoreOps.firstSeen(spark, empty).count() == 0)
    assert(PipelineOps.sessionize(spark, empty).count() == 0)
    assert(ServingOps.realtimeTotal(spark, empty, "2024-01-15").head().getLong(0) == 0)

    val one = eventsDir(Seq(
      (0L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 7L, "purchase", 1.0, """{"k": 0}""")))
    assert(CoreOps.dauTotal(spark, one).count() == 1)
    assert(CoreOps.cdcRoute(spark, one).count() == 1, "purchase+insert must route")
    val sess = PipelineOps.sessionize(spark, one).head()
    assert(sess.getAs[Long]("n_events") == 1L)
    assert(ServingOps.realtimeTotal(spark, one, "2024-01-15").head().getLong(0) == 1)
  }

  test("fingerprint of empty text is the hash seed (0), matching the oracle") {
    val dir = documentsFixture(Seq((0L, "", "en", "s")))
    val fp = TextOps.fingerprint(spark, dir).head().getLong(1)
    assert(fp == 0L, "empty fold must produce the initial accumulator")
  }
}
