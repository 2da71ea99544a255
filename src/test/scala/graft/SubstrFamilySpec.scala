package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.streaming.StreamingOps

/** The round-16 substring-dedup family beyond the detector
  * (GraphOpsSpec pins q_substr_dedup itself): the scrub APPLY step at
  * arbitrary boundaries, the snapshot probe with doc-grain expansion,
  * the persisted k-gram position index, and the online intake. Every
  * fixture is planted so the expected geometry is arithmetic, not
  * regression pinning.
  */
class SubstrFamilySpec extends SparkTestBase {

  private def toks(prefix: String, r: Range): Seq[String] =
    r.map(i => s"$prefix$i")
  private def txt(parts: Seq[String]*): String = parts.flatten.mkString(" ")

  /** Drop a managed table AND its leftover warehouse dir (a previous
    * JVM's dirs survive on disk while the in-memory catalog is fresh —
    * same lifecycle helper as SnapIndexSpec). */
  private def scrubTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val loc = new java.io.File(wh, t)
    if (loc.exists()) rm(loc)
  }

  // -------------------------------------------------------------- scrub
  test("substring scrub removes the planted unaligned span from the non-canonical copy only") {
    // the GraphOpsSpec detector fixture: a 200-token span at token 101 of
    // doc 1 and token 38 of doc 2; doc 4 replicates doc 2 byte-for-byte
    val span = toks("s", 1 to 200)
    val padA = toks("a", 1 to 100)
    val padB = toks("b", 1 to 37)
    val tailC = toks("c", 1 to 60)
    val tailD = toks("d", 1 to 25)
    val t1 = txt(padA, span, tailC)
    val t2 = txt(padB, span, tailD)
    val t3 = txt(toks("z", 1 to 300))
    val dir = documentsFixture(Seq(
      (1L, t1, "en", "src0"), (2L, t2, "en", "src0"),
      (3L, t3, "en", "src0"), (4L, t2, "en", "src0")))
    val got = DedupOps.substrScrub(spark, dir).collect()
    // doc 1's text is the canonical side (min canon id keeps), doc 3
    // shares nothing: ONLY the {2,4} text is rewritten
    assert(got.length == 1, s"exactly the loser text: ${got.toSeq}")
    val r = got.head
    assert(r.getAs[Long]("canon_id") == 2L)
    assert(r.getAs[Long]("n_docs") == 2L, "doc 4 rides the multiplicity")
    assert(r.getAs[Long]("n_spans") == 1L)
    assert(r.getAs[Long]("n_tokens") == 262L)
    assert(r.getAs[Long]("tokens_removed") == 200L)
    assert(r.getAs[Long]("tokens_kept") == 62L)
    assert(r.getAs[String]("scrub_text") == txt(padB, tailD),
      "the span excises cleanly; pad and tail survive in order")
  }

  test("substring scrub merges overlapping and adjacent loser spans from different partners into one region") {
    // X loses three spans to three distinct winners: [10,80] and [60,130]
    // overlap, [131,190] is adjacent — one merged scrub region [10,190]
    val q = toks("q", 1 to 190)
    val x = txt(toks("p", 1 to 9), q, toks("e", 1 to 20)) // 219 tokens
    val w1 = txt(toks("f", 1 to 5), q.slice(0, 71))   // shares X[10..80]
    val w2 = txt(q.slice(50, 121), toks("g", 1 to 10)) // shares X[60..130]
    val w3 = txt(q.slice(121, 181))                    // shares X[131..190]
    val dir = documentsFixture(Seq(
      (1L, w1, "en", "src0"), (2L, w2, "en", "src0"),
      (3L, w3, "en", "src0"), (4L, x, "en", "src0")))
    // winner pairs share at most 21 tokens (w1∩w2 = q51..q71) — below the
    // 50-token report threshold, so X is the only loser
    val got = DedupOps.substrScrub(spark, dir).collect()
    assert(got.length == 1, s"only X rewrites: ${got.toSeq}")
    val r = got.head
    assert(r.getAs[Long]("canon_id") == 4L)
    assert(r.getAs[Long]("n_spans") == 1L,
      "overlap + adjacency merge into ONE contiguous region")
    assert(r.getAs[Long]("n_tokens") == 219L)
    assert(r.getAs[Long]("tokens_removed") == 181L)
    assert(r.getAs[Long]("tokens_kept") == 38L)
    // the merged region is token positions [10,190]; q182..q190 sit at
    // positions 191..199 (q_i lives at position 9+i) and survive
    assert(r.getAs[String]("scrub_text") ==
      txt(toks("p", 1 to 9), toks("q", 182 to 190), toks("e", 1 to 20)))
  }

  test("substring scrub of a fully-covered text yields the empty string, not a dropped row") {
    val h = toks("h", 1 to 100)
    val dir = documentsFixture(Seq(
      (1L, txt(h), "en", "src0"),
      (2L, txt(h.slice(19, 79)), "en", "src0"))) // h20..h79: 60 tokens, all shared
    val got = DedupOps.substrScrub(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("canon_id") == 2L)
    assert(r.getAs[Long]("n_tokens") == 60L)
    assert(r.getAs[Long]("tokens_removed") == 60L)
    assert(r.getAs[Long]("tokens_kept") == 0L)
    assert(r.getAs[String]("scrub_text") == "",
      "a fully-duplicated doc scrubs to empty — the curation gate's job to drop")
  }

  test("substring pair-mass audit: the cap sweep prices the quadratic hot-hash risk") {
    // doc 1: one token repeated 30× — every 20-token window is identical,
    // so ONE hash carries 11 positions (C(11,2) = 55 matched pairs: the
    // degenerate-content blowup the audit exists to surface); doc 2: 25
    // distinct tokens — 6 singleton hashes contributing zero pairs
    val dir = documentsFixture(Seq(
      (1L, Seq.fill(30)("x").mkString(" "), "en", "s"),
      (2L, txt(toks("y", 1 to 25)), "en", "s")))
    assert(rowsOf(DedupOps.substrStats(spark, dir)) == Seq(
      Seq[Any](4L, 7L, 1L, 11L, 0L),       // cap 4 drops the hot hash
      Seq[Any](16L, 7L, 0L, 0L, 55L),      // cap ≥ 11 keeps everything
      Seq[Any](64L, 7L, 0L, 0L, 55L),
      Seq[Any](256L, 7L, 0L, 0L, 55L),
      Seq[Any](1000000L, 7L, 0L, 0L, 55L)))
  }

  test("within-doc substring dedup: the unaligned chorus repeat is found and the scrub keeps only the first occurrence") {
    // a 60-token chorus at positions 10 and 95 — the 85-token repeat
    // distance is no multiple of the 40-token chunk stride, so aligned
    // chunk dedup sees nothing; every interior 20-gram matches its
    // earlier occurrence. Doc 2 is a byte replica (multiplicity).
    val chorus = toks("k", 1 to 60)
    val d = txt(toks("a", 1 to 9), chorus, toks("b", 1 to 25),
      chorus, toks("c", 1 to 41)) // 195 tokens
    val dir = documentsFixture(Seq(
      (1L, d, "en", "src0"), (2L, d, "en", "src0")))
    assert(rowsOf(DedupOps.substrIntra(spark, dir)) ==
      Seq(Seq[Any](1L, 2L, 10L, 95L, 60L)),
      "one maximal intra span: first occurrence at 10, repeat at 95")
    // aligned intra chunk dedup provably misses it
    assert(graft.operators.PipelineOps.chunkDedup(spark, dir).collect()
      .forall(_.getAs[Long]("n_dup_chunks") == 0L),
      "no 50-token ALIGNED window repeats — the gap q_substr_intra closes")
    // byte-identical replicas are NOT cross-text spans (same fingerprint)
    assert(DedupOps.substrDedup(spark, dir).count() == 0)
    // the scrub removes the REPEAT occurrence only
    val got = DedupOps.substrScrub(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("canon_id") == 1L && r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_spans") == 1L)
    assert(r.getAs[Long]("n_tokens") == 195L)
    assert(r.getAs[Long]("tokens_removed") == 60L)
    assert(r.getAs[String]("scrub_text") ==
      txt(toks("a", 1 to 9), chorus, toks("b", 1 to 25), toks("c", 1 to 41)),
      "first occurrence survives; the repeat excises")
  }

  test("span-exact contamination: eval spans in training docs get exact geometry; train-internal duplication stays out of scope") {
    val leak = toks("l", 1 to 60)     // the eval body leaked into training
    val tshare = toks("m", 1 to 100)  // train-only duplication (dedup's job)
    val dir = documentsFixture(Seq(
      (1L, txt(leak), "en", "src0"),
      (2L, txt(toks("u", 1 to 30), leak, toks("v", 1 to 10)), "en", "src1"),
      (3L, txt(tshare, toks("w", 1 to 25)), "en", "src1"),
      (4L, txt(toks("x", 1 to 7), tshare), "en", "src1")))
    // geometry: doc 2 carries eval doc 1's 60 tokens at positions 31..90
    assert(rowsOf(graft.operators.DedupOps.contaminationSpans(spark, dir))
      == Seq(Seq[Any](2L, 1L, 1L, 31L, 1L, 60L)),
      "exactly the one leak, at exact positions — the train-only span must not appear")
    val scrub = DedupOps.contaminationScrub(spark, dir).collect()
    assert(scrub.length == 1, s"only the leaking train doc rewrites: ${scrub.toSeq}")
    val r = scrub.head
    assert(r.getAs[Long]("canon_id") == 2L)
    assert(r.getAs[Long]("n_spans") == 1L)
    assert(r.getAs[Long]("tokens_removed") == 60L)
    assert(r.getAs[Long]("tokens_kept") == 40L)
    assert(r.getAs[String]("scrub_text") ==
      txt(toks("u", 1 to 30), toks("v", 1 to 10)),
      "the leaked span excises; the doc survives redacted (not dropped)")
    // the train-internal duplication IS the dedup family's to handle:
    // substring scrub sees doc 4's text lose the m-span to doc 3's
    // (canonical id 3 < 4, so the doc-4 text is the non-canonical side)
    assert(DedupOps.substrScrub(spark, dir).collect()
      .exists(_.getAs[Long]("canon_id") == 4L),
      "q_substr_scrub owns train-internal spans — the scopes compose, not overlap")
  }

  // ---------------------------------------------------- snapshot + index
  /** Snapshot fixture: corpus = doc_id%10 < 8, batch = ≥ 8 (the engine's
    * snapshot split convention). */
  private def snapshotFixture(): (String, Seq[Seq[Any]]) = {
    val span = toks("s", 1 to 200)
    val tA = txt(toks("a", 1 to 100), span, toks("c", 1 to 60))
    val tB = txt(toks("y", 1 to 80))
    val tC = txt(toks("z", 1 to 300))
    val tD = txt(toks("b", 1 to 37), span, toks("d", 1 to 25))
    val tE = txt(toks("w", 1 to 60))
    val dir = documentsFixture(Seq(
      (1L, tA, "en", "src0"), (4L, tA, "en", "src0"), // corpus replica pair
      (2L, tB, "en", "src0"), (3L, tC, "en", "src0"),
      (8L, tD, "en", "src1"), (19L, tD, "en", "src1"), // batch replica pair
      (18L, tB, "en", "src1"), // exact-replica arrival of corpus text
      (9L, tE, "en", "src1"))) // no match
    val expected = Seq(
      Seq[Any](8L, 1L, 2L, 38L, 101L, 200L),
      Seq[Any](18L, 2L, 1L, 1L, 1L, 80L),
      Seq[Any](19L, 1L, 2L, 38L, 101L, 200L))
    (dir, expected)
  }

  test("snapshot substring probe: exact cross-split span geometry, replica arrivals, doc-grain expansion") {
    val (dir, expected) = snapshotFixture()
    val got = rowsOf(DedupOps.substrSnap(spark, dir))
    assert(got == expected,
      s"expected exact span geometry per arriving doc, got $got")
  }

  test("persisted k-gram index probe: rows identical to in-query snapshot; persisted scan reaches its join shuffle-free") {
    val (dir, expected) = snapshotFixture()
    scrubTable("substr_pos_idx")
    DedupOps.buildSubstrIndex(spark, dir, "substr_pos_idx")
    spark.catalog.clearCache()
    assert(rowsOf(DedupOps.substrProbe(spark, dir, "substr_pos_idx"))
      == expected, "persisted probe must equal the in-query snapshot")
    // and on the real corpus: identity against the in-query form
    scrubTable("substr_pos_idx_sf")
    DedupOps.buildSubstrIndex(spark, sf0001, "substr_pos_idx_sf")
    spark.catalog.clearCache()
    assert(rowsOf(DedupOps.substrProbe(spark, sf0001, "substr_pos_idx_sf"))
      == rowsOf(DedupOps.substrSnap(spark, sf0001)))
    val nScans = assertNoShuffleBeforePersistedJoin(
      DedupOps.substrProbe(spark, dir, "substr_pos_idx"),
      Set("substr_pos_idx"))
    assert(nScans == 1, s"expected one persisted index scan, got $nScans")
  }

  test("persisted eval-index contamination probe: rows identical to the in-query operator, shuffle-free persisted side") {
    val leak = toks("l", 1 to 60)
    val dir = documentsFixture(Seq(
      (1L, txt(leak), "en", "src0"),
      (2L, txt(toks("u", 1 to 30), leak, toks("v", 1 to 10)), "en", "src1"),
      (3L, txt(toks("m", 1 to 100)), "en", "src1")))
    scrubTable("eval_pos_idx")
    DedupOps.buildEvalIndex(spark, dir, "eval_pos_idx")
    spark.catalog.clearCache()
    val train = Tables.documents(spark, dir).where(col("source") =!= "src0")
    assert(rowsOf(DedupOps.contaminationProbeOf(spark, train, "eval_pos_idx"))
      == rowsOf(DedupOps.contaminationSpans(spark, dir)),
      "the persisted eval index must reproduce the in-query contamination rows")
    // and on the real corpus, where cross-source replicas leak for real
    scrubTable("eval_pos_idx_sf")
    DedupOps.buildEvalIndex(spark, sf0001, "eval_pos_idx_sf")
    spark.catalog.clearCache()
    val trainSf = Tables.documents(spark, sf0001)
      .where(col("source") =!= "src0")
    val probed = rowsOf(DedupOps.contaminationProbeOf(
      spark, trainSf, "eval_pos_idx_sf"))
    assert(probed == rowsOf(DedupOps.contaminationSpans(spark, sf0001)))
    assert(probed.nonEmpty, "sf0.001 has real cross-source leaks")
    val nScans = assertNoShuffleBeforePersistedJoin(
      DedupOps.contaminationProbeOf(spark, train, "eval_pos_idx"),
      Set("eval_pos_idx"))
    assert(nScans == 1)
  }

  test("scrub fixed point: one application leaves no reportable duplicate span, cross or intra") {
    // the hardest composite corpus from the earlier tests: a cross-text
    // span with a replica, a three-partner overlap/adjacency merge, a
    // fully-covered doc, AND an intra chorus — after ONE scrub round the
    // rewritten corpus must be duplicate-free at the report threshold
    // (Lee et al.'s "remove all but the first occurrence" as an invariant,
    // not a hope)
    val span = toks("s", 1 to 200)
    val q = toks("q", 1 to 190)
    val chorus = toks("k", 1 to 60)
    val h = toks("h", 1 to 100)
    val docs = Seq(
      (1L, txt(toks("a", 1 to 100), span, toks("c", 1 to 60)), "en", "src0"),
      (2L, txt(toks("b", 1 to 37), span, toks("d", 1 to 25)), "en", "src0"),
      (3L, txt(toks("b", 1 to 37), span, toks("d", 1 to 25)), "en", "src0"),
      (4L, txt(toks("p", 1 to 9), q, toks("e", 1 to 20)), "en", "src0"),
      (5L, txt(toks("f", 1 to 5), q.slice(0, 71)), "en", "src0"),
      (6L, txt(q.slice(50, 121), toks("g", 1 to 10)), "en", "src0"),
      (7L, txt(h), "en", "src0"),
      (8L, txt(h.slice(19, 79)), "en", "src0"),
      (9L, txt(toks("i", 1 to 9), chorus, toks("j", 1 to 25), chorus), "en", "src0"))
    val dir = documentsFixture(docs)
    val rewrites = DedupOps.substrScrub(spark, dir).collect()
      .map(r => r.getAs[Long]("canon_id") -> r.getAs[String]("scrub_text"))
      .toMap
    // apply the delta: every copy of an affected text takes its rewrite
    val canonOf = docs.groupBy(_._2).map { case (text, ds) =>
      text -> ds.map(_._1).min }
    val applied = docs.map { case (id, text, lang, src) =>
      (id, rewrites.getOrElse(canonOf(text), text), lang, src) }
    val dir2 = documentsFixture(applied)
    assert(DedupOps.substrDedup(spark, dir2).count() == 0,
      "no cross-text duplicate span may survive one scrub application")
    assert(DedupOps.substrIntra(spark, dir2).count() == 0,
      "no within-doc repeat may survive one scrub application")
    // and the canonical content survived: doc 1 keeps the span, doc 9
    // keeps the first chorus
    assert(applied.find(_._1 == 1L).get._2.contains(txt(span)))
    assert(applied.find(_._1 == 9L).get._2.contains(txt(chorus)))
  }

  test("online decontamination intake: streamed training shards probing the eval index equal the one-shot probe") {
    val leak = toks("l", 1 to 60)
    val dir = documentsFixture(Seq(
      (1L, txt(leak), "en", "src0"),
      (2L, txt(toks("u", 1 to 30), leak, toks("v", 1 to 10)), "en", "src1"),
      (3L, txt(toks("m", 1 to 100)), "en", "src1"),
      (4L, txt(toks("w", 1 to 20), leak.slice(0, 55)), "en", "src1")))
    scrubTable("contam_intake_idx")
    DedupOps.buildEvalIndex(spark, dir, "contam_intake_idx")
    spark.catalog.clearCache()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ctintake_").toString
    val train = Tables.documents(spark, dir).where(col("source") =!= "src0")
    train.where(col("doc_id") <= 2).coalesce(1)
      .write.parquet(s"$tmp/in/part_a.parquet")
    train.where(col("doc_id") > 2).coalesce(1)
      .write.parquet(s"$tmp/in/part_b.parquet")
    val stream = spark.readStream.schema(train.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/*")
    val sq = StreamingOps.contaminationIntakeStream(stream,
      "contam_intake_idx", s"$tmp/out", s"$tmp/ckpt")
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.read.parquet(s"$tmp/out").drop("epoch")
      .collect().map(_.toSeq).toSet
    val oneShot = DedupOps.contaminationProbeOf(spark, train, "contam_intake_idx")
      .collect().map(_.toSeq).toSet
    assert(oneShot.size == 2, s"docs 2 and 4 both leak: $oneShot")
    assert(streamed == oneShot,
      "micro-batch partitioning must not change any shard's leak set")
  }

  test("online substring intake: streamed micro-batches probing the persisted index equal the one-shot batch probe") {
    val (dir, _) = snapshotFixture()
    scrubTable("substr_intake_idx")
    DedupOps.buildSubstrIndex(spark, dir, "substr_intake_idx")
    spark.catalog.clearCache()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssintake_").toString
    val batchDocs = Tables.documents(spark, dir)
      .where(pmod(col("doc_id"), lit(10)) >= 8)
    // two maxFilesPerTrigger=1 micro-batches splitting the replica pair
    // (8 vs 19) across epochs — doc-grain rows must not care
    batchDocs.where(col("doc_id") <= 9).coalesce(1)
      .write.parquet(s"$tmp/in/part_a.parquet")
    batchDocs.where(col("doc_id") > 9).coalesce(1)
      .write.parquet(s"$tmp/in/part_b.parquet")
    val stream = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/in/*")
    val q = StreamingOps.substrIntakeStream(stream,
      "substr_intake_idx", s"$tmp/out", s"$tmp/ckpt")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$tmp/out").drop("epoch")
      .collect().map(_.toSeq).toSet
    val oneShot = DedupOps.substrProbeOf(spark, batchDocs, "substr_intake_idx")
      .collect().map(_.toSeq).toSet
    assert(oneShot.nonEmpty, "fixture must produce spans")
    assert(streamed == oneShot,
      "micro-batch partitioning must not change any doc's span set")
  }
}
