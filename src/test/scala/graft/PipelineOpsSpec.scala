package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

class PipelineOpsSpec extends SparkTestBase {

  test("top-p coverage keeps largest docs through the inclusive 80% boundary") {
    // lengths 50,30,15,5 → total 100; runnings desc: 50,80,95,100.
    // running*5 <= total*4 keeps 50 AND the exact-80 row — the integer
    // comparison makes the boundary inclusive with no float threshold.
    val dir = documentsFixture(Seq(
      (0L, "a" * 50, "en", "s"), (1L, "a" * 30, "en", "s"),
      (2L, "a" * 15, "en", "s"), (3L, "a" * 5, "en", "s")))
    val got = PipelineOps.topPCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((0L, 50L), (1L, 80L)), s"got $got")
  }

  test("perceptron trainer matches an exact reference batch-update loop") {
    // Mixed labels: doc 0 fails the quality rule (5 tokens < 10 → y=-1);
    // doc 1 passes (12 distinct non-stopword tokens → y=+1); doc 2 fails
    // (all-stopword). Every arithmetic step is integer-exact, so the
    // reference loop below must agree to the last unit.
    val rows = Seq(
      (0L, "the the the a a", "en", "s"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12", "en", "s"),
      (2L, "the a the a the a the a the a the a", "en", "s"))
    val dir = documentsFixture(rows)
    // reference: same features/label/update computed in plain Scala
    val feats = rows.map { case (_, text, _, _) =>
      val t = text.split(" ", -1)
      val x = Array(1L, t.length.toLong, t.distinct.length.toLong,
        t.count(w => w == "the" || w == "a").toLong)
      val ok = x(1) >= 10 && x(3).toDouble / x(1) < 0.3 &&
        x(2).toDouble / x(1) > 0.2
      (x, if (ok) 1L else -1L)
    }
    var w = Array(0L, 0L, 0L, 0L)
    val expected = (1 to 3).map { step =>
      val mis = feats.filter { case (x, y) =>
        y * (w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3)) <= 0 }
      w = w.zipWithIndex.map { case (wi, i) =>
        wi + mis.map { case (x, y) => y * x(i) }.sum }
      (step, mis.size.toLong, w(0), w(1), w(2), w(3))
    }
    val got = PipelineOps.perceptronTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // sanity: the trajectory must actually move (not all-zero weights)
    assert(expected.last._3 != 0L || expected.last._4 != 0L)
  }

  test("dataset card counts docs, tokens, diversity, and dup mass exactly") {
    // 5 docs, one duplicated text in THREE copies (all 3 count as dup mass),
    // two sources, two langs, token counts 2+2+2+3+4
    val dir = documentsFixture(Seq(
      (0L, "a b", "en", "s1"), (1L, "a b", "en", "s1"), (2L, "a b", "de", "s2"),
      (3L, "c d e", "en", "s1"), (4L, "f g h i", "de", "s2")))
    val r = PipelineOps.datasetCard(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((5L, 13L, 2L, 2L, 3L)), s"got $row")
    assert(row.getDouble(5) == 3.0 / 5.0)
  }

  test("corpus shuffle is a total permutation with contiguous shard positions") {
    val got = PipelineOps.corpusShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(got.length == nDocs, "every doc appears exactly once")
    assert(got.map(_._1).distinct.length == got.length)
    // per shard: positions are exactly 1..n (a reader can stream its shard
    // by position with no gaps); shard is the first md5 nibble
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    got.take(20).foreach { case (id, shard, _) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(shard == java.lang.Long.parseLong(hex.substring(0, 1), 16),
        s"doc $id shard $shard != first md5 nibble of '$id'")
    }
  }

  test("threshold sweep: cumulative counts monotone, endpoints exact") {
    val rows = PipelineOps.thresholdSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // scores strictly descending; cum_docs strictly increasing;
    // cum_pos and recall nondecreasing; precision in [0, 1]
    rows.sliding(2).foreach { case Array((s1, d1, p1, _, r1), (s2, d2, p2, _, r2)) =>
      assert(s1 > s2 && d1 < d2 && p1 <= p2 && r1 <= r2)
    case _ => ()
    }
    rows.foreach { case (_, d, p, prec, _) =>
      assert(p <= d && prec >= 0.0 && prec <= 1.0)
    }
    // the loosest threshold admits everything: recall exactly 1, and
    // cum counts equal the corpus totals the label rule implies
    val feats = Tables.documents(spark, sf0001).count()
    val (_, lastDocs, lastPos, _, lastRecall) = rows.last
    assert(lastDocs == feats && lastRecall == 1.0)
    assert(lastPos == rows.map(_._3).max)
  }

  test("sessionize: 30-minute gaps split sessions, counts add up") {
    val sess = PipelineOps.sessionize(spark, sf0001).cache()
    // every event lands in exactly one session
    val total = sess.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf0001).count())
    // session invariants: start <= end, contiguous per-user indexes from 1
    assert(sess.where(col("start_sec") > col("end_sec")).count() == 0)
    val idx = sess.groupBy("user_id")
      .agg(min("session_idx").as("mn"), max("session_idx").as("mx"),
        count(lit(1)).as("n"))
    assert(idx.where(col("mn") =!= 1L || col("mx") =!= col("n")).count() == 0)
  }

  test("split_assign: deterministic 80/10/10-ish content-keyed split") {
    val s1 = PipelineOps.splitAssign(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val s2 = PipelineOps.splitAssign(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2, "split must be deterministic")
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac $frac")
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
  }

  test("pii redaction leaves no email, phone, or long digit run behind") {
    val out = PipelineOps.piiRedact(spark, sf0001)
      .collect().map(_.getString(1))
    assert(out.nonEmpty)
    out.foreach { s =>
      assert(!s.contains("@"), s"email survived: $s")
      assert(!"555-[0-9]".r.findFirstIn(s).isDefined, s"phone survived: $s")
      assert(!"[0-9]{6,}".r.findFirstIn(s).isDefined, s"id run survived: $s")
      assert(s.contains("<EMAIL>") && s.contains("<PHONE>") && s.contains("<ID>"),
        s"placeholders missing (redaction not exercised): $s")
    }
  }

  test("scrub masks every digit run") {
    val bad = PipelineOps.scrubPayload(spark, sf0001)
      .where(col("props_scrubbed").rlike("[0-9]"))
    assert(bad.count() == 0)
  }

  test("chunk dedup: planted repeated span counted keep-first; distinct doc untouched") {
    // doc 1: one token repeated 130× → chunks at 1/41/81 share one fp —
    // first is canonical, the later two are removable (2 dups, 100 toks);
    // doc 2: 130 distinct tokens → same chunk count, zero dups
    val dir = documentsFixture(Seq(
      (1L, Seq.fill(130)("w").mkString(" "), "en", "s0"),
      (2L, (1 to 130).map("t" + _).mkString(" "), "en", "s0")))
    val got = PipelineOps.chunkDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 3L, 2L, 100L), (2L, 3L, 0L, 0L)))
  }

  test("fast chunk scrub is row-identical to the registered md5 form") {
    val a = PipelineOps.chunkScrub(spark, sf0001).collect().map(_.toSeq).toSeq
    val b = PipelineOps.chunkScrubFast(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("curation funnel telescopes and reconciles exactly with the curation gate") {
    // against sf0.001: n_in chains (out_k == in_{k+1}), the first stage
    // sees the whole corpus, Σ dropped == flagged docs, final survivors
    // == q_curation keep==true — the funnel cannot disagree with the gate
    val gate = PipelineOps.curation(spark, sf0001).collect()
    val funnel = PipelineOps.curationFunnel(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(funnel.map(_._1).toSeq == Seq("1_exact_dup", "2_quality",
      "3_repetition", "4_boilerplate", "5_contamination"))
    assert(funnel.head._2 == gate.length, "stage 1 sees the whole corpus")
    funnel.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 == b._2, s"telescope broken between ${a._1} and ${b._1}")
    }
    funnel.foreach { case (st, in, drop, out) =>
      assert(in - drop == out, s"$st arithmetic")
    }
    assert(funnel.map(_._3).sum == gate.count(_.getLong(2) != 0L),
      "total dropped == flagged docs")
    assert(funnel.last._4 == gate.count(_.getBoolean(3)),
      "survivors == gate keep count")
  }

  test("token budget: τ=1/2 weights, targets and epochs hand-computed on exact squares") {
    // sources with 100 and 400 tokens: √ are exact (10, 20) → weights
    // exactly 1/3 and 2/3 of the 10M budget; every number checkable
    val doc10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val doc40 = (1 to 40).map(i => s"t$i").mkString(" ")
    val rows = (0 until 10).map(i => (i.toLong, doc10, "en", "sA")) ++
      (10 until 20).map(i => (i.toLong, doc40, "en", "sB"))
    val dir = documentsFixture(rows)
    val got = PipelineOps.tokenBudget(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6), r.getBoolean(7))).toMap
    assert(got("sA") == ((10L, 100L, 0.2, 1.0 / 3.0, 3333333L,
      33333.33, true)))
    assert(got("sB") == ((10L, 400L, 0.8, 2.0 / 3.0, 6666666L,
      16666.665, true)))
  }

  test("chunk scrub: repeated spans removed keep-first; clean docs reconstruct byte-identically") {
    val span = (1 to 50).map("a" + _).mkString(" ")     // one exact chunk
    val clean = (1 to 130).map("t" + _).mkString(" ")   // 130 distinct tokens
    val selfRep = Seq.fill(130)("w").mkString(" ")      // all 3 chunks same fp
    val dir = documentsFixture(Seq(
      (1L, span, "en", "s0"),     // canonical owner of the span
      (2L, span, "en", "s0"),     // cross-doc dup: fully scrubbed
      (3L, selfRep, "en", "s0"),  // intra-doc dup: keeps first chunk's stride
      (4L, clean, "en", "s0")))   // no dups: reconstructs the original
    val got = PipelineOps.chunkScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 50L, 50L, span),
      (2L, 1L, 1L, 50L, 0L, ""),
      // chunks at 1/41/81 share one fp; the canonical (idx 0) owns its
      // 40-token stride, the two dups' spans (toks 41..130) are removed
      (3L, 3L, 2L, 130L, 40L, Seq.fill(40)("w").mkString(" ")),
      (4L, 3L, 0L, 130L, 130L, clean)))
  }

  test("source cap: K lowest ids survive per source; plan has no skewed window") {
    import org.apache.spark.sql.functions.col
    // source A: 25 docs (ids 100..124) — cap K=20 binds, survivors are
    // the 20 LOWEST ids; source B: 3 docs — under the cap, all kept
    val rows = (100L to 124L).map(i => (i, s"d$i", "en", "A")) ++
      Seq((10L, "x", "en", "B"), (11L, "y", "en", "B"), (12L, "z", "en", "B"))
    val dir = documentsFixture(rows)
    val df = graft.operators.PipelineOps.sourceCap(spark, dir)
    val got = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert((100L to 119L).forall(got(_)), "lowest 20 of A kept")
    assert((120L to 124L).forall(!got(_)), "A's 5 highest dropped")
    assert(Seq(10L, 11L, 12L).forall(got(_)), "B under the cap: all kept")
    // the scale claim is structural: survivor selection must be the
    // partial top-k aggregate, never a row_number window over a skewed
    // source partition (which sorts the biggest domain on one task)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(plan.toLowerCase.contains("topkbyscore"), "partial top-k missing")
    // the join is unhinted (web-scale source cardinality must be able to
    // fall back to a shuffled hash join) — at THIS size the sources·K
    // survivor set auto-broadcasts, and nothing may sort-merge
    assert(plan.contains("BroadcastHashJoin"), "survivor set should auto-broadcast here")
    assert(!plan.contains("SortMergeJoin"), "no sort anywhere in the cap")
  }

  test("quality classifier: separable planted corpus reaches zero errors; NULL-source docs train too") {
    import graft.operators.PipelineOps
    // craft tokens by their ACTUAL md5 bucket so the two classes live in
    // disjoint hashed dimensions: positives are 12 distinct bucket-known
    // tokens (quality rule: >=10 tokens, distinct ratio, few stopwords
    // -> y=+1); negatives are 3-token docs (rule: too short -> y=-1)
    def bucket(tok: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % PipelineOps.ClfDim).toInt
    }
    val toks = (0 until 4000).map(i => s"tk$i")
    val pos = toks.filter(t => bucket(t) < 3).take(24)
    val neg = toks.filter(t => bucket(t) >= 3).take(6)
    assert(pos.size == 24 && neg.size == 6, "bucket mining must find tokens")
    val docs = Seq(
      (0L, pos.take(12).mkString(" "), "en", "s"),
      (1L, pos.drop(12).mkString(" "), "en", "s"),
      (2L, neg.take(3).mkString(" "), "en", "s"),
      (3L, neg.drop(3).mkString(" "), "en", "s"),
      // a replica of doc 0: the fp-grain gradient must weight it (m=2)
      (4L, pos.take(12).mkString(" "), "en", "s"))
    val dir = documentsFixture(docs)
    val got = PipelineOps.qualityClfTrain(spark, dir).collect()
      .map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_mis")).toMap
    // step 1 starts from w=0: every margin is 0 <= 0, so the whole mass
    // (5 docs, replica counted) is misclassified; the first update alone
    // separates the planted classes, so steps 2 and 3 are clean
    assert(got(1) == 5L, s"step-1 mass: $got")
    assert(got(2) == 0L && got(3) == 0L, s"separable corpus must converge: $got")
    // determinism: the trajectory is exact integer arithmetic
    val again = PipelineOps.qualityClfTrain(spark, dir).collect().map(_.toSeq).toSeq
    assert(again == PipelineOps.qualityClfTrain(spark, dir).collect().map(_.toSeq).toSeq)
  }
}
