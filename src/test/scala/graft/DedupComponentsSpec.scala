package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** dupComponents, contamination, tfidf, repetition — planted fixtures with
  * hand-computed expectations plus structural properties on sf0.001.
  */
class DedupComponentsSpec extends SparkTestBase {

  test("dup components: labels agree with the pair graph; canonical is the min id") {
    val comps = DedupOps.dupComponents(spark, sf0001).cache()
    val label = comps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge endpoint pair shares a component label
    val pairs = DedupOps.hammingNearDup(spark, sf0001)
      .select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(label(r.getLong(0)) == label(r.getLong(1)),
        s"pair (${r.getLong(0)},${r.getLong(1)}) split across components")
    }
    // the label is the component minimum and labels itself
    comps.collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      assert(label(r.getLong(1)) == r.getLong(1), "component root must label itself")
    }
    // comp_size is consistent with the membership count
    val sizes = comps.groupBy("comp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    comps.collect().foreach(r => assert(sizes(r.getLong(1)) == r.getLong(2)))
  }

  test("components: a diameter-9 chain converges to one min-labeled cluster") {
    // min-label propagation moves one hop per round, so this path graph
    // forces ~9 propagation rounds through the observed-metric convergence
    // path — the organic near-dup fixtures converge in 1-2 rounds and
    // would never exercise a deep loop
    import spark.implicits._
    val chain = (1L to 9L).map(i => (i, i + 1))         // 1-2-3-...-10
    val pairs = (chain :+ ((20L, 21L))).toDF("doc_a", "doc_b")
    val got = DedupOps.componentsOfPairs(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1L to 10L).foreach { id =>
      assert(got(id) == ((1L, 10L)), s"node $id: ${got(id)}")
    }
    assert(got(20L) == ((20L, 2L)) && got(21L) == ((20L, 2L)))
    assert(got.size == 12)
  }

  test("dup canonical keeps exactly one doc per component — the longest, min-id on ties") {
    val comps = DedupOps.dupComponents(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lens = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = DedupOps.dupCanonical(spark, sf0001).collect()
    // one keeper per component, and it is argmax(n_chars, min doc_id)
    assert(got.map(_.getLong(0)).distinct.length == got.length)
    got.foreach { r =>
      val (comp, keepId, keepChars, size, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dropped == size - 1)
      val members = comps.collect { case (id, c) if c == comp => id }
      assert(members.size.toLong == size)
      val best = members.map(id => (-lens(id), id)).min
      assert(keepId == best._2, s"comp $comp keeper $keepId != expected ${best._2}")
      assert(keepChars == lens(keepId))
    }
  }

  test("minhash oracle variant: identical docs match on all 32 mins; disjoint docs don't collide") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val dir = documentsFixture(Seq(
      (0L, base, "en", "s1"),
      (1L, base, "en", "s1"),     // identical → every band collides
      (2L, other, "en", "s1")))   // disjoint shingles
    val got = DedupOps.minhashOracle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getAs[Long]("n_matching"), r.getAs[Double]("est_jaccard"))).toMap
    assert(got.get((0L, 1L)).contains((32L, 1.0)), s"identical pair must fully match: $got")
    assert(!got.contains((0L, 2L)) && !got.contains((1L, 2L)),
      s"disjoint docs should not band-collide: $got")
  }

  test("contamination: planted shingle overlap is counted exactly") {
    val dir = documentsFixture(Seq(
      (0L, "alpha beta gamma delta", "en", "src0"),    // eval: shingles "alpha beta gamma", "beta gamma delta"
      (1L, "alpha beta gamma zeta", "en", "src1"),     // shares "alpha beta gamma" only
      (2L, "eta theta iota kappa", "en", "src1"),      // shares none
      (3L, "alpha beta gamma delta", "en", "src2")))   // identical: both shingles shared
    val got = DedupOps.contamination(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_shared") == 1L)
    assert(got(1L).getAs[Long]("n_shingles") == 2L)
    assert(got(1L).getAs[Double]("contam_frac") == 0.5)
    assert(got(2L).getAs[Long]("n_shared") == 0L)
    assert(got(3L).getAs[Long]("n_shared") == 2L)
    assert(got(3L).getAs[Double]("contam_frac") == 1.0)
    assert(!got.contains(0L), "eval docs are not scored")
  }

  test("curation gate: each reason bit fires on its planted doc") {
    import graft.operators.PipelineOps
    val dir = documentsFixture(Seq(
      (0L, "the quick brown fox jumps over a lazy dog tonight", "en", "src1"), // clean
      (1L, "a b", "en", "src1"),                                               // bit0: too short
      (2L, "x y z x y z x y z x y z", "en", "src1"),                           // bits1+2: repetition+boilerplate
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src1"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src2"), // bit4: exact dup of 10
      (20L, "one two three four five six seven eight nine ten", "en", "src0"), // eval doc
      (21L, "one two three four five aaa bbb ccc ddd eee", "en", "src1")))     // bit3: 3/8 shingles shared
    val got = PipelineOps.curation(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("flags"), r.getAs[Boolean]("keep"))).toMap
    assert(got(0L) == (0L, true))
    assert(got(1L) == (1L, false), s"short doc: ${got(1L)}")
    assert(got(2L) == (6L, false), s"repetition+boilerplate: ${got(2L)}")
    assert(got(10L) == (0L, true))
    assert(got(11L) == (16L, false), s"exact dup: ${got(11L)}")
    assert(got(20L) == (0L, true), "eval docs are not contamination-flagged")
    assert(got(21L) == (8L, false), s"contaminated: ${got(21L)}")
  }

  test("mixture resample: sqrt temperature rates; smallest source keeps everything") {
    import graft.operators.PipelineOps
    val dir = documentsFixture(
      (0 until 4).map(i => (i.toLong, s"uniq text number $i body", "en", "big")) :+
        (9L, "the single small source doc", "en", "small"))
    val got = PipelineOps.mixtureResample(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Double]("rate"),
        r.getAs[Long]("n_kept"))).toMap
    assert(got("small") == (1L, 1.0, 1L), s"smallest source keeps all: $got")
    val (n, rate, kept) = got("big")
    assert(n == 4L && rate == 0.5, s"sqrt(1/4) rate: $got")
    assert(kept <= n)
  }

  test("chunking: stride starts, overlap sizes, and fingerprints line up") {
    import graft.operators.PipelineOps
    val words = (1 to 85).map(i => s"w$i")
    val dir = documentsFixture(Seq(
      (0L, words.mkString(" "), "en", "s"),
      (1L, "tiny doc", "en", "s")))
    val got = PipelineOps.chunkDocs(spark, dir).collect()
    val d0 = got.filter(_.getLong(0) == 0L)
    // start 81 would add only 5 new tokens (<= 10 overlap) — fully inside
    // chunk 41..85, so it must NOT be emitted
    assert(d0.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 50L), (41L, 45L)), "starts 1/41 with sizes 50/45, no stub chunk")
    // fingerprint of the last chunk matches the actual token slice
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(words.slice(40, 85).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d0.find(_.getLong(2) == 41L).get.getString(4) == fp)
    // short doc: one chunk covering both tokens
    val d1 = got.filter(_.getLong(0) == 1L)
    assert(d1.length == 1 && d1(0).getLong(3) == 2L)
  }

  test("tfidf: hand-computed scores and ranks on a two-source fixture") {
    val dir = documentsFixture(Seq(
      (0L, "apple banana apple", "en", "s1"),
      (1L, "banana cherry", "en", "s2")))
    // N=2; df: apple 1, banana 2, cherry 1
    val got = TextOps.tfidf(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val a = got(("s1", "apple"))
    assert(a.getAs[Long]("tf") == 2L && a.getAs[Long]("df") == 1L)
    assert(a.getAs[Double]("tf_idf") == 4.0 && a.getAs[Long]("rank") == 1L)
    assert(got(("s1", "banana")).getAs[Double]("tf_idf") == 1.0)
    assert(got(("s2", "cherry")).getAs[Long]("rank") == 1L)
    assert(got(("s2", "banana")).getAs[Double]("tf_idf") == 1.0)
  }

  test("tfidf: at most 5 ranked terms per source, ranks contiguous from 1") {
    val got = TextOps.tfidf(spark, sf0001)
    val perSource = got.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    assert(perSource.length == 20)
    perSource.foreach { r =>
      assert(r.getAs[Long]("n") <= 5L && r.getAs[Long]("mn") == 1L &&
        r.getAs[Long]("mx") == r.getAs[Long]("n"))
    }
  }

  test("repetition: duplicate fractions exact; short docs get null gram columns") {
    val dir = documentsFixture(Seq(
      (0L, "a a b", "en", "s"),        // 3 tokens, 2 distinct; 1 gram, 0 dup
      (1L, "a b", "en", "s"),          // < 3 tokens: gram columns null
      (2L, "x y x y x y", "en", "s"))) // 6 tokens 2 distinct; grams: xyx yxy xyx yxy -> 4 grams 2 distinct
    val got = TextOps.repetition(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Double]("dup_token_frac") == 1.0 / 3)
    assert(got(0L).getAs[Long]("n_grams") == 1L &&
      got(0L).getAs[Double]("dup_gram_frac") == 0.0)
    assert(got(1L).isNullAt(got(1L).fieldIndex("n_grams")) &&
      got(1L).isNullAt(got(1L).fieldIndex("dup_gram_frac")))
    assert(got(2L).getAs[Long]("n_grams") == 4L &&
      got(2L).getAs[Long]("n_distinct_grams") == 2L &&
      got(2L).getAs[Double]("dup_gram_frac") == 0.5)
  }
}
