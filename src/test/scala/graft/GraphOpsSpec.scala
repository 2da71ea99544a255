package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnalyticOps, GraphOps}

/** GraphOps (co-purchase lift, triangle enumeration) + the AnalyticOps
  * round-4 additions (gap-fill, retention): planted fixtures with
  * hand-computed expectations, plus equivalence of the degree-oriented
  * triangle join to the naive id-ordered triple join on real data.
  */
class GraphOpsSpec extends SparkTestBase {

  private def writeLineitem(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("triangles: planted K4 yields exactly its four triangles") {
    // two orders with all of {1,2,3,4} → every pair has support 2 (K4);
    // part 5 co-occurs only once → below support, never in a triangle
    val dir = writeLineitem(
      (1L to 4L).map(p => (100L, p)) ++ (1L to 4L).map(p => (101L, p)) :+ (100L, 5L))
    val got = GraphOps.triangles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: degree-oriented join == naive id-ordered triple join (sf0.001)") {
    val got = GraphOps.triangles(spark, sf0001)
    // independent naive formulation: a<b edges joined three ways by id order
    val op = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = op.alias("x").join(op.alias("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 2)
      .select("a", "b").cache()
    val naive = e.alias("e1")
      .join(e.alias("e2"), col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
      .join(e.alias("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("part_x"), col("e1.b").as("part_y"),
        col("e2.b").as("part_z"))
    assert(got.count() == naive.count())
    assert(got.except(naive).count() == 0 && naive.except(got).count() == 0)
  }

  test("copurchase lift: hand-computed independence ratio") {
    // 4 orders; parts 1,2 together twice, each in 2 orders total:
    // lift = n_ab*N/(n_a*n_b) = 2*4/(2*2) = 2.0. Parts 3,4 share one
    // order only → support 1, filtered out.
    val dir = writeLineitem(Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L),
      (4L, 3L)))
    val got = GraphOps.copurchaseLift(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("part_a") == 1L && r.getAs[Long]("part_b") == 2L)
    assert(r.getAs[Long]("n_ab") == 2L && r.getAs[Long]("n_a") == 2L &&
      r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("lift") == 2.0)
  }

  test("copurchase lift: duplicate lineitems of the same part count once per order") {
    // part 1 appears twice in order 1 (two lineitems) — the basket is a
    // SET, so pair (1,2) support is 2, not inflated
    val dir = writeLineitem(Seq(
      (1L, 1L), (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L)))
    val r = GraphOps.copurchaseLift(spark, dir).collect()
    assert(r.length == 1 && r.head.getAs[Long]("n_ab") == 2L)
  }

  test("pagerank: hand-computed integer masses on a planted star") {
    // star: center 10 — leaves 1,2,3; every edge co-ordered twice.
    // Round-by-round integer mass (damping 85/100, base 150000):
    //   m1(c)=150000+3*850000=2700000   m1(l)=150000+85000000/300=433333
    //   m2(c)=150000+3*368333=1254999   m2(l)=150000+765000=915000
    //   m3(c)=150000+3*777750=2483250   m3(l)=150000+355583=505583
    val dir = writeLineitem(
      (1L to 3L).flatMap(l => Seq((l * 10, 10L), (l * 10, l), (l * 10 + 1, 10L), (l * 10 + 1, l))))
    val got = GraphOps.pagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 2483250L), (1L, 505583L), (2L, 505583L), (3L, 505583L)))
  }

  test("gapfill: zero-filled gap days, forward-filled staleness, running total") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gap_").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def day(n: Int) = new java.sql.Timestamp(t0.getTime + n * 86400000L)
    // user 1: two events day0, one event day3; nothing between
    Seq(
      (1L, day(0), 1L, "view", 1.0, "{}"),
      (2L, day(0), 1L, "view", 1.0, "{}"),
      (3L, day(3), 1L, "buy", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticOps.gapfillActivity(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 2L, 2L, 0L),
      ("2024-03-02", 0L, 2L, 1L),
      ("2024-03-03", 0L, 2L, 2L),
      ("2024-03-04", 1L, 3L, 0L)))
  }

  test("wau: each activity covers 7 report days, edge windows clipped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wau_").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
    def day(n: Int) = new java.sql.Timestamp(t0.getTime + n * 86400000L)
    // user 1 active day0, user 2 active day3 → report days end at day3
    Seq((1L, day(0), 1L), (2L, day(3), 2L))
      .map { case (e, ts, u) => (e, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticOps.wau(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 1L), ("2024-03-02", 1L),
      ("2024-03-03", 1L), ("2024-03-04", 2L)))
  }

  test("retention: cohort sizes and retained fractions from first-seen days") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ret_").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:30:00")
    def day(n: Int) = new java.sql.Timestamp(t0.getTime + n * 86400000L)
    // users 1,2 first seen day0; user 1 returns day1; user 3 first seen day1
    Seq(
      (1L, day(0), 1L), (2L, day(0), 2L),
      (3L, day(1), 1L), (4L, day(1), 3L))
      .map { case (e, ts, u) => (e, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticOps.retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 0L, 2L, 2L, 1.0),
      ("2024-03-01", 1L, 1L, 2L, 0.5),
      ("2024-03-02", 0L, 1L, 1L, 1.0)))
  }

  test("shared chunks: planted common 50-token prefix across two docs is found") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk_").toString
    val common = (1 to 50).map(i => s"w$i").mkString(" ")
    val tailA = (1 to 30).map(i => s"a$i").mkString(" ")
    val tailB = (1 to 30).map(i => s"b$i").mkString(" ")
    Seq(
      (1L, s"$common $tailA", "en", "src0", 0L),
      (2L, s"$common $tailB", "en", "src0", 0L),
      (3L, tailA + " " + tailB, "en", "src0", 0L)) // no aligned shared chunk
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.DedupOps.chunkShared(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("n_occ") == 2L)
    assert(r.getAs[Long]("min_doc") == 1L && r.getAs[Long]("max_doc") == 2L)
  }

  test("substring dedup finds the unaligned 200-token shared span that chunk dedup provably misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_substr_").toString
    // a 200-token span S planted at token 101 of doc 1 and token 38 of
    // doc 2 — the 63-token misalignment guarantees NO 50-token
    // stride-aligned window of doc 1 coincides with one of doc 2, so
    // fixed-window chunk dedup sees nothing; every interior 20-gram of
    // S matches, so the substring detector must report EXACTLY the
    // maximal span. Doc 3 shares nothing. Doc 4 replicates doc 2
    // byte-for-byte (multiplicity rides n_docs, never a new row).
    val span = (1 to 200).map(i => s"s$i").mkString(" ")
    val padA = (1 to 100).map(i => s"a$i").mkString(" ")
    val padB = (1 to 37).map(i => s"b$i").mkString(" ")
    val t1 = s"$padA $span " + (1 to 60).map(i => s"c$i").mkString(" ")
    val t2 = s"$padB $span " + (1 to 25).map(i => s"d$i").mkString(" ")
    val t3 = (1 to 300).map(i => s"z$i").mkString(" ")
    Seq((1L, t1, "en", "src0", 0L), (2L, t2, "en", "src0", 0L),
      (3L, t3, "en", "src0", 0L), (4L, t2, "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // chunk dedup (aligned 50-token windows) sees the byte-identical
    // replica pair (2,4) but NO shared chunk between the DISTINCT texts
    // 1 and 2 — the unaligned-span gap this operator closes
    val chunkPairs = graft.operators.DedupOps.chunkShared(spark, dir).collect()
      .map(r => (r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc"))).toSet
    assert(chunkPairs == Set((2L, 4L)),
      s"aligned chunk dedup must miss the unaligned span: $chunkPairs")
    val spans = graft.operators.DedupOps.substrDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_docs_a"), r.getAs[Long]("n_docs_b"),
          r.getAs[Long]("a_start"), r.getAs[Long]("b_start"),
          r.getAs[Long]("span_tokens"))))
    assert(spans.length == 1, s"exactly the one maximal span: ${spans.toSeq}")
    // canonical pair ordering is by text fingerprint; both directions
    // carry the same span geometry, so just check the unordered pair
    val ((da, db), (na, nb, as_, bs, st)) = spans.head
    assert(Set(da, db) == Set(1L, 2L), s"pair: $da,$db")
    val (aSide, bSide) = if (da == 1L) ((na, as_), (nb, bs)) else ((nb, bs), (na, as_))
    assert(aSide == ((1L, 101L)), s"doc-1 side: $aSide")
    assert(bSide == ((2L, 38L)), s"doc-2 side (doc 4 rides multiplicity): $bSide")
    assert(st == 200L, s"maximal span length: $st")
  }
}
