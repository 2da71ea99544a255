package graft

import org.apache.spark.sql.graftext.GraftExtensions

class SqlFunctionsSpec extends SparkTestBase {

  test("vec_dot and topk_by are callable from SQL text") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(cast(1.0 AS FLOAT), cast(2.0 AS FLOAT)), " +
        "array(cast(3.0 AS FLOAT), cast(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)

    import spark.implicits._
    Seq((1L, 0.9, 10L), (1L, 0.5, 11L), (1L, 0.95, 12L), (2L, 0.1, 13L))
      .toDF("g", "score", "id").createOrReplaceTempView("scores")
    val top = spark.sql(
      "SELECT g, topk_by(score, id, 2) AS top FROM scores GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    assert(top(1L) == Seq((0.95, 12L), (0.9, 10L)))
    assert(top(2L) == Seq((0.1, 13L)))
  }

  test("vec_sub is callable from SQL text") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT vec_sub(array(cast(3.5 AS FLOAT), cast(2.0 AS FLOAT)), " +
        "array(cast(1.0 AS FLOAT), cast(0.5 AS FLOAT))) AS r")
      .head().getSeq[Float](0)
    assert(got == Seq(2.5f, 1.5f))
  }

  test("pair_combos is callable from SQL text") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT pair_combos(array(1L, 2L, 3L)) AS p")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("vec_quantize and gram_moments are callable from SQL text") {
    GraftExtensions.register(spark)
    val q = spark.sql(
      "SELECT vec_quantize(array(cast(0.25 AS FLOAT), cast(-0.25 AS FLOAT)), 2.0) AS q")
      .head().getSeq[Long](0)
    assert(q == Seq(1L, -1L), "HALF_UP ties away from zero")
    import spark.implicits._
    Seq(Seq(2L, 3L), Seq(4L, 5L)).toDF("qa").createOrReplaceTempView("qas")
    val g = spark.sql(
      "SELECT gram_moments(qa) AS g FROM qas")
      .select("g.n", "g.s1", "g.s2").head()
    assert(g.getSeq[Long](0) == Seq(2L, 2L))
    assert(g.getSeq[Long](1) == Seq(6L, 8L))
    val s2 = g.getSeq[org.apache.spark.sql.Row](2)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).longValueExact())).toMap
    // (0,0): 4+16, (0,1): 6+20, (1,1): 9+25
    assert(s2 == Map((0, 0) -> 20L, (0, 1) -> 26L, (1, 1) -> 34L))
  }

  test("wrong arity surfaces a named error, not a raw IndexOutOfBounds") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngrams(array('a','b'))").collect()
    }
    assert(e.getMessage.contains("word_ngrams expects 2 to 3"),
      s"got: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(cast(1.0 as float)))").collect()
    }
    assert(e2.getMessage.contains("vec_dot expects 2"), s"got: ${e2.getMessage}")
  }

  test("topk_by rejects wrong input types with a clear analysis error") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1, 2L)).toDF("int_score", "id").createOrReplaceTempView("bad_scores")
    val e = intercept[Exception] {
      spark.sql("SELECT topk_by(int_score, id, 2) FROM bad_scores").collect()
    }
    assert(e.getMessage.contains("topk_by expects"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT topk_by(CAST(1.0 AS DOUBLE), id, 0) FROM bad_scores").collect()
    }
    assert(e2.getMessage.contains("k >= 1"), e2.getMessage)
  }

  test("session built via GraftSession + withExtensions resolves the functions") {
    // the extensions path is what a cluster's spark.sql.extensions conf uses
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.register(spark)
    for (name <- Seq("vec_dot", "vec_norm", "vec_sub", "topk_by", "pair_combos",
        "alpha_token_count", "rolling_hash31", "word_ngrams", "chain_replace",
        "nearest_centroid", "nearest_code", "bloom_agg", "bloom_might_contain",
        "cms_estimate"))
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not registered")
  }

  test("text natives are callable from SQL text") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT alpha_token_count('ab 12 c3') AS a, " +
        "vec_norm(array(cast(3.0 AS FLOAT), cast(4.0 AS FLOAT))) AS n, " +
        "word_ngrams(array('a', 'b', 'c'), 2) AS g, " +
        "chain_replace('abcabc', array('ab', 'cc'), array('c', 'Z')) AS cr")
      .head()
    assert(r.getLong(0) == 2L) // "ab" and "c3" carry a letter; "12" does not
    assert(r.getDouble(1) == 5.0)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
    assert(r.getString(3) == "ZZ") // abcabc -ab>c-> cccc -cc>Z-> ZZ

    // parity with the Scala Column API on the rolling fingerprint
    import org.apache.spark.sql.functions.lit
    val viaScala = spark.range(1)
      .select(graft.functions.VectorFunctions.rolling_hash31(lit("the quick fox")))
      .head().getLong(0)
    val viaSql = spark.sql("SELECT rolling_hash31('the quick fox')").head().getLong(0)
    assert(viaSql == viaScala)
  }

  test("quantizer natives are callable from SQL text") {
    GraftExtensions.register(spark)
    // two centroids: emb (1,0) is closest (max cosine) to cl=7's (2,0)
    val cl = spark.sql(
      "SELECT nearest_centroid(array(" +
        "named_struct('cl', 7, 'centroid', array(cast(2.0 AS FLOAT), cast(0.0 AS FLOAT))), " +
        "named_struct('cl', 9, 'centroid', array(cast(0.0 AS FLOAT), cast(1.0 AS FLOAT)))), " +
        "array(cast(1.0 AS FLOAT), cast(0.1 AS FLOAT))) AS cl").head().getInt(0)
    assert(cl == 7)
    // ADC: sub (1,0) with |sub|^2=1; code 3 at (1,0) has d2 = 1-2+1 = 0
    val code = spark.sql(
      "SELECT nearest_code(array(" +
        "named_struct('code', 3, 'cent', array(cast(1.0 AS FLOAT), cast(0.0 AS FLOAT)), 'nc2', cast(1.0 AS DOUBLE)), " +
        "named_struct('code', 5, 'cent', array(cast(0.0 AS FLOAT), cast(1.0 AS FLOAT)), 'nc2', cast(1.0 AS DOUBLE))), " +
        "array(cast(1.0 AS FLOAT), cast(0.0 AS FLOAT)), cast(1.0 AS DOUBLE)) AS c")
      .head().getInt(0)
    assert(code == 3)
  }

  test("bloom build + probe round-trips in pure SQL — and stays codegen'd") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("bloom_vals")
    // CODEGEN_ONLY turns any interpreted-projection fallback into a hard
    // error: Spark's own BloomFilterMightContain generated Java that
    // Janino rejects ("java.lang.Long" is not an rvalue), so this query
    // silently ran every probe row interpreted until the BloomProbe
    // rewrite — this conf pin is the regression test for that.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // might_contain requires the filter as a constant or scalar subquery
      val r = spark.sql(
        "SELECT bloom_might_contain(" +
          "(SELECT bloom_agg(x, 100) FROM bloom_vals), 2L) AS hit, " +
          "bloom_might_contain(" +
          "(SELECT bloom_agg(x, 100) FROM bloom_vals), 424242L) AS miss").head()
      assert(r.getBoolean(0))
      assert(!r.getBoolean(1)) // deterministic xxhash64: not a member, not an FP
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("mm_header_parse is callable from SQL text — and stays codegen'd") {
    GraftExtensions.register(spark)
    // a hand-hexed 33-byte PNG header (w=2, h=3) + 1 body byte; unhex
    // keeps the whole chain inside SQL. CODEGEN_ONLY: an interpreted
    // fallback of the struct-building expression is a hard failure.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.sql(
        "SELECT p.format, p.width, p.height, p.sample_rate, p.body_bytes " +
          "FROM (SELECT mm_header_parse(unhex(" +
          "'89504E470D0A1A0A0000000D49484452" + // sig + len + IHDR
          "0000000200000003080200000000000000" + // w=2 h=3 + tail + crc
          "AB')) AS p)").head()
      assert(r.getString(0) == "png")
      assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
      assert(r.isNullAt(3) && r.getLong(4) == 1L)
      // the JPEG walker from SQL text: SOI + APP0 + SOF0 (h=2, w=3) + 1 body byte
      val j = spark.sql(
        "SELECT p.format, p.width, p.height, p.body_bytes " +
          "FROM (SELECT mm_header_parse(unhex(" +
          "'FFD8FFE000104A46494600010100000100010000" + // SOI + JFIF APP0
          "FFC00011080002000303012200021101031101" +    // SOF0: h=2, w=3
          "BB')) AS p)").head()
      assert(j.getString(0) == "jpeg" && j.getLong(1) == 3L &&
        j.getLong(2) == 2L && j.getLong(3) == 1L)
      // unknown magic quarantines as all-null, still under CODEGEN_ONLY
      val q = spark.sql(
        "SELECT p.format FROM (SELECT mm_header_parse(unhex('DEADBEEF')) AS p)")
        .head()
      assert(q.isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("bloom_might_contain rejects a non-constant, non-subquery filter argument") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("bloom_vals2")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT bloom_might_contain(bf, x) FROM " +
          "(SELECT x, (SELECT bloom_agg(x, 100) FROM bloom_vals2) AS bf " +
          "FROM bloom_vals2) t").collect()
    }
    assert(e.getMessage.contains("constant or UNCORRELATED scalar subquery"),
      s"unexpected error: ${e.getMessage}")
  }

  test("bloom_might_contain rejects a CORRELATED scalar subquery at analysis time") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 1L), (2L, 1L)).toDF("x", "k").createOrReplaceTempView("bloom_vals3")
    // a correlated subquery would be decorrelated into a join attribute,
    // turning the once-per-task eval into a deep-execution NPE — it must
    // die cleanly at analysis instead (Spark's own acceptance set)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT bloom_might_contain(" +
          "(SELECT bloom_agg(i.x, 100) FROM bloom_vals3 i WHERE i.k = o.k), " +
          "o.x) FROM bloom_vals3 o").collect()
    }
    assert(e.getMessage.contains("UNCORRELATED") ||
      e.getMessage.contains("correlated"),
      s"unexpected error: ${e.getMessage}")
  }
}
