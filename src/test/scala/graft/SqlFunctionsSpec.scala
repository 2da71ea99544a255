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
    assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")))
    assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_sub")))
    assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("topk_by")))
  }
}
