package graft

import graft.operators.{AnalyticOps, PipelineOps, TextOps}

/** Physical-plan shape assertions for the scale claims the operator docs
  * make: map-side ops must not hash-shuffle (their only Exchange is the
  * contract sort's range partitioning), and the as-of join must be ONE
  * hash shuffle — the union+running-last design's whole point. AQE is off
  * in the test session, so plans are direct.
  */
class PlanShapeSpec extends SparkTestBase {

  private def hashExchanges(df: => org.apache.spark.sql.DataFrame): Int = {
    // other suites cache() frames over the same sf0.001 plans; a cache hit
    // would swap the subtree for InMemoryTableScan and hide the exchanges
    // this spec exists to count
    spark.catalog.clearCache()
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
  }

  test("repetition metrics are map-side: zero hash exchanges") {
    assert(hashExchanges(TextOps.repetition(spark, sf0001)) == 0)
  }

  test("chunking is map-side: zero hash exchanges") {
    assert(hashExchanges(PipelineOps.chunkDocs(spark, sf0001)) == 0)
  }

  test("as-of join is exactly one hash shuffle (union + running-last)") {
    assert(hashExchanges(AnalyticOps.asofJoin(spark, sf0001)) == 1)
  }

  test("int8 quantization is map-side: zero hash exchanges") {
    assert(hashExchanges(
      graft.operators.SimilarityOps.embedQuantize(spark, sf0001)) == 0)
  }

  test("corpus shuffle windows are partitioned — no single-partition sort") {
    spark.catalog.clearCache()
    val plan = PipelineOps.corpusShuffle(spark, sf0001)
      .queryExecution.executedPlan.toString
    // a Window over an EMPTY partition spec funnels the corpus through one
    // task — the formulation this operator's scaladoc promises to avoid
    val emptyPartitionWindow = "Window \\[[^\\]]*\\], \\[\\]".r
    assert(emptyPartitionWindow.findFirstIn(plan).isEmpty,
      s"found unpartitioned window in:\n$plan")
    assert(plan.contains("windowspecdefinition(shard"),
      "rank window must partition by shard")
  }
}
