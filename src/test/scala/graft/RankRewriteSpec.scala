package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftext.RewriteRankOneWindow

/** RewriteRankOneWindow: the rank-1 window idiom becomes a sort-free
  * min_by aggregate when provably equivalent, and is left alone when not.
  * Installed here via experimental.extraOptimizations (the shared test
  * session predates the extensions hook); GraftSession wires it through
  * GraftExtensions for real sessions.
  */
class RankRewriteSpec extends SparkTestBase {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(RewriteRankOneWindow)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  private def rankOne(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("dt", "user_id").orderBy("event_id")
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
  }

  test("rewrite fires: no Window in the optimized plan, min_by instead; rows identical") {
    import spark.implicits._
    val df = Seq(
      ("d1", 1L, 10L, "a"), ("d1", 1L, 7L, "b"), ("d1", 2L, 5L, "c"),
      ("d2", 1L, 3L, "d"), ("d2", 1L, 4L, "e"))
      .toDF("dt", "user_id", "event_id", "payload")
    val without = rankOne(df).collect().toSet
    withRule {
      val q = rankOne(df)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("Window"), s"window survived:\n$opt")
      assert(opt.contains("min_by"), s"expected min_by aggregate:\n$opt")
      assert(q.collect().toSet == without)
      // the point at scale: a partial aggregate BEFORE the exchange, so
      // the shuffle carries groups, not raw rows
      assert(q.queryExecution.executedPlan.toString.contains("partial_min_by"),
        "expected map-side partial min_by before the shuffle")
    }
  }

  test("nullable ordering key rewrites with null-first encoding, matching the window") {
    import spark.implicits._
    val df = Seq(("d1", 1L, Some(10L), "a"), ("d1", 1L, None, "b"),
      ("d1", 2L, Some(3L), "c"))
      .toDF("dt", "user_id", "event_id", "payload")
    val without = rankOne(df).collect().toSet
    withRule {
      val q = rankOne(df)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("Window"), s"nullable key should rewrite now:\n$opt")
      // row_number ASC NULLS FIRST picks the null-key row — so must min_by
      val byUser = q.collect().map(r => r.getLong(1) -> r.getString(3)).toMap
      assert(byUser == Map(1L -> "b", 2L -> "c"))
      assert(q.collect().toSet == without)
    }
  }

  test("ties: the surviving row is one coherent input row, never a column mix") {
    import spark.implicits._
    // same ordering key twice with TWO co-varying payload columns: a
    // per-column-min rewrite would tear ("left","R2")/("right","L2")
    val df = Seq(("d1", 1L, 5L, "left", "L2"), ("d1", 1L, 5L, "right", "R2"))
      .toDF("dt", "user_id", "event_id", "p1", "p2")
    withRule {
      val w = Window.partitionBy("dt", "user_id").orderBy("event_id")
      val rows = df.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).collect()
      assert(rows.length == 1)
      val pair = (rows(0).getString(3), rows(0).getString(4))
      assert(pair == ("left", "L2") || pair == ("right", "R2"),
        s"torn row: $pair")
    }
  }

  test("guard: empty PARTITION BY (global rank-1) keeps the window form") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("event_id", "payload")
    withRule {
      val w = Window.orderBy("event_id")
      val q = df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      assert(q.queryExecution.optimizedPlan.toString.contains("Window"),
        "global window must not become a row-fabricating global aggregate")
      // the equivalence failure the guard prevents: empty input → 0 rows
      val empty = df.where(col("event_id") < 0)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      assert(empty.count() == 0)
    }
  }

  test("rank > 1 filters and descending orders are untouched") {
    import spark.implicits._
    val df = Seq(("d1", 1L, 10L, "a"), ("d1", 1L, 7L, "b"))
      .toDF("dt", "user_id", "event_id", "payload")
    withRule {
      val w = Window.partitionBy("dt", "user_id").orderBy(col("event_id").desc)
      val q = df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
      assert(q.collect().head.getString(3) == "a") // desc: highest id wins
      val w2 = Window.partitionBy("dt", "user_id").orderBy("event_id")
      val q2 = df.union(df)
        .withColumn("rn", row_number().over(w2)).where(col("rn") === 2)
      assert(q2.queryExecution.optimizedPlan.toString.contains("Window"))
    }
  }
}
