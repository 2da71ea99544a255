package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{AnalyticOps, SimilarityOps}

/** AnalyticOps: as-of join, range join, cube, rolling window, session
  * window — each checked against an independent naive formulation (the
  * pair-join / self-join shape the scalable implementation avoids) on
  * sf0.001, plus structural properties. embedQuantize rides here too.
  */
class AnalyticOpsSpec extends SparkTestBase {

  test("as-of join matches the naive pair-join + argmax formulation") {
    val got = AnalyticOps.asofJoin(spark, sf0001).cache()
    val od = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("ot"))
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("o_orderkey")
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    val naive = od
      .join(ev, ev("user_id") === od("o_custkey") && col("ts_ns") <= col("ot"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 || col("ts_ns").isNull)
      .select(col("o_orderkey"), col("o_custkey"),
        col("event_id").as("asof_event_id"), col("event_type").as("asof_event_type"))
    assert(got.count() == od.count()) // every order survives
    assert(got.except(naive).count() == 0 && naive.except(got).count() == 0)
  }

  test("as-of join: id and type come from the SAME event when event_type is null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    Seq(
      (10L, at(1), 1L, Some("view"), 1.0, "{}"),
      (11L, at(2), 1L, None, 1.0, "{}")) // newer event, null type
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((100L, 1L, at(3)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = AnalyticOps.asofJoin(spark, dir).collect()
    assert(r.length == 1)
    // both fields from event 11 — never id=11 with type='view' torn from 10
    assert(r(0).getAs[Long]("asof_event_id") == 11L)
    assert(r(0).isNullAt(r(0).fieldIndex("asof_event_type")),
      s"field tearing: ${r(0)}")
  }

  test("range join matches the naive SQL range formulation; zero-activity orders kept") {
    val got = AnalyticOps.rangeJoin(spark, sf0001).cache()
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(got.count() == nOrders)
    assert(got.where(col("n_events") === 0).count() > 0,
      "expected some zero-activity orders at sf0.001")
    // zero-activity rows: no distinct types, null max
    val z = got.where(col("n_events") === 0)
    assert(z.where(col("n_event_types") =!= 0 || col("max_value").isNotNull).count() == 0)
  }

  test("cube: grand total row equals full count; rollups are consistent") {
    val got = AnalyticOps.cubeSales(spark, sf0001).cache()
    val total = Tables.orders(spark, sf0001).count()
    val grand = got.where(col("gid") === 3).collect()
    assert(grand.length == 1 && grand(0).getAs[Long]("n") == total)
    // sum of the finest cells (gid=0) == grand total count
    val fine = got.where(col("gid") === 0).agg(sum("n")).collect()(0).getLong(0)
    assert(fine == total)
  }

  test("rolling 7-day spend matches a naive range self-join") {
    val od = Tables.orders(spark, sf0001)
      .withColumn("dnum", datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
      .select("o_orderkey", "o_custkey", "dnum", "o_totalprice").cache()
    val r = od.select(col("o_custkey").as("ck"), col("dnum").as("d2"),
      col("o_totalprice").as("p2"))
    val naive = od.join(r,
        col("ck") === col("o_custkey") &&
          col("d2").between(col("dnum") - 6, col("dnum")))
      .groupBy("o_orderkey")
      .agg(sum(col("p2").cast("decimal(18,2)")).cast("double").as("spend_7d"),
        count(lit(1)).as("n_orders_7d"))
    val got = AnalyticOps.rollingSpend(spark, sf0001)
      .select("o_orderkey", "spend_7d", "n_orders_7d")
    assert(got.except(naive).count() == 0 && naive.except(got).count() == 0)
  }

  test("session windows: per-user event counts conserved; sessions separated by >= gap") {
    val got = AnalyticOps.sessionWindow(spark, sf0001).cache()
    val perUser = got.groupBy("user_id").agg(sum("n_events").as("tot"))
    val src = Tables.events(spark, sf0001).groupBy("user_id").count()
    assert(perUser.join(src, Seq("user_id"))
      .where(col("tot") =!= col("count")).count() == 0)
    // consecutive sessions of a user don't overlap: next start >= prev end
    val w = Window.partitionBy("user_id").orderBy("session_start_sec")
    val overlaps = got
      .withColumn("prev_end", lag(col("session_end_sec"), 1).over(w))
      .where(col("prev_end").isNotNull && col("session_start_sec") < col("prev_end"))
    assert(overlaps.count() == 0)
  }

  test("unpivot inverts the pivot: dense day-grid with the hourly DAU values") {
    val melted = graft.operators.CoreOps.dauUnpivot(spark, sf0001).cache()
    val days = Tables.events(spark, sf0001)
      .select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    assert(melted.count() == days * 24)
    // nonzero cells match the hourly aggregate exactly
    val hourly = Tables.events(spark, sf0001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        date_format(col("ts"), "HH").as("hr"))
      .agg(count_distinct(col("user_id")).as("dau"))
    assert(melted.where(col("dau") > 0).except(hourly).count() == 0)
    assert(hourly.except(melted).count() == 0)
  }

  test("scd2: contiguous versions, intervals chain, exactly one current per customer") {
    val got = AnalyticOps.scd2(spark, sf0001).cache()
    // one open (current) version per customer
    val cur = got.where(col("is_current")).groupBy("o_custkey").count()
    assert(cur.where(col("count") =!= 1).count() == 0)
    // versions are 1..n per customer and valid_to chains to next valid_from
    val w = Window.partitionBy("o_custkey").orderBy("version")
    val bad = got
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("prev_v", lag(col("version"), 1).over(w))
      .where(
        (col("prev_v").isNotNull && col("version") =!= col("prev_v") + 1) ||
        (col("next_from").isNotNull && col("valid_to") =!= col("next_from")) ||
        (col("next_from").isNull && col("valid_to").isNotNull))
    assert(bad.count() == 0)
  }

  test("approx quantiles: returned values' rank error is within the sketch accuracy") {
    import graft.operators.PipelineOps
    val approx = PipelineOps.lengthQuantilesApproxValues(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), col("n_chars")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    approx.foreach { case (lang, (p50, p90)) =>
      val vals = docs(lang); val n = vals.length.toDouble
      def rankOf(v: Long) = vals.count(_ <= v) / n
      // accuracy 10000 → rank error 1/10000; allow discreteness slack of 1 row
      assert(math.abs(rankOf(p50) - 0.5) <= 0.0001 + 1.5 / n,
        s"$lang p50=$p50 rank=${rankOf(p50)}")
      assert(rankOf(p90) >= 0.9 - (0.0001 + 1.5 / n))
    }
  }

  test("rank suite: rank relationships, quartile range, top_key constant per partition") {
    val got = AnalyticOps.rankSuite(spark, sf0001).cache()
    val bad = got.where(
      col("rnk") > col("rn") || col("drnk") > col("rnk") ||
        col("quartile") < 1 || col("quartile") > 4 ||
        col("pct_rank") < 0.0 || col("pct_rank") > 1.0 ||
        col("cume") <= 0.0 || col("cume") > 1.0)
    assert(bad.count() == 0)
    // top_key is the first row's key everywhere in its partition
    val tops = got.where(col("rn") === 1)
      .select(col("o_orderpriority").as("p"), col("o_orderkey").as("k"))
    assert(got.join(tops, col("o_orderpriority") === col("p"))
      .where(col("top_key") =!= col("k")).count() == 0)
  }

  test("int8 quantization: bounds, zero-vector handling, extremum hits ±127") {
    val dir = embeddingsFixture(Seq(
      (0L, Seq(0f, 0f, 0f, 0f), 0),           // zero vector
      (1L, Seq(1f, -2f, 0.5f, 2f), 0),        // max_abs on both signs
      (2L, Seq(-3.5f, 1f, 0f, 0.25f), 1)))
    val got = SimilarityOps.embedQuantize(spark, dir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val z = got(0L)
    assert(z.getAs[Double]("scale") == 0.0 && z.getAs[Long]("q_sum") == 0L &&
      z.getAs[Long]("q_min") == 0L && z.getAs[Long]("q_max") == 0L)
    // max-abs element maps to ±127 exactly; all values within [-127, 127]
    assert(got(1L).getAs[Long]("q_max") == 127L)  // 2f is max_abs
    assert(got(2L).getAs[Long]("q_min") == -127L) // -3.5f is max_abs
    got.values.foreach { r =>
      assert(r.getAs[Long]("q_min") >= -127L && r.getAs[Long]("q_max") <= 127L)
    }
  }
}
