package graft

import org.apache.spark.sql.functions._
import graft.operators.CoreOps

class CoreOpsSpec extends SparkTestBase {

  test("dau hourly: one row per (dt,hr), dau <= distinct users") {
    val df = CoreOps.dauHourly(spark, sf0001).cache()
    val n = df.count()
    assert(n > 0)
    assert(df.select("dt", "hr").distinct().count() == n)
    val maxDau = df.agg(max("dau")).head().getLong(0)
    val users = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(maxDau <= users)
  }

  test("first_seen: keeps exactly the min event_id per (dt,user) and is idempotent") {
    val fs = CoreOps.firstSeen(spark, sf0001).cache()
    // one row per (dt,user)
    assert(fs.select("dt", "user_id").distinct().count() == fs.count())
    // the surviving event really is the minimum event_id of its group
    val ev = Tables.events(spark, sf0001)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("dt", "user_id").agg(min("event_id").as("min_id"))
    val joined = fs.join(ev, Seq("dt", "user_id"))
    assert(joined.where(col("first_event_id") =!= col("min_id")).count() == 0)
  }

  test("cdc route preserves the reference's bootstrap-insert leak (F1 quirk)") {
    // the reference boolean lets bootstrap-insert through on ANY table,
    // including tables not in the routing list (SURVEY §2.3)
    val routed = CoreOps.cdcRoute(spark, sf0001).cache()
    val leaked = routed.where(col("table_name") === "other_table").cache()
    assert(leaked.count() > 0, "bootstrap-insert on unlisted tables must leak through")
    assert(leaked.where(col("op") =!= "bootstrap-insert").count() == 0)
    // and delete ops on routed tables must NOT pass
    assert(routed.where(col("op") === "delete").count() == 0)
  }

  test("age bucket: boundary values and the F-override branch") {
    import spark.implicits._
    val probe = Seq(
      (1L, "a", 1, 1800.0, "BUILDING"),  // boundary: <=1800 → 少年
      (2L, "b", 1, 1800.01, "BUILDING"), // just over → 青年
      (3L, "c", 1, 4000.0, "BUILDING"),  // boundary: <=4000 → 青年
      (4L, "d", 1, 4000.01, "BUILDING"), // just over → 老年
      (5L, "e", 1, 100.0, "AUTOMOBILE"), // F-branch OVERRIDES bucket
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_").toString
    probe.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = CoreOps.ageBucket(spark, dir).collect().map(r =>
      r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(got(1L) == ("男", "少年"))
    assert(got(2L) == ("男", "青年"))
    assert(got(3L) == ("男", "青年"))
    assert(got(4L) == ("男", "老年"))
    assert(got(5L) == ("女", "永远18岁"))
  }

  test("order_wide: row count equals lineitems with matching orders; left-join parity on enrich") {
    val wide = CoreOps.orderWide(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001).select(col("o_orderkey"))
    val expected = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_semi").count()
    assert(wide.count() == expected)
    // enrichment is left-outer: row count of orders preserved
    assert(CoreOps.orderEnrich(spark, sf0001).count() ==
      Tables.orders(spark, sf0001).count())
  }

  test("approx DAU within the configured HLL error of exact DAU") {
    val exact = CoreOps.dauTotal(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = CoreOps.dauApproxEstimate(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (dt, a) =>
      val e = exact(dt).toDouble
      assert(math.abs(a - e) / e <= 0.1, s"dt=$dt approx=$a exact=$e")
    }
  }

  test("pagination window matches offset+limit of the total order") {
    val all = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(30).collect().drop(20).map(_.toSeq).toSeq
    val page = CoreOps.pagination(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(page == all)
  }
}
