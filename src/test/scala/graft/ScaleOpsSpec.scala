package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkTestBase {

  test("salted join returns exactly the plain join's rows (skewed key)") {
    import spark.implicits._
    // heavy skew: 90% of left rows share key 7
    val left = ((1 to 900).map(i => (7L, i)) ++ (1 to 100).map(i => (i.toLong % 5, -i)))
      .toDF("k", "lv")
    val right = (0L to 9L).map(k => (k, s"r$k")).toDF("rk", "rv")
    val plain = left.join(right, left("k") === right("rk"), "inner")
      .select("k", "lv", "rv")
    val salted = ScaleOps.saltedJoin(left, right, "k", "rk", 8)
      .select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("bucketed tables join with ZERO shuffle (co-located join)") {
    // drop stale tables AND their warehouse locations (a previous JVM's
    // managed-table dirs survive on disk while the in-memory catalog is
    // fresh — saveAsTable would refuse the location otherwise)
    def scrub(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      val loc = new java.io.File(wh, t)
      if (loc.exists()) rm(loc)
    }
    scrub("b_orders"); scrub("b_lineitem")
    ScaleOps.writeBucketed(Tables.orders(spark, sf0001), "b_orders",
      "o_orderkey", 8)
    ScaleOps.writeBucketed(
      Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "b_lineitem", "l_orderkey", 8)
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
    // force a shuffle-join shape: disable broadcast for this check
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("snapshot diff of a merge is exactly the change batch (round trip)") {
    import org.apache.spark.sql.functions._
    val diff = graft.operators.ScaleOps.snapshotDiff(spark, sf0001).cache()
    val byChange = diff.groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sf0001).select(col("o_orderkey"))
    def nMod(m: Long) = keys.where(col("o_orderkey") % 100 === m).count()
    // U rows are exactly the mod-3 keys, D the mod-7, I the shifted mod-11
    assert(byChange.getOrElse("U", 0L) == nMod(3))
    assert(byChange.getOrElse("D", 0L) == nMod(7))
    assert(byChange.getOrElse("I", 0L) == nMod(11))
    assert(diff.where(col("change") === "I" && col("key") < 1000000000L).count() == 0)
    assert(diff.where(col("change") === "U" && col("new_status") =!= "X").count() == 0)
  }

  test("mergeInto: update replaces, delete removes, insert appends — nothing else moves") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (9L, "z", "U"))
      .toDF("k", "v", "_op")
    val got = graft.operators.ScaleOps.mergeInto(target, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "B"), (9L, "z")))
  }

  test("overwriteByPartition: replay is idempotent and untouched partitions survive") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val day1 = Seq(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"))
    val day2 = Seq(("2024-01-02", 3L, "c"))
    (day1 ++ day2).toDF("dt", "id", "v").createOrReplaceTempView("ignore_me")
    ScaleOps.overwriteByPartition((day1 ++ day2).toDF("dt", "id", "v"), "dt", path)
    assert(spark.read.parquet(path).count() == 3)

    // replay day1 unchanged: idempotent
    ScaleOps.overwriteByPartition(day1.toDF("dt", "id", "v"), "dt", path)
    assert(spark.read.parquet(path).count() == 3)

    // rewrite day1 with corrected data: day2 untouched
    val day1fixed = Seq(("2024-01-01", 9L, "z"))
    ScaleOps.overwriteByPartition(day1fixed.toDF("dt", "id", "v"), "dt", path)
    val after = spark.read.parquet(path)
    assert(after.count() == 2)
    assert(after.where(col("dt") === "2024-01-02").count() == 1)
    assert(after.where(col("id") === 9L).count() == 1)
  }

  test("writeSorted: row-group ts_ns min/max ranges are disjoint (footer-verified skipping)") {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Files.createTempDirectory("graft_sorted_").toString + "/ev"
    ScaleOps.writeSorted(
      Tables.events(spark, sf0001).select("event_id", "user_id", "ts_ns"),
      "ts_ns", path, partitions = 4)
    val conf = new org.apache.hadoop.conf.Configuration()
    val ranges = new java.io.File(path).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
      .flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == "ts_ns").get.getStatistics
          (c.genericGetMin.asInstanceOf[Long], c.genericGetMax.asInstanceOf[Long])
        }.toSeq
        finally r.close()
      }.sortBy(_._1)
    assert(ranges.length >= 4, s"expected >=4 row groups, got ${ranges.length}")
    // disjoint intervals = a range predicate prunes whole row groups from
    // the footer alone, which is the entire point of sort-on-write
    ranges.sliding(2).foreach {
      case Array((_, prevMax), (nextMin, _)) =>
        assert(nextMin >= prevMax,
          s"row-group ranges overlap: $ranges")
      case _ =>
    }
  }
}
