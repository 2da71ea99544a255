package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.FileSources

/** FileSources: explicit-schema reads route malformed input to _corrupt
  * instead of failing; good rows parse fully. Plus the AvailableNow
  * catch-up trigger: a stream over existing files drains and terminates.
  */
class FileSourcesSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("jsonl: malformed line captured in _corrupt, valid lines parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"id": 1, "name": "ok"}
        |this is not json
        |{"id": 2, "name": "fine"}
        |""".stripMargin)
    val got = FileSources.readJsonl(spark, dir, schema).cache()
    assert(got.count() == 3)
    assert(got.where(col(FileSources.CorruptCol).isNotNull).count() == 1)
    val good = got.where(col(FileSources.CorruptCol).isNull)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(good == Map(1L -> "ok", 2L -> "fine"))
  }

  test("csv: wrong-typed cell captured in _corrupt, valid rows parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.csv"),
      "id,name\n1,ok\nnot_a_number,bad\n2,fine\n")
    val got = FileSources.readCsv(spark, dir, schema).cache()
    assert(got.count() == 3)
    assert(got.where(col(FileSources.CorruptCol).isNotNull).count() == 1)
    assert(got.where(col(FileSources.CorruptCol).isNull).count() == 2)
  }

  test("orc: write/read round-trip preserves rows; missing column reads null, extra pruned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    FileSources.writeOrc(
      Seq((1L, "a", 10.5), (2L, "b", 20.25)).toDF("id", "name", "v"), dir)
    // same schema round-trips exactly
    val full = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = FileSources.readOrc(spark, dir, full).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == Set((1L, "a", 10.5), (2L, "b", 20.25)))
    // declared-but-absent column → null; undeclared column pruned at scan
    val drifted = StructType(Seq(StructField("id", LongType),
      StructField("added_later", StringType)))
    val d = FileSources.readOrc(spark, dir, drifted)
    assert(d.columns.toSeq == Seq("id", "added_later"))
    assert(d.where(col("added_later").isNull).count() == 2)
  }

  test("AvailableNow trigger: drains existing files then terminates (batch catch-up)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow_").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/in")
    val q = spark.readStream.schema(
        StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
      .parquet(s"$dir/in")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("avnow").start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    assert(spark.table("avnow").count() == 3)
  }
}
