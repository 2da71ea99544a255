package graft

import org.apache.spark.sql.functions._

import graft.streaming.{KafkaIO, StreamingOps}

/** KafkaIO is wired against a connector this container doesn't have, so the
  * broker-free halves are pinned here: option construction (the part that
  * encodes the reference's consumer semantics) and the decode/parse path on
  * frames with the exact wire schema `format("kafka")` produces. */
class KafkaIOSpec extends SparkTestBase {

  test("source options encode subscribe + offsets + group id like the reference consumer") {
    val opts = KafkaIO.sourceOptions("ods_events", "broker1:9092,broker2:9092",
      groupId = Some("gmall_consumer_group"), maxOffsetsPerTrigger = Some(10000L))
    assert(opts("subscribe") == "ods_events")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("startingOffsets") == "latest", "reference default is auto.offset.reset=latest")
    assert(opts("kafka.group.id") == "gmall_consumer_group")
    assert(opts("maxOffsetsPerTrigger") == "10000")
    val defaults = KafkaIO.sourceOptions("t", "b:9092")
    assert(!defaults.contains("kafka.group.id") && !defaults.contains("maxOffsetsPerTrigger"))
  }

  test("manual offsets map serializes to the connector's startingOffsets JSON") {
    assert(KafkaIO.offsetsJson("gmall_start", Map(1 -> 88L, 0 -> 42L)) ==
      """{"gmall_start":{"0":42,"1":88}}""")
    assert(KafkaIO.offsetsJson("t", Map.empty) == """{"t":{}}""")
  }

  test("toKafkaRecords -> wire -> decode -> parseJson round-trips the events rows") {
    // the full producer->consumer loop without a broker: shape rows the way
    // writeTopic produces them, re-wrap them in the source wire schema, and
    // run the exact consume path. Every field must survive byte-identical
    // (ts is truncated to millis first: to_json serializes milli precision).
    val src = Tables.events(spark, sf0001)
      .withColumn("ts", date_trunc("millisecond", col("ts")))
      .drop("ts_ns")
      .limit(500)
      .cache()
    val wire = StreamingOps.toKafkaRecords(src, "event_id", "ods_events")
      .select(
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        col("topic"),
        lit(0).as("partition"),
        monotonically_increasing_id().as("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))
    assert(wire.schema.fieldNames.toSeq == KafkaIO.WireSchema.fieldNames.toSeq)

    val parsed = KafkaIO.parseJson(KafkaIO.decodeRecords(wire), KafkaIO.EventSchema)
    assert(parsed.where(col("topic") =!= "ods_events").count() == 0)
    assert(parsed.where(col("key") =!= col("event_id").cast("string")).count() == 0,
      "kafka key must be the business key, stringified")

    val cols = KafkaIO.EventSchema.fieldNames.map(col).toIndexedSeq
    val back = parsed.select(cols: _*)
    val orig = src.select(cols: _*)
    assert(back.count() == orig.count())
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0,
      "round-tripped rows must equal the source rows exactly")
  }

  test("malformed value JSON yields null fields, not a failed query") {
    import spark.implicits._
    val recs = Seq(
      ("1", """{"event_id":1,"user_id":7,"event_type":"view"}""", "t"),
      ("2", """not json at all""", "t"))
      .toDF("key", "value", "topic")
      .withColumn("kafka_ts", current_timestamp())
      .withColumn("partition", lit(0)).withColumn("offset", lit(0L))
    val parsed = KafkaIO.parseJson(recs, KafkaIO.EventSchema).cache()
    assert(parsed.count() == 2, "PERMISSIVE mode keeps the malformed row")
    assert(parsed.where(col("event_id").isNull).count() == 1)
    assert(parsed.where(col("event_id") === 1 && col("user_id") === 7).count() == 1)
  }
}
