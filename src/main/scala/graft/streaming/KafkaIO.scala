package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Kafka source/sink wiring — the reference's entire inter-layer transport
  * (SURVEY.md §1.3 topic graph) re-expressed on Structured Streaming's
  * kafka connector.
  *
  * Reference sites:
  *  - S1 `MyKafkaUtil.getKafkaStream(topic, ssc[, groupId])`
  *    (gmallrealtime/src/main/scala/com/atguigu/gmall/util/MyKafkaUtil.scala:38-48):
  *    subscribe + `auto.offset.reset=latest` → `readTopic` with
  *    startingOffsets="latest".
  *  - S2 `MyKafkaUtil.getKafkaStream(topic, ssc, offsets, groupId)` +
  *    the Redis offset protocol (`OffsetManager.scala:15-50`):
  *    per-partition manual offsets → `readTopicFrom`. Note the division of
  *    labor: the explicit offsets map is honored on FIRST start only; from
  *    then on the query's CHECKPOINT carries exact progress — which is the
  *    whole `getOffset`/`saveOffset` hand-rolled protocol, done
  *    transactionally by the engine (S3 offset-range capture subsumed).
  *  - K3 `MyKafkaSender.send(topic[, key], msg)` (`MyKafkaSender.scala:29-38`):
  *    keyed-JSON producer → `writeTopic`/`writeTopicBatch` over
  *    `StreamingOps.toKafkaRecords` (same key/value/topic shaping).
  *
  * RUNTIME NOTE: `format("kafka")` resolves the connector by name at
  * load/start time, so this module compiles and its record-shaping half is
  * fully unit-testable with no broker and no connector jar (this container
  * has neither — see README). Running `readTopic`/`writeTopic` against a
  * real cluster needs `spark-sql-kafka-0-10_2.13` (+ kafka-clients) on the
  * classpath, the standard connector distributed with Spark.
  *
  * Everything downstream of the wire is split into pure DataFrame→DataFrame
  * functions (`decodeRecords`, `parseJson`) so the parse logic the cluster
  * would run IS the logic the tests run on fixture frames.
  */
object KafkaIO {

  /** The exact schema `format("kafka")` sources produce — fixture frames in
    * tests are built against this so the decode path is pinned to the wire
    * contract. */
  val WireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** JSON schema of one event record on the events topic — matches both the
    * testdata `events` table and what `toKafkaRecords` emits for it
    * (ts serialized as a timestamp string by to_json). */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Source options for a subscribe-mode read — pure so the option wiring
    * is assertable without a broker. `groupId` maps to the connector's
    * `kafka.group.id` (the reference's consumer-group parameter); offsets
    * default to "latest" exactly like the reference's
    * `auto.offset.reset=latest`. */
  def sourceOptions(
      topic: String,
      bootstrapServers: String,
      startingOffsets: String = "latest",
      groupId: Option[String] = None,
      maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets) ++
      groupId.map("kafka.group.id" -> _) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Manual per-partition offsets → the connector's startingOffsets JSON,
    * `{"<topic>":{"0":1234,"1":5678}}` — the Redis hash the reference kept
    * per (topic, groupId), in the shape the engine consumes natively. */
  def offsetsJson(topic: String, offsets: Map[Int, Long]): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"$topic":{""", ",", "}}")

  /** S1: auto-offset subscribe source (reference MyKafkaUtil.scala:38-43).
    * Returns decoded string key/value records; feed `parseJson` next. */
  def readTopic(
      spark: SparkSession,
      topic: String,
      bootstrapServers: String,
      startingOffsets: String = "latest",
      groupId: Option[String] = None,
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val reader = spark.readStream.format("kafka")
    sourceOptions(topic, bootstrapServers, startingOffsets, groupId,
      maxOffsetsPerTrigger).foreach { case (k, v) => reader.option(k, v) }
    decodeRecords(reader.load())
  }

  /** S2: manual-offset subscribe source (reference MyKafkaUtil.scala:52-55
    * + OffsetManager). The offsets map seeds the FIRST run; the checkpoint
    * owns progress afterwards. */
  def readTopicFrom(
      spark: SparkSession,
      topic: String,
      bootstrapServers: String,
      offsets: Map[Int, Long],
      groupId: Option[String] = None): DataFrame =
    readTopic(spark, topic, bootstrapServers, offsetsJson(topic, offsets),
      groupId)

  /** Wire → records: binary key/value decoded to strings (the reference's
    * StringDeserializer), Kafka metadata kept for offset-range visibility
    * (S3) and event-time fallback. Pure column ops — runs identically on a
    * fixture frame and a live stream. */
  def decodeRecords(raw: DataFrame): DataFrame =
    raw.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"))

  /** Records → typed columns: parse the JSON value into `schema` and lift
    * its fields to top level, keeping the key and Kafka metadata. The
    * reference's per-record `JSON.parseObject` (P1/P2), as one vectorized
    * from_json. Malformed JSON yields a null struct (PERMISSIVE) — a
    * `.where(col(field).isNotNull)` downstream is the null-guard F5. */
  def parseJson(records: DataFrame, schema: StructType): DataFrame =
    records
      .withColumn("j", from_json(col("value"), schema))
      .select(col("key") +: col("kafka_ts") +: col("topic") +:
        col("partition") +: col("offset") +:
        schema.fieldNames.toIndexedSeq.map(f => col(s"j.$f").as(f)): _*)

  /** K3: keyed-JSON producer sink for a streaming frame (reference
    * MyKafkaSender.send(topic, key, msg)). Record shaping is
    * `StreamingOps.toKafkaRecords` — asserted broker-free in tests; this
    * adds the `format("kafka")` wiring + checkpoint (at-least-once; the
    * reference's producer had no delivery guarantee at all). */
  def writeTopic(
      df: DataFrame,
      keyCol: String,
      topic: String,
      bootstrapServers: String,
      checkpointLocation: String): StreamingQuery =
    StreamingOps.toKafkaRecords(df, keyCol, topic)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpointLocation)
      .start()

  /** K3 batch form: one-shot produce of a batch DataFrame. */
  def writeTopicBatch(
      df: DataFrame,
      keyCol: String,
      topic: String,
      bootstrapServers: String): Unit =
    StreamingOps.toKafkaRecords(df, keyCol, topic)
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .save()
}
