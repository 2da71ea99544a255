package graft

import org.apache.spark.sql.functions._

/** events.ts FLAVOR TRIPWIRE. The driver has shipped two physical flavors
  * of `events.parquet` in 7 rounds — TIMESTAMP(NANOS) read as epoch-nanos
  * long (rounds 1-5, under `nanosAsLong`) and TIMESTAMP(MICROS) NTZ
  * (round 6+). `Tables.normalizeEvents` folds every known flavor to one
  * surface (`ts` tz-aware + `ts_ns` long); this spec pins two things:
  *
  *  1. the three supported physical types all normalize to the SAME
  *     instant (cross-flavor agreement, not just per-flavor sanity);
  *  2. a hypothetical THIRD flavor fails LOUDLY with an actionable
  *     message in both `Tables.events` and `Tables.eventsInRange` —
  *     round 6 proved flavor changes actually happen, and a silent
  *     catch-all mis-normalization would poison every downstream query
  *     while looking green.
  */
class EventsFlavorSpec extends SparkTestBase {
  import spark.implicits._

  // one instant, 2024-03-01T12:34:56.789Z, expressed per flavor
  private val micros = 1709296496789000L

  test("all three supported flavors normalize to the same (ts, ts_ns)") {
    val asLong = Seq((1L, micros * 1000L)).toDF("event_id", "ts") // nanos-long
    val asNtz = spark.sql( // UTC session: the NTZ cast keeps the instant
      s"SELECT 1L AS event_id, CAST(timestamp_micros($micros) AS TIMESTAMP_NTZ) AS ts")
    val asTz = spark.sql(
      s"SELECT 1L AS event_id, timestamp_micros($micros) AS ts")
    val outs = Seq(asLong, asNtz, asTz).map { raw =>
      val n = Tables.normalizeEvents(spark, raw)
        .select(col("ts").cast("string"), col("ts_ns")).head()
      (n.getString(0), n.getLong(1))
    }
    assert(outs.distinct.size == 1,
      s"flavors disagree after normalization: $outs")
    assert(outs.head._2 == micros * 1000L)
  }

  test("the current driver corpus is a supported flavor end-to-end") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.schema("ts_ns").dataType == org.apache.spark.sql.types.LongType)
    assert(ev.limit(1).count() == 1)
  }

  test("a third flavor fails loudly in normalizeEvents, not silently") {
    val alien = Seq((1L, "2024-03-01 12:34:56")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      Tables.normalizeEvents(spark, alien)
    }
    assert(e.getMessage.contains("unsupported physical type"),
      s"tripwire message not actionable: ${e.getMessage}")
    assert(e.getMessage.contains("normalizeEvents"),
      "message must point at the function to extend")
  }

  test("eventsInRange trips the same wire on an unknown flavor") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flavor_").toString
    Seq((1L, "2024-03-01 12:34:56")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      Tables.eventsInRange(spark, dir, 0L, 1L)
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
