package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.serving.{IngestMain, ServeMain}

/** The reference's full §3.1 lifecycle as ONE drill: collector HTTP POST →
  * jsonl landing → Spark streaming read + start-field routing (F2) →
  * dt-grained event table → publisher REST answer — asserting the served
  * DAU equals the batch-computed answer over exactly what was posted.
  * Every stage already has its own spec (IngestMainSpec, StreamingSpec,
  * ServeMainSpec); THIS one pins that the composed loop agrees end to end,
  * duplicate-uid dedup included (the count_distinct that replaces the
  * reference's ES doc-id dedup, `DauServicelmpl.java:26-42`). */
class LifecycleDrillSpec extends SparkTestBase {

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    val os = conn.getOutputStream
    try os.write(body.getBytes(StandardCharsets.UTF_8)) finally os.close()
    val status = conn.getResponseCode
    val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val out = scala.io.Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (status, out)
  }

  private def get(port: Int, path: String): String = {
    val c = URI.create(s"http://127.0.0.1:$port$path").toURL.openStream()
    try scala.io.Source.fromInputStream(c, "UTF-8").mkString finally c.close()
  }

  test("ingest → land → stream-route → serve: served DAU equals the batch answer") {
    val landing = java.nio.file.Files.createTempDirectory("graft_e2e_land_").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft_e2e_tbl_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_e2e_ckpt_").toString

    // --- stage 1: the collector lands reference-shaped app logs
    val day = "2024-01-15" // a CLOSED day, so ServeMain may memoize it
    val t0 = java.time.LocalDate.parse(day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    def log(uid: String, hourMs: Long, start: Boolean): String =
      if (start)
        s"""{"common":{"mid":"m-$uid","uid":"$uid"},"start":{"entry":"icon"},"ts":${t0 + hourMs}}"""
      else
        s"""{"common":{"mid":"m-$uid","uid":"$uid"},"page":{"page_id":"home"},"ts":${t0 + hourMs}}"""
    val landingSrv = new IngestMain.Landing(landing, rotateLines = 4)
    val ingest = IngestMain.start(landingSrv, 0)
    try {
      val p = ingest.getAddress.getPort
      // u1..u3 start on the drill day (u1 TWICE — the dedup case), u4
      // only has a PAGE log (not a start → not a DAU visit), u9 starts
      // the NEXT day (must not leak into the drill day's answer)
      Seq(
        log("u1", 1L * 3600000, start = true),
        log("u1", 5L * 3600000, start = true),
        log("u2", 2L * 3600000, start = true),
        log("u3", 2L * 3600000, start = true),
        log("u4", 3L * 3600000, start = false),
        log("u9", 26L * 3600000, start = true)
      ).foreach(b => assert(post(p, "/applog", b) == ((200, "success"))))
      assert(post(p, "/flush", "")._1 == 200)
    } finally { ingest.stop(0); landingSrv.close() }

    // --- stage 2: streaming read of the landing, start-field routing
    // (LoggerController's topic split as a stream operator), project to
    // the engine's events shape, land dt-grained parquet
    val schema = StructType(Seq(
      StructField("common", StructType(Seq(
        StructField("mid", StringType), StructField("uid", StringType)))),
      StructField("start", StructType(Seq(StructField("entry", StringType)))),
      StructField("page", StructType(Seq(StructField("page_id", StringType)))),
      StructField("ts", LongType)))
    val q = spark.readStream.schema(schema).json(landing)
      .where(col("start").isNotNull) // GMALL_START route feeds DAU
      .select(timestamp_millis(col("ts")).as("ts"),
        col("common.uid").as("user_id"))
      .writeStream
      .format("parquet")
      .option("path", s"$tableDir/events.parquet")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // --- stage 3: the publisher daemon serves the landed table
    val serve = ServeMain.start(spark, tableDir, 0)
    try {
      val port = serve.getAddress.getPort
      val served = get(port, s"/realtime-total?date=$day")
      // batch answer over the same table (the oracle-checked query)
      val batch = graft.operators.ServingOps
        .realtimeTotal(spark, tableDir, day).head().getLong(0)
      // and first principles: u1 (once, despite two starts), u2, u3 —
      // not u4 (page only), not u9 (next day)
      assert(batch == 3L, s"batch DAU: $batch")
      assert(served.contains("\"value\":3"), s"served payload: $served")
      assert(served.contains("\"id\":\"dau\""), served)
      // the hourly curve agrees too: hours 01,02 with 1,2 visitors
      val hourly = get(port, s"/realtime-hour?id=dau&date=$day")
      assert(hourly.contains("\"01\":1") && hourly.contains("\"02\":2"), hourly)

      // --- the detail search (IndexController getData): page 1 of 2 is
      // the first two visitors (user_id order), page 2 the third; the
      // served page must equal the batch q_pagination-machinery slice
      val d1 = get(port, s"/detail?date=$day&page=1&size=2")
      val batchPage = graft.operators.ServingOps
        .detailPage(spark, tableDir, day, "", 1, 2).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      assert(batchPage.toSeq ==
        Seq(("u1", 2L, "01"), ("u2", 1L, "02")), batchPage.toSeq.toString)
      val expected1 = batchPage.map { case (u, n, h) =>
        s"""{"user_id":"$u","n_events":$n,"first_hour":"$h"}"""
      }.mkString("""{"total":3,"detail":[""", ",", "]}")
      assert(d1 == expected1, s"served $d1 vs batch $expected1")
      val d2 = get(port, s"/detail?date=$day&page=2&size=2")
      assert(d2 == """{"total":3,"detail":[{"user_id":"u3","n_events":1,"first_hour":"02"}]}""", d2)
      // keyword narrows to the matching visitor, total included
      val dk = get(port, s"/detail?date=$day&page=1&size=10&keyword=u1")
      assert(dk == """{"total":1,"detail":[{"user_id":"u1","n_events":2,"first_hour":"01"}]}""", dk)
      // a PERCENT-ENCODED keyword must decode before filtering (the raw
      // query is split, then each component decoded — %75%31 == "u1")
      val de = get(port, s"/detail?date=$day&page=1&size=10&keyword=%75%31")
      assert(de == dk, s"encoded keyword must equal the plain one: $de")
      // malformed geometry is a 400, never a silent default or a wrapped
      // offset: non-numeric page, and a page big enough to overflow
      // (page-1)*size in Int if it were accepted
      def status(path: String): Int = {
        val c = URI.create(s"http://127.0.0.1:$port$path").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        c.setConnectTimeout(5000); c.setReadTimeout(30000)
        val s = c.getResponseCode; c.disconnect(); s
      }
      assert(status(s"/detail?date=$day&page=abc") == 400, "non-numeric page")
      assert(status(s"/detail?date=$day&page=4394968&size=1000") == 400,
        "overflow-scale page must be rejected, not wrapped")
      assert(status(s"/detail?date=$day&size=0") == 400, "zero size")
    } finally serve.stop(0)
  }
}
