package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.serving.IngestMain

/** The log-ingestion daemon end to end: POST reference-shaped log JSON
  * over real HTTP, flush, read the jsonl landing with Spark, and route
  * on the start field — the reference LoggerController's full loop
  * (receive → land → topic split) with files as the Kafka stand-in and
  * the split done by Spark's real from_json downstream. */
class IngestMainSpec extends SparkTestBase {

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

  test("ingest daemon lands posted log JSON; Spark routes it by start field") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    val landing = new IngestMain.Landing(dir, rotateLines = 2)
    val server = IngestMain.start(landing, 0)
    try {
      val port = server.getAddress.getPort
      // reference log shapes (LoggerController routes on "start" presence)
      val startLog =
        """{"common":{"mid":"m1","uid":"u1"},"start":{"entry":"icon"},"ts":1700000000000}"""
      val eventLog =
        """{"common":{"mid":"m2","uid":"u2"},"page":{"page_id":"home"},"ts":1700000001000}"""
      assert(post(port, "/applog", startLog) == ((200, "success")))
      assert(post(port, "/applog", eventLog) == ((200, "success")))
      assert(post(port, "/applog",
        eventLog.replace("m2", "m3")) == ((200, "success")))
      // malformed bodies are refused at the door
      assert(post(port, "/applog", "")._1 == 400)
      assert(post(port, "/applog", "not json")._1 == 400)
      assert(post(port, "/flush", "")._1 == 200)
      // rotation: 3 lines at rotateLines=2 → two epoch files, both closed
      val files = new java.io.File(dir).listFiles().map(_.getName).sorted
      assert(files.length == 2 && files.forall(_.endsWith(".jsonl")), files.toSeq)
      // Spark reads the landing and routes exactly like the reference:
      // start present → GMALL_START, else GMALL_EVENT
      val landed = spark.read.json(dir)
      assert(landed.count() == 3)
      val routed = landed.withColumn("topic",
        when(col("start").isNotNull, "GMALL_START").otherwise("GMALL_EVENT"))
      val byTopic = routed.groupBy("topic").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byTopic == Map("GMALL_START" -> 1L, "GMALL_EVENT" -> 2L), byTopic)
      // nested fields survive the round-trip (the mid the dedup keys on)
      assert(routed.where(col("topic") === "GMALL_START")
        .select("common.mid").head().getString(0) == "m1")
      // the reference's smoke endpoint
      val hello = URI.create(s"http://127.0.0.1:$port/hello?name=gmall").toURL
      val s = scala.io.Source.fromInputStream(hello.openStream(), "UTF-8").mkString
      assert(s == "hello gmall")
    } finally { server.stop(0); landing.close() }
  }

  test("restarted Landing resumes past existing epochs; closed files stay immutable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_restart_").toString
    // first daemon life: land 3 records at rotateLines=2 → epoch-000000
    // (closed, 2 lines) + epoch-000001 (closed by close(), 1 line)
    val first = new IngestMain.Landing(dir, rotateLines = 2)
    first.append("""{"n":1}"""); first.append("""{"n":2}"""); first.append("""{"n":3}""")
    first.close()
    val before = new java.io.File(dir).listFiles().map { f =>
      f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq
    }.toMap
    assert(before.keySet == Set("epoch-000000.jsonl", "epoch-000001.jsonl"), before.keySet)
    // second life over the same dir: must start at epoch 2, not append to 0
    val second = new IngestMain.Landing(dir, rotateLines = 2)
    second.append("""{"n":4}""")
    // per-append flush → the in-progress epoch is already on disk
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.contains("epoch-000002.jsonl"), files)
    // every pre-existing file is byte-identical (a consumer already read them)
    before.foreach { case (name, bytes) =>
      val now = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, name).toPath).toSeq
      assert(now == bytes, s"$name mutated after restart")
    }
    second.close()
    assert(scala.io.Source.fromFile(new java.io.File(dir, "epoch-000002.jsonl"))
      .mkString == "{\"n\":4}\n")
    // epochs past 999999 widen to 7+ digits (%06d never truncates) — the
    // resume scan must count them too, or a restart would collide below
    val wide = new java.io.File(dir, "epoch-1000000.jsonl")
    java.nio.file.Files.write(wide.toPath, "{\"n\":9}\n".getBytes)
    val third = new IngestMain.Landing(dir, rotateLines = 2)
    third.append("""{"n":10}""")
    third.close()
    assert(new java.io.File(dir, "epoch-1000001.jsonl").exists(),
      new java.io.File(dir).list().toSeq.sorted)
    assert(scala.io.Source.fromFile(wide).mkString == "{\"n\":9}\n")
  }
}
