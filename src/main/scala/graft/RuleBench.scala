package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: measures RewriteRankOneWindow on the first-seen idiom over
  * SPARK_GRAFT_SF_DIR's events — the same query with the rule off (window
  * plan) and on (min_by aggregate plan), min of N reps each.
  * `java -cp ... graft.RuleBench` → one JSON line.
  */
object RuleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def firstSeen() = {
      val ev = Tables.events(spark, sfDir)
        .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      val w = Window.partitionBy("dt", "user_id").orderBy("event_id")
      ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("dt", "user_id", "event_id", "event_type")
    }
    // shuffle-record counter: the scale-relevant number — wall clock at
    // local bench sizes is overhead-bound, but shuffled records grow with
    // the data and the rewrite's point is shrinking them
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffled.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })
    def run(): (Double, Long) = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        firstSeen().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      shuffled.set(0)
      firstSeen().write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // let the listener bus drain (private API otherwise)
      (times.min, shuffled.get)
    }
    firstSeen().write.format("noop").mode("overwrite").save() // warm-up
    val (windowSec, windowRecs) = run()
    spark.experimental.extraOptimizations =
      Seq(org.apache.spark.sql.graftext.RewriteRankOneWindow)
    val plan = firstSeen().queryExecution.optimizedPlan.toString
    require(!plan.contains("Window"), s"rule did not fire:\n$plan")
    val (rewrittenSec, minbyRecs) = run()
    println(s"""{"metric":"rank1_rewrite","window_sec":$windowSec,"minby_sec":$rewrittenSec,"window_shuffle_records":$windowRecs,"minby_shuffle_records":$minbyRecs,"shuffle_reduction":${windowRecs.toDouble / math.max(1, minbyRecs)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
