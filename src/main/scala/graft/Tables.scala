package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * One function per table; every operator takes `(SparkSession, sfDir)` and
  * loads through here so the scan is always a plain parquet read that
  * Catalyst can push filters/pruning into. No caching at this layer — the
  * driver runs each query standalone and Catalyst reuses exchanges within
  * a plan where possible.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` is set — at SESSION
    * BUILD time (GraftSession.build, Verify, Bench and the test base all
    * set it; a reader must not mutate session state as a side effect).
    * Under that conf ts arrives as epoch-nanos long and is converted to a
    * microsecond TimestampType column. Sub-microsecond precision is
    * dropped — all derived dt/hr/second-level values are unaffected. The
    * raw nanos survive as `ts_ns`: it is a passthrough of the physical
    * column, so range predicates on it (e.g. one-day serving windows) push
    * down into the parquet scan for row-group skipping — a filter on the
    * derived `ts` could not. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw =
      try t(spark, dir, "events")
      catch {
        case e: Throwable if String.valueOf(e.getMessage).contains("NANOS") =>
          throw new IllegalStateException(
            "events.parquet uses TIMESTAMP(NANOS): set " +
              "spark.sql.legacy.parquet.nanosAsLong=true when BUILDING the " +
              "session (GraftSession.build does) — Tables.events no longer " +
              "sets it for you", e)
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long testdata
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ micro parquet (DuckDB and most non-Spark writers). The
        // NTZ→TZ cast reinterprets wall-clock values in the SESSION
        // timezone — instant-preserving only under the engine's pinned
        // UTC, so fail loudly on a misconfigured session rather than
        // silently shifting every event (same discipline as the
        // nanosAsLong check above).
        require(spark.conf.get("spark.sql.session.timeZone", "") == "UTC",
          "events.parquet has TIMESTAMP_NTZ ts: set " +
            "spark.sql.session.timeZone=UTC (GraftSession does) — a " +
            "non-UTC session would shift every event by the local offset")
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000)
      case _ => // TIMESTAMP (tz-aware) micro-precision parquet
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
