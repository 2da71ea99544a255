package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-explicit batch file sources with corrupt-record capture.
  *
  * The reference ingests JSON strings off Kafka and trusts them blindly
  * (fastjson `getString` returns null on absence — SURVEY §1.2); an
  * engine reading files at scale must instead make malformed input
  * VISIBLE without failing the job: PERMISSIVE mode routes undecodable
  * lines into a `_corrupt` column so a DQ gate (PipelineOps.dqChecks
  * style) can count and quarantine them. Schemas are always explicit —
  * inference is a full extra pass over 100 TB and nondeterministic under
  * sampling; an engine's contract is the declared schema.
  */
object FileSources {

  val CorruptCol = "_corrupt"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, StringType, nullable = true)

  /** JSON-lines with explicit schema; malformed lines land in `_corrupt`
    * with all data columns null (PERMISSIVE), never a job failure. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Headered CSV with explicit schema and the same corrupt-capture
    * contract as readJsonl. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** ORC read with explicit schema — the other columnar format a warehouse
    * ingests alongside parquet. Binary columnar formats have no
    * line-level corrupt capture (a torn file fails the split, which is the
    * correct loud behavior); the explicit schema still guards against
    * silent column drift: missing columns read as null, extra columns are
    * pruned at the scan. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC write, zlib-compressed (the format's interoperable default). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)
}
