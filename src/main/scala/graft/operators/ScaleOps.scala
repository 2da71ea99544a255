package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns as reusable operators.
  *
  * AQE handles moderate skew automatically (split oversized partitions of
  * a shuffle join); `saltedJoin` is the explicit form for pathological
  * keys — the classic hot-key fix at 1000-executor scale, here as a
  * semantics-preserving rewrite.
  *
  * `overwriteByPartition` is the idempotent sink the reference got from
  * ES doc-id upserts (K1) and Phoenix keyed upserts (K4): replaying a
  * batch replaces exactly the partitions it touches, so at-least-once
  * delivery upstream still yields exactly-once table state.
  */
object ScaleOps {

  /** Inner equi-join with the left side's hot keys salted across
    * `saltFactor` sub-keys and the right side replicated per salt.
    * Produces exactly the rows of `left.join(right, leftKey === rightKey)`
    * — the salt only changes the partitioning of the shuffle. The salt is
    * derived deterministically from the whole left row so plans stay
    * reproducible. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int): DataFrame = {
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin reserves the column name '_salt'; rename it on the inputs")
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)))
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted
      .join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("_salt") === replicated("_salt"),
        "inner")
      .drop("_salt")
  }

  /** Write `df` as a bucketed+sorted managed table: rows are hash-bucketed
    * by the join key at WRITE time, so every later equi-join or aggregation
    * on that key runs with zero shuffle (Catalyst sees the bucketing as a
    * satisfied distribution requirement). The 100 TB pattern for fact
    * tables that are joined on the same key every day. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Sort-on-write for scan-time row-group skipping: a global
    * repartitionByRange + sortWithinPartitions on the filter column
    * before the parquet write, so every row group's min/max stats span a
    * narrow, non-overlapping range. A later range predicate on that
    * column (e.g. the serving layer's one-day windows) then skips whole
    * row groups at the footer — the same PushedFilters that full-scan an
    * unsorted layout become actual IO elimination. The 100 TB layout
    * rule for any column the workload range-filters on; the range
    * repartition is one shuffle at write time, paid once, saved every
    * read. */
  def writeSorted(df: DataFrame, sortCol: String, path: String,
      partitions: Int = 0): Unit = {
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, col(sortCol))
      else df.repartitionByRange(col(sortCol))
    ranged.sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Idempotent dt-partitioned parquet sink: dynamic partition overwrite
    * replaces only the partitions present in `df`. Replaying the same
    * batch is a no-op state-wise; other partitions are untouched. */
  def overwriteByPartition(df: DataFrame, partitionCol: String,
      path: String): Unit =
    // per-WRITE option, not the session conf: setting the conf would
    // silently turn every later overwrite in the session dynamic
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
}
