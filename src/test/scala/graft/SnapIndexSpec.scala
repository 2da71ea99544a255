package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.DedupOps

/** The persisted-band-index claim of snapshotNearDup, checked: the corpus
  * band buckets written as a BUCKETED table are (a) probe-joinable with
  * zero shuffle on every persisted side — bucketing is the partitioning,
  * so the corpus-sized frames never move for a batch probe — and
  * (b) row-identical to the in-query derivation.
  */
class SnapIndexSpec extends SparkTestBase {

  /** Drop a managed table AND its leftover warehouse dir (a previous JVM's
    * dirs survive on disk while the in-memory catalog is fresh). */
  private def scrub(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val loc = new java.io.File(wh, t)
    if (loc.exists()) rm(loc)
  }

  private def scansOf(p: SparkPlan, tables: Set[String]): Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec
          if s.tableIdentifier.exists(ti => tables(ti.table)) => s
    }

  test("probe of the persisted band index: zero shuffle on persisted sides, rows identical to in-query") {
    scrub("snap_band_idx"); scrub("snap_sig")
    DedupOps.buildSnapNearDupIndex(spark, sf0001, "snap_band_idx", "snap_sig")
    spark.catalog.clearCache()
    val probe = DedupOps.snapshotNearDupProbe(
      spark, sf0001, "snap_band_idx", "snap_sig")

    // rows first (also materializes under the default planner): batch_id is
    // unique post-window, so the ordered collect is deterministic
    val expected = DedupOps.snapshotNearDup(spark, sf0001).collect().toSeq
    assert(expected.nonEmpty, "fixture corpus must produce near-dup probes")
    assert(probe.collect().toSeq == expected)

    // plan shape: with broadcast off (forcing shuffle-join shapes), no
    // ShuffleExchange may sit above either persisted scan — their bucketing
    // must satisfy the join distribution; only batch-derived sides move
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = DedupOps.snapshotNearDupProbe(
        spark, sf0001, "snap_band_idx", "snap_sig").queryExecution.sparkPlan
      val persisted = Set("snap_band_idx", "snap_sig")
      assert(scansOf(plan, persisted).size == 2,
        s"expected scans of both persisted tables in:\n$plan")
      val offending = plan.collect {
        case e: ShuffleExchangeExec if scansOf(e, persisted).nonEmpty => e
      }
      assert(offending.isEmpty,
        s"persisted index/signature scans must not re-shuffle:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
