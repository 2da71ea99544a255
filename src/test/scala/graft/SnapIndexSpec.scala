package graft

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

    // plan shape: each persisted scan must reach its first join without a
    // ShuffleExchange — bucketing satisfies the join distribution; only
    // batch-derived sides move. (The pre-round-16 form of this assert read
    // queryExecution.sparkPlan, which predates EnsureRequirements and
    // contains no exchanges at all — it could never fail. The shared
    // helper re-arms it on the AQE-off executed plan.)
    val nScans = assertNoShuffleBeforePersistedJoin(
      DedupOps.snapshotNearDupProbe(
        spark, sf0001, "snap_band_idx", "snap_sig"),
      Set("snap_band_idx", "snap_sig"))
    assert(nScans == 2, s"expected scans of both persisted tables, got $nScans")
  }
}
