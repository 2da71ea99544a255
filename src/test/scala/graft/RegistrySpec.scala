package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guards for the driver-contract registry. The failure modes these
  * pin are all SILENT at runtime: an oracle key that doesn't match its
  * query name simply never gets compared (the query demotes to a rows-only
  * check and the round's correctness credit quietly shrinks); a typo'd
  * knownSlow name silently stops affecting gate ordering.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("the rows-only set is exactly the documented engine-specific one") {
    // Every name here is engine-specific by NATURE (xxhash64/murmur
    // signatures, trained float quantizers, sketches) and carries
    // planted-fixture / recall / error-bound specs instead. Growing this
    // set is a deliberate decision — a new query missing its oracle should
    // fail HERE, not silently weaken the gate.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Only true SKETCHES remain: a fixed-size probabilistic summary has no
    // exact cross-engine twin by definition; each carries error-bound
    // specs against its exact counterpart instead.
    val documented = Set(
      "q_dau_approx", "q_dau_sketch_rollup",           // HLL sketches
      "q_heavy_hitters_cms",                           // count-min sketch
      "q_len_quantiles_approx")                        // KLL-style quantiles
    assert(rowsOnly == documented,
      s"undocumented rows-only: ${rowsOnly -- documented}; " +
        s"stale documented: ${documented -- rowsOnly}")
  }

  test("knownSlow names are all real queries or bench aliases") {
    val ghosts = SparkEntry.knownSlow.toSet --
      SparkEntry.queries.keySet -- SparkEntry.benchExtras.keySet
    assert(ghosts.isEmpty, s"knownSlow ghosts: $ghosts")
  }

  test("query names are registry-safe (json/sort friendly)") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q_[a-z0-9_]+"))
    assert(bad.isEmpty, s"nonconforming names: $bad")
  }

  test("bench-only aliases stay outside the verify/oracle contract") {
    // benchExtras exists so the xxhash64 production fast paths get a
    // per-round Bench timing WITHOUT entering the driver's verify loop
    // (they have no DuckDB twin). A name collision with the registry
    // would make Bench time the wrong closure; an oracle entry for one
    // would make the driver run SQL against a result it never dumps.
    val extras = SparkEntry.benchExtras.keySet
    assert((extras & SparkEntry.queries.keySet).isEmpty,
      s"benchExtras collide with the registry: ${extras & SparkEntry.queries.keySet}")
    assert((extras & SparkEntry.oracleSql.keySet).isEmpty,
      s"benchExtras must not carry oracles: ${extras & SparkEntry.oracleSql.keySet}")
    val bad = extras.filterNot(_.matches("x_[a-z0-9_]+"))
    assert(bad.isEmpty, s"bench aliases must be x_-prefixed: $bad")
  }
}
