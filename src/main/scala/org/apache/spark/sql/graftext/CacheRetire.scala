package org.apache.spark.sql.graftext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}

/** Per-query cache retirement for long-lived multi-threaded harnesses.
  *
  * Operator builders `.cache()` the intermediates they reuse within one
  * query and return a lazy frame — there is no in-query point "after
  * materialization" to unpersist at (DedupOps caching contract). Bench
  * and sequential Verify sweep with `spark.catalog.clearCache()` between
  * queries; Verify's PARALLEL mode cannot (a global clear yanks frames a
  * concurrent sibling is mid-scan on, forcing a recompute storm), so it
  * previously relied on MEMORY_AND_DISK LRU eviction and accumulated
  * every query's cached frames for the whole run.
  *
  * [[retire]] releases exactly the finished query's storage: it walks the
  * frame's analyzed-with-cached-data plan for the [[InMemoryRelation]]s
  * it reads (recursing into cached plans for nested caches) and drops
  * their RDD blocks via the relation's own cache builder. The
  * CacheManager ENTRY stays registered — if a later query builds the
  * same subplan it transparently re-materializes (plain RDD-unpersist
  * semantics), and a sibling concurrently scanning a plan-deduplicated
  * shared cache just recomputes the partitions it still needs — so this
  * is safe to call the moment a query's output is fully written. */
object CacheRetire {
  def retire(df: DataFrame): Unit = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[InMemoryRelation, java.lang.Boolean]())
    def fromPhysical(p: SparkPlan): Unit = p.foreach {
      case s: InMemoryTableScanExec => fromRelation(s.relation)
      case _ =>
    }
    def fromRelation(r: InMemoryRelation): Unit = if (seen.add(r)) {
      fromPhysical(r.cachedPlan)
      r.cacheBuilder.clearCache(blocking = false)
    }
    df.queryExecution.withCachedData.foreach {
      case r: InMemoryRelation => fromRelation(r)
      case _ =>
    }
  }
}
