package org.apache.spark.sql.graftext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block cleanup for `localCheckpoint`ed frames.
  *
  * `spark.catalog.clearCache()` unpersists CacheManager entries
  * (InMemoryRelations) ONLY — the raw RDD storage blocks a
  * localCheckpoint persists are invisible to it and are otherwise freed
  * only when the ContextCleaner notices the RDD reference was GC'd. An
  * iterative trainer that checkpoints per step (lineage truncation —
  * see learnBpeMerges) must therefore release each consumed parent
  * explicitly, or its block copies leak past the harnesses'
  * clearCache sweep into the next query's measurement. */
object CheckpointUtils {
  /** Unpersist the storage blocks behind a localCheckpoint'ed frame
    * (no-op for any other plan shape). Non-blocking. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
