package org.apache.spark.sql

/** Test-only bridge into the session's CacheManager (private[sql]): lets
  * graft specs assert that eager operators leave no persisted-Dataset
  * residue behind (`Dataset.persist` entries; localCheckpoint block
  * storage is RDD-level and GC-managed, not tracked here).
  */
object GraftCacheProbe {
  def cacheIsEmpty(s: SparkSession): Boolean =
    s.sharedState.cacheManager.isEmpty
}
