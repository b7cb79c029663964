package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Read-only view of the session CacheManager for storage-hygiene
  * specs. Spark 4 keeps `sharedState.cacheManager` `private[sql]`, so
  * asserting "an operator left no pinned residue" needs this one-line
  * shim in the sql package tree (same technique as [[ColumnBridge]]).
  */
object CacheBridge {
  /** True when the session holds NO cached plans at all. */
  def isEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
