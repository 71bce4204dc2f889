package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-barrier helper for query builders that are re-invoked across
  * interleaved bench passes: `Dataset.storageLevel` consults the
  * CacheManager by CANONICALIZED plan, so a freshly-built DataFrame
  * whose plan is already cached reports the live level — persisting it
  * again is a no-op that still costs a CacheManager round-trip and a
  * `CacheManager: Asked to cache already cached data` WARN per pass.
  * Guarding on the lookup keeps the barrier semantics (first build
  * caches, every rebuild reuses) without the churn. */
object Caching {
  def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df
}
