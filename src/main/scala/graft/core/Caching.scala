package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent persist. Library operators that cache an intermediate for
  * intra-plan reuse (LSH signature passes, CC edge lists, IVF
  * normalized vectors) get re-invoked by Verify and by each Bench pass;
  * calling `persist()` on a plan the CacheManager already holds logs
  * "Asked to cache already cached data" per call and re-pins the same
  * entry. `persistOnce` consults the CacheManager first
  * (`df.storageLevel` resolves by plan equality) and only persists a
  * not-yet-cached plan — repeat invocations silently reuse the existing
  * entry, and bench timings are unchanged (the second pass was already
  * hitting the cache through plan-equality lookup). */
object Caching {
  def persistOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df

  /** [[persistOnce]] plus eager materialization whenever a persist
    * actually happens. JoinSelection reads InMemoryRelation stats,
    * which are ACCURATE only once the cache is built; a heal that
    * re-registers persistence after `spark.catalog.clearCache()`
    * without materializing leaves size-estimated stats in place, so
    * the same query plans BroadcastHashJoin when an earlier suite
    * built the cache and SortMergeJoin when it didn't (the round-11
    * suite-order PlanFingerprintSpec failure). Memo-access wrappers
    * must use this, not persistOnce: the guarded count() fires only
    * on the persist transition, so live-cache hits stay free. */
  def persistMaterialized(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) { df.persist(); df.count(); df }
    else df
}
