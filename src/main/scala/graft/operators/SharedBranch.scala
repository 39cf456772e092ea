package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Persist-once for a frame consumed by MULTIPLE plan branches.
  *
  * Two physical executions of the same subtree are not merely wasted work:
  * for a sampled range exchange they can be WRONG (RangePartitioner picks
  * bounds from a reservoir sample per execution — the PrefixSum round-3
  * bug), and for an expensive extraction they run once per branch.
  * Persisting makes every consumer read one materialization.
  *
  * Discipline: Spark's CacheManager keys entries by canonicalized plan, so
  * the lookup guard keeps re-constructions of the same query from warning
  * / re-registering; the entry is registered with
  * [[graft.sources.Tables.registerPinned]] so `Tables.evict(session)` (and
  * the context-end listener) releases it instead of letting per-input
  * cache entries accumulate for the context lifetime.
  */
object SharedBranch {

  def sharedBranch(df: DataFrame): DataFrame = {
    val cached = df.sparkSession.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
    if (cached.isEmpty) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      graft.sources.Tables.registerPinned(df)
    }
    df
  }
}
