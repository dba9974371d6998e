package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Persist-if-absent for stages SHARED across a query family (the
  * LSH shingle stage, the ANN twin corpus, the search-doc metadata
  * graph, the decontamination corpus shingles): the session
  * CacheManager resolves cached data BY PLAN, so a repeat caller
  * re-persisting the same plan only warns ("Asked to cache already
  * cached data") and churns the manager — guard on the storage level
  * instead, and fill the cache EAGERLY in one job before consumers fan
  * out (racing consumers would otherwise each recompute the stage).
  *
  * Family stages deliberately stay cached for the session — the shape
  * a long-running analytics session wants, and what the bench measures
  * (its harness clears the cache between passes). At deployment scale
  * a family stage this hot becomes a staged parquet write instead. */
private[graft] object SharedStage {
  def cached(df: DataFrame, eager: Boolean = true): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      if (eager) df.count()
    }
    df
  }
}
