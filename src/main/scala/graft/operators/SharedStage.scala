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
  * a family stage this hot exceeds the session cache's memory budget —
  * that path is [[stagedPast]]: ONE parquet write to a session-scoped
  * staging dir past a row threshold, every later consumer scanning the
  * staged files (executor memory freed, spill pressure gone), with the
  * same plan-keyed share-don't-recompute discipline. */
private[graft] object SharedStage {
  def cached(df: DataFrame, eager: Boolean = true): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      if (eager) df.count()
    }
    df
  }

  /** Resolved stage per (application, canonicalized plan) — canonical
    * plan EQUALITY (the CacheManager's own keying), never a hash
    * fingerprint, so a collision can't alias two different stages. */
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    (String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    DataFrame]
  private val stageSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Deployment-scale variant: stages `df` in the session cache while
    * it is small, but SPILLS it to a session-scoped parquet dir once it
    * exceeds `rowThreshold` rows — the staged-write shape a family
    * stage this hot takes when a 1000-executor session cannot donate
    * cache memory to it. The first caller materializes once (persist +
    * count — the count also decides the route); repeat callers of a
    * plan-identical frame get the SAME resolved frame back (cache hit
    * or staged-scan reuse, never a recompute, never a rewrite). The
    * spilled stage reads back as a plain FileSourceScan: consumers
    * prune columns and push filters into it like any parquet source. */
  def stagedPast(df: DataFrame, rowThreshold: Long): DataFrame = {
    val key = (df.sparkSession.sparkContext.applicationId,
      df.queryExecution.analyzed.canonicalized)
    // compute UNDER the map lock: two racing first callers would each
    // materialize and each write their own staged dir (one orphaned on
    // disk, its write pure waste) — the same racing-consumers hazard
    // the eager cache fill guards against
    resolved.computeIfAbsent(key, _ => {
      // lazy persist: the ONE routing count() below both fills the
      // cache and decides the route — an eager fill first would scan
      // the stage twice on every first materialization
      val c = cached(df, eager = false)
      if (c.count() <= rowThreshold) c
      else {
        val dir = graft.sources.TmpStores
          .pidScopedRoot("graft-shared-stage")
          .resolve(s"stage-${stageSeq.incrementAndGet()}").toString
        c.write.mode("overwrite").parquet(dir)
        c.unpersist()
        df.sparkSession.read.parquet(dir)
      }
    })
  }
}
