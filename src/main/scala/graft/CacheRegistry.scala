package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.util.QueryExecutionListener

/** Tracks DataFrames persisted *internally* by graft rewrites and pipeline
  * ops (grid left-outer join row-id tagging, minhash/jaccard signature
  * reuse) and releases them automatically once a consuming query finishes.
  *
  * Without this, optimizer-time persists pin their whole input in the
  * block-manager cache for the session lifetime — at 100 TB that is an
  * unbounded leak. Release is matched by cache-builder identity: when a
  * completed query's optimized plan references the registered cache's
  * InMemoryRelation, the cache did its job and is dropped (non-blocking).
  *
  * `releaseAll()` is the manual release path for long-lived sessions that
  * never run the consuming action to completion (e.g. abandoned queries).
  */
object CacheRegistry {

  /** value = minimum QueryExecution id (exclusive) a completed query
    * must carry for its sweep to release this cache; Long.MinValue means
    * "any referencing query releases" (the planner-rule case, where the
    * CONSUMING query's QueryExecution was created before the rule — and
    * thus the registration — ran inside its optimization). */
  private val caches = new ConcurrentHashMap[DataFrame, java.lang.Long]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  /** Register a df that the caller has just persisted; returns it.
    *
    * `afterCurrent = true` arms the release only for queries whose
    * QueryExecution is created AFTER this call (ADVICE r17): an operator
    * that runs an eager stats action over the cache before handing the
    * consuming DataFrame back (bm25/unigram corpus stats) must not have
    * that action's async onSuccess sweep release the cache out from
    * under the real consumers — the release should fire on the gate
    * query, which is created later. Leave it false for planner-rule
    * registrations, where the consuming query's QueryExecution predates
    * the registration by construction. */
  def register(df: DataFrame, afterCurrent: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (hooked.add(spark)) spark.listenerManager.register(new SweepListener)
    // sampling the monotone QueryExecution id counter: a fresh trivial
    // Dataset's QueryExecution carries the next id — nothing executes
    val barrier: Long =
      if (afterCurrent)
        try spark.range(0).queryExecution.id
        catch { case _: Throwable => Long.MinValue }
      else Long.MinValue
    caches.put(df, barrier)
    df
  }

  /** Release ONE tracked cache immediately (abandoned-rewrite bail-out
    * path: a planner rule that persisted intermediates but then declined
    * the rewrite must not leave them pinned for the session). */
  def release(df: DataFrame): Unit = {
    caches.remove(df)
    try df.unpersist(blocking = false) catch { case _: Throwable => () }
  }

  /** Manual release path: unpersist every tracked internal cache now. */
  def releaseAll(): Unit = {
    caches.forEach { (df, _) =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    caches.clear()
  }

  /** Number of internal caches currently pinned (test/ops visibility). */
  def pinnedCount: Int = caches.size()

  private def builderOf(df: DataFrame): Option[AnyRef] =
    try df.sparkSession.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .map(_.cachedRepresentation.cacheBuilder)
    catch { case _: Throwable => None }

  private final class SweepListener extends QueryExecutionListener {
    private def sweep(qe: QueryExecution): Unit = {
      if (caches.isEmpty) return
      val present: Set[AnyRef] =
        try qe.optimizedPlan.collect {
          case r: InMemoryRelation => r.cacheBuilder: AnyRef
        }.toSet
        catch { case _: Throwable => Set.empty }
      if (present.isEmpty) return
      caches.forEach { (df, barrier) =>
        if (qe.id > barrier &&
            builderOf(df).exists(b => present.exists(_ eq b))) {
          caches.remove(df)
          try df.unpersist(blocking = false) catch { case _: Throwable => () }
        }
      }
    }
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      sweep(qe)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      sweep(qe)
  }
}
