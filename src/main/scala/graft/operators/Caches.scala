package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for operator-internal caches — the storage
  * ownership contract for a long-running 100 TB session.
  *
  * Several operators persist an intermediate frame that feeds two or
  * more branches of the RETURNED (still lazy) plan — e.g. a vocab table
  * consumed by both its own total and a broadcast join, or a hashed
  * gram table consumed by a shared-count agg and a join-back. Those
  * caches cannot be dropped inside the operator (the caller has not run
  * an action yet), so they are registered here instead of leaking
  * silently: after consuming an operator's result, a long-running
  * session calls [[Caches.clear]] to release every operator-internal
  * block in one sweep. `Bench`/`Verify` do this between queries (beside
  * `spark.catalog.clearCache()`, which only covers `CacheManager`
  * entries, not checkpoint blocks).
  *
  * Operators that materialize their result eagerly (`localCheckpoint` —
  * `Dedup.minhashDupPairs`, `connectedComponents`,
  * `Graph.pageRankNanos`) release their internal caches themselves
  * before returning; the checkpoint blocks BACKING the returned frame
  * live outside the `CacheManager` (so `Dataset.unpersist` is a no-op
  * on them) and are freed either by the `ContextCleaner` when the frame
  * is garbage collected, or deterministically via [[releaseResult]].
  */
object Caches {

  private val tracked =
    ConcurrentHashMap.newKeySet[Dataset[_]]()

  /** Persist `df` at MEMORY_AND_DISK and register it for [[clear]].
    * Used for every operator-internal multi-consumer intermediate whose
    * lifetime extends past the operator call (the frame feeds the
    * returned lazy plan). */
  private[graft] def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df
  }

  /** Number of registered, not-yet-cleared operator caches. */
  def trackedCount: Int = tracked.size()

  /** Unpersist every registered operator-internal cache (non-blocking)
    * and empty the registry. Safe to call at any point — frames already
    * unpersisted elsewhere are a no-op. */
  def clear(): Unit = {
    val it = tracked.iterator()
    while (it.hasNext) {
      val df = it.next()
      // a frame whose SparkContext has already stopped has no blocks
      // left to free — unpersist would NPE into the dead driver
      // endpoint (the Bench anchor reps stop a session per rep and
      // clear() afterwards; any operator that persistTracked'ed inside
      // that rep leaves its entry behind)
      try {
        if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
      } catch { case scala.util.control.NonFatal(_) => () }
      it.remove()
    }
  }

  /** Import-site syntax for [[persist]]: `df.persistTracked` replaces
    * `df.persist(MEMORY_AND_DISK)` at every operator-internal
    * multi-consumer cache site, registering the frame for [[clear]]. */
  private[graft] implicit class Persisted(private val df: DataFrame)
      extends AnyVal {
    def persistTracked: DataFrame = Caches.persist(df)
  }

  /** Deterministically free the localCheckpoint blocks backing an
    * eagerly-materialized operator result (`minhashDupPairs`,
    * `connectedComponents`, `pageRankNanos`, …). `Dataset.unpersist`
    * cannot do this — checkpoint blocks are RDD-level persists outside
    * the `CacheManager` — so this walks the plan's `LogicalRDD` leaves
    * and unpersists their backing RDDs. Without it the blocks are still
    * freed, but only when the `ContextCleaner` collects the frame. */
  def releaseResult(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
