package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Lifecycle handle for the DataFrames the lazy pair operators pin.
  *
  * [[Dedup.jaccardPairs]], [[Dedup.minhashLshPairs]], [[Dedup.simhashPairs]],
  * [[Similarity.lshTopK]] and [[Similarity.cosineNearDupPairs]] each persist
  * one intermediate (the posting / banded-signature table) because it feeds
  * a hot-bucket aggregation plus both sides of a self-join — without the
  * pin, the corpus would be scanned and sketched three times. The operators
  * are lazy, so they can never unpersist safely themselves: the pin must
  * outlive the returned plan's consumption.
  *
  * This class makes that lifetime explicit. Operators register every pin
  * with the [[CacheScope]] in implicit scope; callers running many corpora
  * through a long-lived session bring their own and release it once results
  * are materialized:
  *
  * {{{
  * implicit val scope = new CacheScope
  * val pairs = Dedup.minhashLshPairs(corpus, "id", "text", 3, 128, 32, 0.7)
  * pairs.write.parquet(out)   // consume FIRST —
  * scope.release()            // — release after; the pin dies with the scope
  * }}}
  *
  * When no scope is supplied, pins land in [[CacheScope.appLifetime]] and
  * stay resident until block-manager LRU eviction (the pre-scope behavior);
  * `CacheScope.appLifetime.release()` frees them all.
  *
  * Pins are REFCOUNTED across scopes (keyed by the canonicalized logical
  * plan): if scopes A and B both pin the same plan, A's release only drops
  * A's reference — the block survives until the last referencing scope
  * releases, so B's consumers never silently recompute. A plan cached by
  * the caller directly (`.cache()` outside any scope) is never tracked and
  * never unpersisted here.
  */
final class CacheScope {
  import CacheScope.{lock, refs}

  private val pinned = scala.collection.mutable.LinkedHashMap.empty[LogicalPlan, DataFrame]
  private val pinnedRdds = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]

  /** Persist `df` (MEMORY_AND_DISK) and track it for [[release]].
    * Idempotent per (scope, logical plan): re-pinning an already-pinned plan
    * (the bench re-constructing the same query, a second pass) neither
    * re-persists nor inflates the refcount — without this the shared
    * [[CacheScope.appLifetime]] buffer would grow by one reference per
    * operator invocation, forever. */
  private[graft] def pin(df: DataFrame): DataFrame = lock.synchronized {
    val key = df.queryExecution.analyzed.canonicalized
    if (pinned.contains(key)) df // this scope already holds a reference
    else if (refs.contains(key)) { // another scope pinned it — share, refcount
      refs(key) += 1
      pinned(key) = df
      df
    } else if (df.storageLevel == StorageLevel.NONE) { // CacheManager plan lookup
      refs(key) = 1
      pinned(key) = df
      df.persist(StorageLevel.MEMORY_AND_DISK)
    } else df // cached by the caller outside any scope: not ours to manage
  }

  /** Persist an RDD-backed lineage cut (MEMORY_AND_DISK) and track it for
    * [[release]] — the lifecycle half of the LogicalRDD truncation idiom
    * ([[Diversify.mmr]]'s loop-invariant frames): each cut is a fresh RDD
    * object, so there is no cross-scope sharing to refcount; release
    * unpersists it outright. Without tracking, every invocation leaks one
    * persisted RDD into the block manager for the session's lifetime —
    * the exact drift [[graft.SessionSoakSpec]] guards. */
  private[graft] def pinRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    lock.synchronized {
      pinnedRdds += rdd
      rdd.persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Drop this scope's references; unpersist (non-blocking) each plan whose
    * LAST reference this was. Call only after the plans built on top have
    * been fully consumed. */
  def release(): Unit = lock.synchronized {
    pinned.foreach { case (key, df) =>
      val remaining = refs.getOrElse(key, 1) - 1
      if (remaining <= 0) {
        refs.remove(key)
        df.unpersist(blocking = false)
      } else refs(key) = remaining
    }
    pinned.clear()
    pinnedRdds.foreach(_.unpersist(blocking = false))
    pinnedRdds.clear()
  }

  /** Number of currently tracked RDD cuts — observability beside
    * [[pinnedCount]]. */
  def pinnedRddCount: Int = lock.synchronized(pinnedRdds.size)

  /** Number of currently tracked pins — observability for session hygiene. */
  def pinnedCount: Int = lock.synchronized(pinned.size)
}

object CacheScope {
  private val lock = new Object
  /** Global refcounts for scope-managed cached plans, keyed by canonicalized
    * logical plan — the cross-scope ledger [[CacheScope.release]] consults
    * before unpersisting. */
  private val refs = scala.collection.mutable.Map.empty[LogicalPlan, Int]

  /** Fallback scope when the caller doesn't supply one: pins live for the
    * application lifetime, bounded only by storage-memory LRU. */
  implicit val appLifetime: CacheScope = new CacheScope
}
