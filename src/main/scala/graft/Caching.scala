package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for the intermediates operators persist internally.
  *
  * Operators like [[graft.ext.CurationPipeline]] and the LSH paths persist
  * subtrees that feed the returned (lazy) plan more than once — the persist
  * is load-bearing for performance, but the caller, not the operator, knows
  * when the result has been materialized and the cache can go. Without a
  * release path every pipeline run leaks session-lifetime cached RDDs, and
  * on a shared session dozens of queries end up competing for one storage
  * pool: LRU eviction then forces mid-query recomputation of exactly the
  * expensive subtrees the persists were protecting (observed as a 6×
  * bench swing between rounds on unchanged code).
  *
  * Contract: operators persist through [[scoped]]; callers invoke
  * [[release]] once per unit of work — after materializing a pipeline
  * result, between benchmark queries, at job end. Releasing is safe at any
  * time: an unpersisted plan stays correct (Spark recomputes), so a release
  * mid-query can cost time but never correctness.
  */
object Caching {

  private val registry =
    new ConcurrentHashMap[SparkSession, java.util.Set[() => Unit]]()

  /** Registers an arbitrary cleanup to run at the next [[release]] — for
    * resources a Dataset.unpersist cannot reach (checkpointed round RDDs,
    * reliable-checkpoint files). Idempotent cleanups only: a concurrent
    * release can, in a benign race, run a cleanup twice.
    */
  def onRelease(spark: SparkSession)(cleanup: () => Unit): Unit = {
    // re-check after adding: if a concurrent release() detached the set
    // between computeIfAbsent and add, the cleanup would be orphaned in the
    // dead set (registered forever, never run) — retry into the live one
    var done = false
    while (!done) {
      val set = registry.computeIfAbsent(spark, _ => ConcurrentHashMap.newKeySet[() => Unit]())
      set.add(cleanup)
      done = registry.get(spark) eq set
    }
  }

  /** Persists `ds` at `level` and registers it for [[release]]. */
  def scoped[T](ds: Dataset[T],
                level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    val persisted = ds.persist(level)
    onRelease(ds.sparkSession)(() => persisted.unpersist(blocking = false))
    persisted
  }

  /** Runs every cleanup registered on `spark` since the last release
    * (unpersists for [[scoped]] datasets); returns how many ran.
    * Non-blocking: block deletion proceeds asynchronously, but the storage
    * is immediately reusable.
    */
  def release(spark: SparkSession): Int = {
    val set = registry.remove(spark)
    if (set == null) 0
    else {
      var n = 0
      set.forEach { f => f(); n += 1 }
      n
    }
  }

  /** Number of currently registered (unreleased) cleanups on `spark`. */
  def registered(spark: SparkSession): Int = {
    val set = registry.get(spark)
    if (set == null) 0 else set.size()
  }
}
