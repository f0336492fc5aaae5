package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  *
  * Concurrency: [[release]] is session-global — with concurrent queries on
  * ONE shared session, one query's release would unpersist another's
  * in-flight caches (correct but recomputes). Such callers wrap each
  * query's build-and-materialize in [[scope]]: registrations made on that
  * thread land in the scope instead of the session-global set and are
  * released when the scope exits, so neighbors' releases can't touch them.
  */
object Caching {

  private val registry =
    new ConcurrentHashMap[SparkSession, java.util.Set[() => Unit]]()

  /** Thread-local stack of open [[scope]] cleanup sets (innermost first). */
  private val localScopes =
    ThreadLocal.withInitial[java.util.ArrayDeque[java.util.Set[() => Unit]]](
      () => new java.util.ArrayDeque())

  /** Contexts whose application-end hook is installed. A session discarded
    * without a final release() would otherwise stay a strong registry key
    * forever (its cleanups reference its Datasets, which reference it);
    * dropping the registrations when the context stops bounds that pin to
    * the application lifetime. The cleanups are dropped, not run — the
    * stopped context's storage is already gone.
    */
  private val hooked = ConcurrentHashMap.newKeySet[SparkContext]()

  private def hookContext(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (hooked.add(sc)) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          hooked.remove(sc)
          val it = registry.keySet().iterator()
          while (it.hasNext) if (it.next().sparkContext eq sc) it.remove()
        }
      })
    }
  }

  /** Registers an arbitrary cleanup to run at the next [[release]] (or, if
    * a [[scope]] is open on this thread, at that scope's exit) — for
    * resources a Dataset.unpersist cannot reach (checkpointed round RDDs,
    * reliable-checkpoint files). Idempotent cleanups only: a concurrent
    * release can, in a benign race, run a cleanup twice.
    */
  def onRelease(spark: SparkSession)(cleanup: () => Unit): Unit = {
    val scopes = localScopes.get()
    if (!scopes.isEmpty) { scopes.peek().add(cleanup); return }
    hookContext(spark)
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

  /** Runs `body` with a per-scope release token on the CURRENT thread:
    * every [[scoped]]/[[onRelease]] registration made while `body` runs on
    * this thread is released when `body` finishes (even on exception)
    * instead of joining the session-global set — so concurrent queries
    * sharing a session can each scope their own caches without a global
    * [[release]] unpersisting a neighbor mid-flight. `body` must BUILD AND
    * MATERIALIZE its result inside the scope (a lazy plan escaping the
    * scope would recompute its released caches — correct, but slow).
    * Scopes nest; registrations land in the innermost.
    */
  def scope[A](body: => A): A = {
    val set = ConcurrentHashMap.newKeySet[() => Unit]()
    val scopes = localScopes.get()
    scopes.push(set)
    // a cleanup failure must never REPLACE the body's own exception (the
    // unwind cause would be lost): it rides along as suppressed instead,
    // and only surfaces as the primary failure when the body succeeded
    var primary: Throwable = null
    try body
    catch { case t: Throwable => primary = t; throw t }
    finally {
      scopes.pop()
      try { runAll(set); () }
      catch {
        case t: Throwable =>
          if (primary != null) primary.addSuppressed(t) else throw t
      }
    }
  }

  /** Run EVERY cleanup even when one throws: cleanups include IO (reliable-
    * checkpoint file deletes), and an abort on the first failure would
    * permanently orphan the rest — pinned RDD blocks for the session
    * lifetime, the exact leak this class exists to prevent. The first
    * failure rethrows with the others suppressed (the ConcurrentActions
    * evidence rule).
    */
  private def runAll(set: java.util.Set[() => Unit]): Int = {
    var n = 0
    var first: Throwable = null
    set.forEach { f =>
      try { f(); () }
      catch {
        case t: Throwable =>
          if (first == null) first = t else first.addSuppressed(t)
      }
      n += 1
    }
    if (first != null) throw first
    n
  }

  /** Runs every cleanup registered on `spark` since the last release
    * (unpersists for [[scoped]] datasets); returns how many ran.
    * Non-blocking: block deletion proceeds asynchronously, but the storage
    * is immediately reusable. Registrations inside open [[scope]]s are the
    * scopes' own and are not touched.
    */
  def release(spark: SparkSession): Int = {
    val set = registry.remove(spark)
    if (set == null) 0 else runAll(set)
  }

  /** Number of currently registered (unreleased) session-global cleanups. */
  def registered(spark: SparkSession): Int = {
    val set = registry.get(spark)
    if (set == null) 0 else set.size()
  }
}
