package graft.ext

import org.apache.spark.sql.SparkSession

/** Per-stream memo of the state-table maintenance checks every increment
  * entry point runs ([[StateLease.assertFree]], [[Dedup.finishCrashedSwap]],
  * `tableExists`).
  *
  * Before round 11 each micro-batch re-ran all of them — ~10 metastore/
  * filesystem round-trips per increment that answer the same question the
  * previous batch already answered. A fresh instance per STREAM (what
  * [[CurationPipeline.runStream]], [[Dedup.minHashLshStream]] etc. create at
  * stream open) runs each check once and memoizes:
  *
  *  - `ensureWritable` (lease free + no crashed compaction swap) is checked
  *    once per table per stream. The safety trade is explicit: a lease
  *    check at stream open instead of per batch means an EXTERNAL
  *    compaction that starts mid-stream is no longer detected per batch —
  *    but the per-batch check was always a check-then-act window, not a
  *    lock, and the supported orchestration (one driver owns a state
  *    family; in-process `compactEvery` hooks run between batches and hold
  *    the lease themselves) is unaffected. A new JVM makes a new instance,
  *    so crash recovery (`finishCrashedSwap`) still runs on restart.
  *  - `exists` memoizes TRUE only (state tables are created once and never
  *    dropped mid-stream; FALSE re-checks until the first append creates
  *    the table, which the increment records via `markExists`).
  *
  * The default argument on every increment entry point is a FRESH instance,
  * so a standalone (non-stream) increment call behaves exactly as before.
  */
final class TableChecks {
  private val writable = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val known = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Lease-free + crashed-swap-finished, once per table per instance. */
  def ensureWritable(spark: SparkSession, table: String): Unit =
    if (!writable.contains(table)) {
      StateLease.assertFree(spark, table)
      Dedup.finishCrashedSwap(spark, table)
      writable.add(table)
    }

  /** Memoized `tableExists` — caches TRUE only. */
  def exists(spark: SparkSession, table: String): Boolean =
    known.contains(table) || {
      val e = spark.catalog.tableExists(table)
      if (e) known.add(table)
      e
    }

  /** Record that an append/overwrite just created `table`. */
  def markExists(table: String): Unit = { known.add(table); () }
}

/** Shared input guards for the operator layer — ONE copy of each check so
  * the allowlists and remediation wording cannot drift between operators.
  */
private[graft] object Guards {

  /** A non-integral id silently casts to NULL under non-ANSI SQL (or hashes
    * to one constant bucket), corrupting instead of failing — every
    * operator that long-casts or hashes an id calls this first.
    */
  def requireIntegralId(df: org.apache.spark.sql.DataFrame, idCol: String,
                        context: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$context needs integral ids; '$idCol' is $dt — map ids to longs " +
        "(dictionary join / dense rank) first")
  }
}

/** Driver-side fan-out of independent actions (writes to DISTINCT targets
  * whose plans read only already-materialized inputs — persisted batch
  * subtrees or files written before the call). Spark's scheduler runs jobs
  * from concurrent driver threads freely; on a micro-batch this converts a
  * sum of per-action fixed costs into their max. Any failure rethrows after
  * all actions finish (a replayed batch must not observe a half-run set
  * that a swallowed error hid).
  */
private[graft] object ConcurrentActions {
  def run(actions: Seq[() => Unit]): Unit = {
    // a fresh thread has no thread-local active session; propagate the
    // caller's so any code consulting SparkSession.getActiveSession (conf
    // resolution, codegen artifacts) sees the right one
    val active = SparkSession.getActiveSession
    if (actions.lengthCompare(1) <= 0) actions.foreach(_.apply())
    else {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = actions.map { a =>
        val t = new Thread(() => {
          active.foreach(SparkSession.setActiveSession)
          try a() catch { case e: Throwable => errs.add(e) }
        })
        t.setDaemon(true)
        t.start()
        t
      }
      threads.foreach(_.join())
      if (!errs.isEmpty) {
        // rethrow the first failure with every OTHER concurrent failure
        // attached as suppressed — when two writes fail together the
        // second may be the root cause, and dropping it debugs a replayed
        // batch with half the evidence
        val it = errs.iterator()
        val first = it.next()
        while (it.hasNext) first.addSuppressed(it.next())
        throw first
      }
    }
  }
}
