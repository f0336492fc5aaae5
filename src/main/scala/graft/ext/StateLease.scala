package graft.ext

import org.apache.spark.sql.SparkSession

/** Single-writer lease for persisted state-table maintenance.
  *
  * The compaction contract ([[Dedup.compactBucketedTable]]: "run while no
  * increment is writing") was previously documentation only — a misbehaving
  * caller racing an increment against a compaction would corrupt the index
  * silently (the increment can append to the OLD table after compaction
  * snapshotted it, and the swap then drops those rows). This makes the
  * contract load-bearing: compaction holds a lease file for each table it
  * rewrites, and every increment entry point asserts the lease is free
  * before touching state — the race now fails loudly at the entry point
  * instead of corrupting the corpus.
  *
  * Mechanics: one marker file per table under `<warehouse>/.graft_leases/`,
  * created with `FileSystem.create(overwrite = false)` — atomic on HDFS and
  * object stores with conditional-put semantics; best-effort (check+create)
  * on a raw local filesystem, which is still a sound guard for the
  * foreachBatch orchestration this protects (increments and compactions of
  * one state family are driven from one driver). The file body records
  * owner + acquisition time for the error message.
  *
  * A compaction that CRASHES leaves its lease held, and every subsequent
  * increment fails loudly until an operator runs [[breakLease]].
  * Deliberately NO auto-expiry: only the operator knows whether the
  * compaction JVM is truly dead — a TTL that guessed wrong would readmit
  * the second writer this lease exists to exclude. Recovery is
  * `breakLease` + the increments' own [[Dedup.finishCrashedSwap]] pass.
  */
object StateLease {

  private def fs(spark: SparkSession) =
    leaseDir(spark).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The lease directory lives ON THE WAREHOUSE'S OWN FILESYSTEM: the
    * warehouse URI's scheme and authority must survive into the Path, or
    * on `s3a://bucket/wh` / `hdfs://nn/wh` the lease would silently land
    * on the DEFAULT filesystem — two drivers with different defaults would
    * then both "acquire", which is no mutual exclusion at all (the
    * previous `URI.getPath` construction stripped exactly those parts).
    */
  private def leaseDir(spark: SparkSession) =
    leaseDirFor(spark.conf.get("spark.sql.warehouse.dir"))

  private[graft] def leaseDirFor(warehouse: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(warehouseBase(warehouse), ".graft_leases")

  /** The warehouse URI as a Path WITH its scheme and authority intact —
    * shared by the lease dir and [[graft.sinks.Sinks.dropTableAndLocation]]'s
    * orphan fallback (both previously went through `URI.getPath`, which
    * silently re-rooted s3a/hdfs warehouses onto the default filesystem).
    */
  private[graft] def warehouseBase(warehouse: String): org.apache.hadoop.fs.Path = {
    val uri =
      try new java.net.URI(warehouse)
      catch { case _: java.net.URISyntaxException => null }
    if (uri != null && uri.getScheme != null) new org.apache.hadoop.fs.Path(uri)
    else new org.apache.hadoop.fs.Path(warehouse)
  }

  private def leasePath(spark: SparkSession, table: String) =
    // Locale.ROOT: a Turkish-locale JVM lowercases "INDEX" to "ındex" —
    // acquire and assertFree running under different default locales
    // would then guard DIFFERENT lease files for the same table
    new org.apache.hadoop.fs.Path(leaseDir(spark),
      table.toLowerCase(java.util.Locale.ROOT) + ".lease")

  /** Take the maintenance lease on `table`, failing loudly if another
    * writer holds it (two concurrent compactions are as unsafe as an
    * increment racing one).
    */
  def acquire(spark: SparkSession, table: String, owner: String): Unit = {
    val f = fs(spark)
    f.mkdirs(leaseDir(spark))
    val p = leasePath(spark, table)
    val out =
      try f.create(p, false)
      catch {
        // only a failed create-exclusive means "someone holds it"; any
        // other IO failure is a real filesystem error and must surface as
        // itself, not misdirect the operator toward breakLease
        case e: java.io.IOException if f.exists(p) =>
          throw new IllegalStateException(
            s"state table '$table' is under maintenance (${holder(spark, table)}) — " +
              "a compaction holds its single-writer lease; retry after it " +
              "finishes, or StateLease.breakLease if its JVM is dead", e)
      }
    // a write failure AFTER the create would otherwise strand a lease this
    // very caller created — nobody holds it, everybody is blocked
    try {
      try out.write(s"$owner since ${java.time.Instant.now()}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e: Exception =>
        try f.delete(p, false) catch { case _: Exception => () }
        throw e
    }
  }

  def release(spark: SparkSession, table: String): Unit =
    fs(spark).delete(leasePath(spark, table), false)

  /** Best-effort release for state-RESET paths
    * ([[graft.sinks.Sinks.dropTableAndLocation]]): dropping a table
    * supersedes any lease on it — a lease stranded by a crashed compaction
    * must not outlive the state it protected and block the rebuilt state
    * forever.
    */
  def releaseQuiet(spark: SparkSession, table: String): Unit =
    try release(spark, table) catch { case _: Exception => () }

  /** Operator override for a lease stranded by a crashed compaction. */
  def breakLease(spark: SparkSession, table: String): Unit =
    release(spark, table)

  private def holder(spark: SparkSession, table: String): String =
    try {
      val p = leasePath(spark, table)
      val f = fs(spark)
      val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      val in = f.open(p)
      try in.readFully(0, buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    } catch { case _: Exception => "holder unknown" }

  /** Increment-side guard: throws while `table`'s maintenance lease is
    * held. One cheap existence probe per increment — noise next to the
    * jobs the increment runs.
    */
  def assertFree(spark: SparkSession, table: String): Unit =
    if (fs(spark).exists(leasePath(spark, table)))
      throw new IllegalStateException(
        s"state table '$table' is under maintenance (${holder(spark, table)}) — " +
          "increments must not run during compaction; retry after it " +
          "finishes, or StateLease.breakLease if its JVM is dead")

  /** Lease-scoped maintenance: acquire, run, always release. */
  def withLease[A](spark: SparkSession, table: String, owner: String)(body: => A): A = {
    acquire(spark, table, owner)
    try body finally release(spark, table)
  }
}
