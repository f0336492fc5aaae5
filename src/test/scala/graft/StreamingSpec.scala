package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.KRecord
import graft.streaming.StatefulOps

/** True streaming execution (MemoryStream micro-batches) of the stateful
  * operators: update-mode changelog emission across batches and
  * watermark-driven expiry tombstones.
  */
class StreamingSpec extends SparkSpec {

  /** Runs `body` with the RocksDB state-store provider enabled, restoring
    * BOTH confs [[GraftSession.useRocksDbState]] sets (the session is shared
    * across suites, so leaking changelogCheckpointing would make later tests
    * order-dependent).
    */
  private def withRocksDbState(body: => Unit): Unit = {
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    GraftSession.useRocksDbState(spark)
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Creates a temp checkpoint dir for `body` and deletes it afterwards. */
  private def withTempCheckpoint(prefix: String)(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir.toFile.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("streaming ktable: LWW across micro-batches, update mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KRecord[Int, String]]
    val q = StatefulOps.latestByKey(input.toDS())
      .writeStream.format("memory").queryName("lww_out").outputMode("update")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(KRecord.of(1, "v1", 100L), KRecord.of(2, "w1", 100L))
      q.processAllAvailable()
      // batch 2: stale update for key 1 (dropped), delete of key 2 (emitted)
      input.addData(KRecord.of(1, "stale", 50L), KRecord[Int, String](2, None, 200L))
      q.processAllAvailable()
      val rows = spark.table("lww_out").as[KRecord[Int, String]].collect().toSeq
      assert(rows.contains(KRecord.of(1, "v1", 100L)))
      assert(rows.contains(KRecord[Int, String](2, None, 200L)))
      assert(!rows.exists(_.value.contains("stale")))
      // batch 3: after an accepted delete the entry is ERASED (mem_store.h
      // keeps no tombstone), so an out-of-order upsert OLDER than the
      // delete is accepted again — reference-exact resurrection semantics
      input.addData(KRecord.of(2, "late", 150L))
      q.processAllAvailable()
      val rows2 = spark.table("lww_out").as[KRecord[Int, String]].collect().toSeq
      assert(rows2.contains(KRecord.of(2, "late", 150L)))
    } finally q.stop()
  }

  /** Golden expiry-tombstone sequence, shared across state-store providers
    * (test2_mem_windowed_store / test2_rocksdb_windowed_store parity).
    */
  private def windowedExpiryGolden(queryName: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KRecord[Int, String]]
    val q = StatefulOps.windowedLatestByKey(input.toDS(), retentionMs = 1000L)
      .writeStream.format("memory").queryName(queryName).outputMode("update")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(KRecord.of(1, "v1", 1000L))
      q.processAllAvailable()
      // advance event time far past retention; next batches fire the timeout
      input.addData(KRecord.of(9, "later", 10000L))
      q.processAllAvailable()
      input.addData(KRecord.of(9, "later2", 20000L))
      q.processAllAvailable()
      val rows = spark.table(queryName).as[KRecord[Int, String]].collect().toSeq
      assert(rows.contains(KRecord.of(1, "v1", 1000L)))
      assert(rows.exists(r => r.key == 1 && r.isTombstone), s"no GC tombstone in $rows")
    } finally q.stop()
  }

  test("windowed table emits expiry tombstones when the watermark passes retention") {
    windowedExpiryGolden("win_out")
  }

  test("windowed store expiry tombstones also fire on the RocksDB provider (test2_rocksdb_windowed_store parity)") {
    withRocksDbState { windowedExpiryGolden("win_rocks_out") }
  }

  test("punctuatedCount follows count.h cadence: snapshot at boundary, stamped with deadline, only when dirty") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KRecord[Int, Long]]
    val q = StatefulOps.punctuatedCount(input.toDS(), punctuateIntervalMs = 1000L)
      .writeStream.format("memory").queryName("punct_out").outputMode("update")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: key 1 twice; first event seeds deadline 2000, no emission yet
      input.addData(KRecord.of(1, 0L, 1000L), KRecord.of(1, 0L, 1100L))
      q.processAllAvailable()
      assert(spark.table("punct_out").isEmpty)
      // batch 2: event past the deadline → snapshot of the *pre-event* count,
      // stamped with the old deadline (count.h:57-60), next = 2500 + 1000
      input.addData(KRecord.of(1, 0L, 2500L))
      q.processAllAvailable()
      // batches 3-5: unrelated keys advance the watermark so idle keys flush
      // their dirty snapshots via timeout (key 1 at deadline 3500, key 2 at 11000)
      input.addData(KRecord.of(2, 0L, 10000L))
      q.processAllAvailable()
      input.addData(KRecord.of(3, 0L, 20000L))
      q.processAllAvailable()
      input.addData(KRecord.of(4, 0L, 30000L))
      q.processAllAvailable()
      val snaps = spark.table("punct_out").as[KRecord[Int, Long]].collect()
        .filter(r => r.key == 1 || r.key == 2)
        .map(r => (r.key, r.value.get, r.eventTime)).toSet
      assert(snaps == Set((1, 2L, 2000L), (1, 3L, 3500L), (2, 1L, 11000L)), s"got $snaps")
    } finally q.stop()
  }

  test("keyed state survives a query restart from checkpoint (commit_chain/offset_storage parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withTempCheckpoint("graft_ckpt") { ckpt =>
      val input = MemoryStream[KRecord[Int, String]]
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[KRecord[Int, String]]()
      def start() = StatefulOps.latestByKey(input.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[KRecord[Int, String]], _: Long) =>
          b.collect().foreach(emitted.add)
        }
        .trigger(Trigger.ProcessingTime(0)).start()
      val q1 = start()
      try {
        input.addData(KRecord.of(1, "v1", 100L))
        q1.processAllAvailable()
      } finally q1.stop()
      // restart from the same checkpoint: the LWW cell for key 1 must be
      // recovered, so a stale update is still rejected
      val q2 = start()
      try {
        input.addData(KRecord.of(1, "stale", 50L), KRecord.of(1, "v2", 200L))
        q2.processAllAvailable()
        val rows = scala.jdk.CollectionConverters.CollectionHasAsScala(emitted).asScala.toSeq
        assert(rows.contains(KRecord.of(1, "v1", 100L)))
        assert(rows.contains(KRecord.of(1, "v2", 200L)))
        assert(!rows.exists(_.value.contains("stale")), s"stale accepted after restart: $rows")
      } finally q2.stop()
    }
  }

  test("throttle: source admission options and batch pacing (thoughput_limiter.h parity)") {
    import graft.streaming.Throttle
    // 1000 msg/s at a 500 ms trigger → 500 rows per micro-batch
    assert(Throttle.sourceOptions(1000L, 500L) == Map("maxOffsetsPerTrigger" -> "500"))
    import spark.implicits._
    var written = 0L
    val pace = Throttle.paceBatches(b => written += b.count(), messagesPerSec = 1000L)
    val t0 = System.nanoTime()
    pace(Seq(1, 2, 3).toDF("n"), 0L)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(written == 3L)
    // 3 rows at 1000/s → at least 3 ms of pacing budget consumed
    assert(elapsedMs >= 3, s"no pacing: $elapsedMs ms")
    // a rate that truncates to 0 rows/trigger would stall the stream
    // forever (maxOffsetsPerTrigger=0 admits nothing) — raise instead
    val e = intercept[IllegalArgumentException](Throttle.sourceOptions(100L, 5L))
    assert(e.getMessage.contains("rounds to 0"), e.getMessage)
    intercept[IllegalArgumentException](Throttle.sourceOptions(0L, 500L))
    // a throwing writer must still unpersist its cached batch — foreachBatch
    // retries would otherwise stack one leaked cached copy per attempt
    val leaky = Seq(1, 2).toDF("n")
    val failing = Throttle.paceBatches(_ => throw new RuntimeException("sink down"), 1000L)
    intercept[RuntimeException](failing(leaky, 0L))
    assert(leaky.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      s"failed batch left cached at ${leaky.storageLevel}")
  }

  test("stateful entry points reject non-positive time/capacity parameters at construction") {
    import spark.implicits._
    val ds = Seq(KRecord.of(1, "v", 100L)).toDS()
    val counts = Seq(KRecord.of(1, 1L, 100L)).toDS()
    // mid-stream these are a per-record ArithmeticException (ageTimeMs=0),
    // a silent admit-nothing (capacity=0), or a setTimeoutTimestamp crash
    // (retention/punctuate <= 0) — all should fail fast on the driver
    intercept[IllegalArgumentException](StatefulOps.rateLimiter(ds, capacity = 0L, ageTimeMs = 100L))
    intercept[IllegalArgumentException](StatefulOps.rateLimiter(ds, capacity = 2L, ageTimeMs = 0L))
    intercept[IllegalArgumentException](StatefulOps.windowedLatestByKey(ds, retentionMs = 0L))
    intercept[IllegalArgumentException](StatefulOps.punctuatedCount(counts, punctuateIntervalMs = 0L))
  }

  test("table-table join state is dropped when both sides tombstone (no unbounded growth)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[KRecord[Int, String]]
    val right = MemoryStream[KRecord[Int, Long]]
    val q = StatefulOps.tableTableJoinChangelog(left.toDS(), right.toDS(), StatefulOps.InnerJoin)
      .writeStream.format("memory").queryName("tt_gc_out").outputMode("update")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      left.addData(KRecord.of(1, "l1", 100L))
      right.addData(KRecord.of(1, 10L, 100L))
      q.processAllAvailable()
      assert(q.recentProgress.flatMap(_.stateOperators).exists(_.numRowsTotal == 1),
        "one live key must hold one state row")
      // both sides tombstone: insertCell erases each cell, and the empty
      // JoinState must be REMOVED — a churning key space would otherwise
      // grow the state store forever
      left.addData(KRecord[Int, String](1, None, 200L))
      right.addData(KRecord[Int, Long](1, None, 200L))
      q.processAllAvailable()
      val lastRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal).last
      assert(lastRows == 0, s"fully-tombstoned key must free its state row: $lastRows")
    } finally q.stop()
  }

  test("stateful ops run on the RocksDB state store provider (rocksdb_store parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDbState {
      val input = MemoryStream[KRecord[Int, String]]
      val q = StatefulOps.latestByKey(input.toDS())
        .writeStream.format("memory").queryName("rocks_out").outputMode("update")
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        input.addData(KRecord.of(1, "v1", 100L), KRecord.of(2, "w1", 100L))
        q.processAllAvailable()
        input.addData(KRecord.of(1, "v2", 200L), KRecord[Int, String](2, None, 300L))
        q.processAllAvailable()
        val rows = spark.table("rocks_out").as[KRecord[Int, String]].collect().toSeq
        assert(rows.contains(KRecord.of(1, "v2", 200L)))
        assert(rows.contains(KRecord[Int, String](2, None, 300L)))
        // the state really lives in RocksDB
        val progress = q.lastProgress
        assert(progress.stateOperators.nonEmpty)
        assert(q.recentProgress.flatMap(_.stateOperators).exists(_.numRowsTotal == 2))
      } finally q.stop()
    }
  }

  test("counter store on RocksDB provider merges additively across checkpoint restart (test2_rocksdb_counter_store parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDbState {
      withTempCheckpoint("graft_rocks_ckpt") { ckpt =>
        val input = MemoryStream[KRecord[Int, Long]]
        val emitted = new java.util.concurrent.ConcurrentLinkedQueue[KRecord[Int, Long]]()
        def start() = StatefulOps.counterByKey(input.toDS())
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[KRecord[Int, Long]], _: Long) =>
            b.collect().foreach(emitted.add)
          }
          .trigger(Trigger.ProcessingTime(0)).start()
        // the reference sequence: insert 1s for keys 0/1/2, merge +1 on 2,
        // then reopen the store from disk and keep counting
        val q1 = start()
        try {
          input.addData(KRecord.of(0, 1L, 100L), KRecord.of(1, 1L, 100L), KRecord.of(2, 1L, 100L))
          q1.processAllAvailable()
          input.addData(KRecord.of(2, 1L, 110L))
          q1.processAllAvailable()
        } finally q1.stop()
        // restart from the checkpoint: RocksDB state recovers, so key 2's
        // next merge starts from 2, and a negative merge aggregates (the
        // reference accepts old-timestamp updates on counters — aggregation,
        // not LWW)
        val q2 = start()
        try {
          input.addData(KRecord.of(2, 2L, 90L), KRecord.of(0, -2L, 120L))
          q2.processAllAvailable()
          val rows = scala.jdk.CollectionConverters.CollectionHasAsScala(emitted).asScala.toSeq
          // the merge keeps the biggest timestamp (test2_rocksdb_counter_store
          // "keep biggest timestamp - not latest"), so ts stays 110
          assert(rows.contains(KRecord.of(2, 4L, 110L)), s"rocksdb count after restart: $rows")
          assert(rows.contains(KRecord.of(0, -1L, 120L)), s"negative merge: $rows")
        } finally q2.stop()
      }
    }
  }

  test("delay holds records until eventTime + delay <= watermark (delay.h:36-53)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KRecord[Int, String]]
    val q = StatefulOps.delay(input.toDS(), delayMs = 5000L)
      .writeStream.format("memory").queryName("delay_out").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(KRecord.of(1, "early", 1000L))
      q.processAllAvailable()
      assert(spark.table("delay_out").isEmpty) // watermark ~1000 < 1000+5000
      input.addData(KRecord.of(2, "mover", 20000L))
      q.processAllAvailable()
      input.addData(KRecord.of(3, "mover2", 30000L))
      q.processAllAvailable()
      val vals = spark.table("delay_out").as[KRecord[Int, String]].collect().flatMap(_.value).toSeq
      assert(vals.contains("early"), s"held row never released: $vals")
    } finally q.stop()
  }
}
