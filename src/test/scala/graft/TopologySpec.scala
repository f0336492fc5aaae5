package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.api.KStream
import graft.model.KRecord
import graft.streaming.StatefulOps

/** Ports of the reference's example topologies through the typed facade —
  * the "a kspp user can move their topology 1:1" claim, exercised.
  */
class TopologySpec extends SparkSpec {

  test("example3-count: flat_map word split → punctuated count_by_key (example3-count.cpp:41-67)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lines = MemoryStream[KRecord[Int, String]]
    val counts = KStream(lines.toDS())
      .flatMapRecords(r => r.value.toSeq.flatMap(_.split("\\s+"))
        .map(w => KRecord.of(w, w, r.eventTime)))
      .punctuatedCountByKey(punctuateIntervalMs = 1000L)
    val q = counts.ds.writeStream.format("memory").queryName("wc_out").outputMode("update")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      lines.addData(KRecord.of(0, "hello world hello", 1000L))
      q.processAllAvailable()
      // cross the punctuate boundary (1000 + 1000) and push the watermark on
      lines.addData(KRecord.of(0, "hello again", 2500L))
      q.processAllAvailable()
      lines.addData(KRecord.of(0, "flush flush flush", 10000L))
      q.processAllAvailable()
      lines.addData(KRecord.of(0, "tail", 20000L))
      q.processAllAvailable()
      val snaps = spark.table("wc_out").as[KRecord[String, Long]].collect()
        .filter(r => Set("hello", "world", "again").contains(r.key))
        .map(r => (r.key, r.value.get)).toSet
      // hello: 2 at its first boundary, then 3 after t=2500; world: 1; again: 1
      assert(snaps == Set(("hello", 2L), ("hello", 3L), ("world", 1L), ("again", 1L)), s"got $snaps")
    } finally q.stop()
  }

  test("example2-join: stream left-joins a materialized table (example2-join.cpp:62-93)") {
    import spark.implicits._
    // routing table changelog: uuid-ish keys → values, incl. one overwrite
    val changelog = spark.createDataset(Seq(
      KRecord.of(1, "v1", 10L), KRecord.of(2, "v2", 20L), KRecord.of(1, "v1b", 30L)))
    val events = spark.createDataset(Seq(
      KRecord.of(1, "e1", 100L), KRecord.of(2, "e2", 110L), KRecord.of(3, "e3", 120L)))
    val out = KStream(events).leftJoin(KStream(changelog).toTable)
      .collect().sortBy(_.eventTime).map(e => (e.key, e.left.get, e.right)).toSeq
    assert(out == Seq(
      (1, "e1", Some("v1b")), // LWW overwrite visible at probe time
      (2, "e2", Some("v2")),
      (3, "e3", None))) // miss → left join emits None
  }

  test("facade table-table join matches the StatefulOps golden path") {
    import spark.implicits._
    val a = spark.createDataset(Seq(KRecord.of(42, "A", 3L), KRecord[Int, String](42, None, 7L)))
    val b = spark.createDataset(Seq(KRecord.of(42, "a", 4L)))
    val facade = KStream(a).toTable.join(KStream(b).toTable, StatefulOps.OuterJoin)
      .collect().sortBy(_.eventTime).map(e => (e.eventTime, e.tombstone, e.left, e.right)).toSeq
    assert(facade == Seq(
      (3L, false, Some("A"), None),
      (4L, false, Some("A"), Some("a")),
      (7L, false, None, Some("a"))))
  }

  test("facade filter sees tombstones; mapValues preserves them (filter.h:48, transform.h)") {
    import spark.implicits._
    val recs = spark.createDataset(Seq(
      KRecord.of(1, "keep", 1L), KRecord.of(2, "drop", 2L), KRecord[Int, String](3, None, 3L)))
    val out = KStream(recs)
      .filter(r => !r.value.contains("drop"))
      .mapValues(_.toUpperCase)
      .ds.collect().sortBy(_.eventTime).toSeq
    assert(out == Seq(KRecord.of(1, "KEEP", 1L), KRecord[Int, String](3, None, 3L)))
  }
}
