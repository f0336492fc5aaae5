package graft

import graft.model.KRecord
import graft.streaming.StatefulOps

/** Batch-mode execution of the keyed-state operators (Spark runs
  * flatMapGroupsWithState on batch Datasets with the same per-group
  * semantics, minus timeouts) against reference golden sequences.
  */
class StatefulOpsSpec extends SparkSpec {

  test("streaming ktable emits accepted changes only (ktable.h + mem_store rules, test8 fixture)") {
    import spark.implicits._
    val recs = Seq[KRecord[Int, String]](
      KRecord(42, None, 1L), KRecord.of(42, "A", 3L), KRecord.of(42, "B", 5L),
      KRecord(42, None, 7L), KRecord.of(42, "C", 9L), KRecord(42, None, 12L),
      KRecord.of(42, "D", 15L))
    val out = StatefulOps.latestByKey(spark.createDataset(recs))
      .collect().sortBy(_.eventTime).toSeq
    // the t=1 tombstone hits an absent key: not stored, not emitted
    assert(out == Seq(
      KRecord.of(42, "A", 3L), KRecord.of(42, "B", 5L), KRecord[Int, String](42, None, 7L),
      KRecord.of(42, "C", 9L), KRecord[Int, String](42, None, 12L), KRecord.of(42, "D", 15L)))
  }

  test("within a batch, events apply in event-time order (the reference's event-clock drain)") {
    import spark.implicits._
    // arrival order new-then-old; the event clock still processes t=5 first,
    // so both are accepted in time order and the final state is "new"
    val recs = Seq(KRecord.of(1, "new", 10L), KRecord.of(1, "old", 5L))
    val out = StatefulOps.latestByKey(spark.createDataset(recs)).collect().toSeq
    assert(out == Seq(KRecord.of(1, "old", 5L), KRecord.of(1, "new", 10L)))
  }

  test("streaming rate limiter matches the batch replay golden (test3_mem_token_bucket)") {
    import spark.implicits._
    val t0 = 1700000000000L
    val recs = Seq(
      KRecord.of(2, "a", t0), KRecord.of(2, "b", t0 + 10),
      KRecord.of(2, "c", t0 + 20), KRecord.of(2, "d", t0 + 101))
    val out = StatefulOps.rateLimiter(spark.createDataset(recs), capacity = 2, ageTimeMs = 100)
      .collect().sortBy(_.eventTime).flatMap(_.value).toSeq
    assert(out == Seq("a", "b", "d"))
  }
}
