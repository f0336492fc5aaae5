package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.sources.Tables

/** Input normalization contract of [[graft.sources.Tables.load]].
  *
  * The driver regenerates the testdata between rounds and has already
  * shipped `events.ts` as parquet TIMESTAMP(NANOS) (→ legacy long read)
  * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (→ Spark 4 infers
  * TIMESTAMP_NTZ). The engine's event-time contract is instant-semantics
  * `TimestampType`; every physical shape must normalize to it, or
  * `unix_millis`/watermark consumers (q15/x22/x28) throw
  * DATATYPE_MISMATCH — the round-8 regression.
  */
class TablesSpec extends SparkSpec {

  test("events.ts normalizes to TimestampType whatever the driver wrote") {
    val events = Tables.load(spark, sf(), "events")
    assert(events.schema("ts").dataType == TimestampType)
    // the ms-epoch consumers must evaluate (this is exactly what crashed
    // q15_rate_limiter / x22_sessionize / x28_session_rollup in round 8)
    assert(events.select(unix_millis(col("ts"))).head().getLong(0) > 0L)
  }

  test("an NTZ-written events table round-trips value-preserving in UTC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    try {
      // 2024-01-02T03:04:05.678901 written as NTZ micros — the shape the
      // round-9 testdata has
      spark.sql(
        """SELECT 1L AS event_id,
          |  TIMESTAMP_NTZ '2024-01-02 03:04:05.678901' AS ts,
          |  7L AS user_id, 'click' AS event_type, 1.0 AS value,
          |  '{}' AS props""".stripMargin)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType == TimestampNTZType,
        "precondition: parquet written without UTC adjustment infers NTZ")
      val loaded = Tables.load(spark, dir, "events")
      assert(loaded.schema("ts").dataType == TimestampType)
      // UTC session ⇒ the NTZ wall clock IS the instant: micros preserved
      val micros = loaded.select(unix_micros(col("ts"))).head().getLong(0)
      assert(micros == 1704164645678901L)
    } finally Queries.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("q15/x22/x28 evaluate on the current driver testdata") {
    for (name <- Seq("q15_rate_limiter", "x22_sessionize", "x28_session_rollup")) {
      val n = SparkEntry.queries(name)(spark, sf()).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("a crashed verify query leaves a readable error marker, not an omission") {
    val out = java.nio.file.Files.createTempDirectory("graft_vmark").toString
    try {
      Verify.writeErrorMarker(spark, out, "q99_boom",
        new IllegalStateException("x" * 600))
      val got = spark.read.parquet(s"$out/q99_boom").collect()
      assert(got.length == 1)
      val row = got.head
      assert(row.getAs[String]("graft_error") == "GRAFT_QUERY_CRASHED")
      val msg = row.getAs[String]("graft_message")
      assert(msg.startsWith("java.lang.IllegalStateException"))
      assert(msg.length == 500, "exception text must be truncated to 500 chars")
    } finally Queries.deleteTree(java.nio.file.Paths.get(out))
  }
}
