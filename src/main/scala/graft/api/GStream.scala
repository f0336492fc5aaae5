package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ops.{Changelog, Joins, RateLimit}

/** Thin facade giving the reference's operator vocabulary
  * (reference: the include/kspp/processors headers) over a DataFrame, so a user of the
  * reference can map their topology 1:1. Every method is a declarative
  * DataFrame transformation — Catalyst sees through the facade, so predicate
  * pushdown / column pruning / join planning all still apply.
  *
  * Where the reference takes a C++ lambda, we take a `Column` expression
  * (codegen-friendly); typed lambdas remain available via `.df.as[T]`.
  */
final class GStream(val df: DataFrame) {

  /** filter (processors/filter.h:6-79). */
  def filter(pred: Column): GStream = new GStream(df.filter(pred))

  /** flat_map via generator expression, 1→N (processors/flat_map.h:8-97).
    * e.g. `flatMap(explode(split(col("text"), "\\s+")).as("word"))`.
    */
  def flatMap(generators: Column*): GStream = new GStream(df.select(generators: _*))

  /** transform_value: rewrite/add a value column, key unchanged
    * (processors/transform.h:11-89).
    */
  def transformValue(name: String, value: Column): GStream =
    new GStream(df.withColumn(name, value))

  /** transform: whole-row rewrite (processors/transform.h:93-168). */
  def transform(f: DataFrame => DataFrame): GStream = new GStream(f(df))

  /** merge: N-way union of same-typed streams (processors/merge.h:7-183). */
  def merge(others: GStream*): GStream =
    new GStream(others.foldLeft(df)((acc, o) => acc.unionByName(o.df)))

  /** visitor: terminal foreach, side effects only (processors/visitor.h:9-71). */
  def visit(f: Row => Unit): Unit = df.foreach(f)

  /** delay: each record becomes visible `delayMs` after its event time
    * (processors/delay.h:6-74). In batch the release time is materialized as
    * a column; the streaming variant holds rows on a state timeout.
    */
  def delay(eventTimeCol: String, delayMs: Long, releaseCol: String = "release_time"): GStream = {
    // the streaming twin's stance (StatefulOps.delay): a negative delay is
    // an invalid knob, not a time machine
    require(delayMs >= 0, s"delay: delayMs must be >= 0, got $delayMs")
    // the library's event-time convention is epoch MILLIS (bigint) —
    // KRecord.eventTime, rateLimit's eventTimeMsCol — where an INTERVAL add
    // is a Catalyst type error; timestamps get the interval form. Anything
    // else is rejected: `+ lit(ms)` on a DATE column would add DAYS, and on
    // a STRING it would null-coerce — both silent wrong release times
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType, TimestampNTZType, TimestampType}
    val release = df.schema(eventTimeCol).dataType match {
      case TimestampType | TimestampNTZType =>
        col(eventTimeCol) + expr(s"INTERVAL $delayMs MILLISECONDS")
      case ByteType | ShortType | IntegerType | LongType =>
        col(eventTimeCol) + lit(delayMs)
      case t => throw new IllegalArgumentException(
        s"delay: '$eventTimeCol' must be TIMESTAMP or integral epoch-millis, got $t")
    }
    new GStream(df.withColumn(releaseCol, release))
  }

  /** count_by_key (processors/count.h:9-123): keyed occurrence count. */
  def countByKey(keys: Seq[String], countCol: String = "cnt"): GStream = {
    // an input column with the count's name would yield a duplicate-named
    // output and an ambiguous-reference error far from this call
    require(!keys.contains(countCol),
      s"countByKey: count column '$countCol' collides with a key — pass countCol")
    new GStream(df.groupBy(keys.map(col): _*).agg(count(lit(1)).as(countCol)))
  }

  /** count_by_value (processors/count_by_value.h:10-126): occurrence count
    * keyed by the entire record — every column participates in the group key,
    * the Spark analog of the reference's record-equality counter store.
    */
  def countByValue(countCol: String = "cnt"): GStream = {
    require(!df.columns.contains(countCol),
      s"countByValue: count column '$countCol' collides with an input column — pass countCol")
    new GStream(df.groupBy(df.columns.map(col).toSeq: _*).agg(count(lit(1)).as(countCol)))
  }

  /** counter-store additive aggregation (state_stores/mem_counter_store.h:74-81):
    * keyed sums; Spark's hash aggregate supplies the partial (map-side) merge
    * the RocksDB merge operator provided in the reference.
    */
  def sumByKey(keys: Seq[String], sums: (String, Column)*): GStream = {
    require(sums.nonEmpty, "sumByKey requires at least one (name, aggregate) pair")
    new GStream(df.groupBy(keys.map(col): _*)
      .agg(sums.head._2.as(sums.head._1), sums.tail.map { case (n, c) => c.as(n) }: _*))
  }

  /** ktable: changelog → latest-surviving-row-per-key snapshot
    * (processors/ktable.h, mem_store LWW + tombstone rules).
    *
    * `tombstoneCol` is DELIBERATELY not defaulted: in the reference a NULL
    * value always deletes the key, but a DataFrame has no single "value"
    * column, so the caller must name which column's NULL means delete
    * (`Some(col)` — kspp parity) or state that the changelog is append-only
    * (`None` — upserts only, nothing ever deletes). A silent None default
    * here would keep tombstoned keys LIVE in the snapshot and every
    * downstream join would emit matches the reference suppresses.
    */
  def toTable(keys: Seq[String], eventTimeCol: String, tieBreakCols: Seq[String],
              tombstoneCol: Option[String]): GTable =
    new GTable(Changelog.latestByKey(df, keys, eventTimeCol, tieBreakCols, tombstoneCol), keys)

  /** kstream_left_join (join.h:28-118). */
  def leftJoin(table: GTable, on: Column, broadcastTable: Boolean = true): GStream =
    new GStream(Joins.streamTableLeft(df, table.df, on, broadcastTable))

  /** kstream_inner_join (join.h:120-209). */
  def innerJoin(table: GTable, on: Column, broadcastTable: Boolean = true): GStream =
    new GStream(Joins.streamTableInner(df, table.df, on, broadcastTable))

  /** repartition_by_foreign_key (processors/repartition.h:9-101): route each
    * record by a foreign key resolved from a routing table; records whose key
    * has no route are dropped (repartition.h:64-73 — an implicit left-semi).
    * The shuffle on `fkCol` is the Spark analog of writing to the FK-hashed
    * topic.
    */
  def repartitionByForeignKey(routing: GTable, on: Column, fkCol: String,
                              broadcastRouting: Boolean = true): GStream = {
    val routed = Joins.streamTableInner(df, routing.df, on, broadcastRouting)
    // the reference forwards the RECORD unchanged and only re-keys the
    // partitioning (repartition.h:64-73): keep the stream's own columns
    // plus the ROUTING-RESOLVED foreign key; leaking the rest of the
    // routing table into the schema would change whole-record ops
    // downstream (countByValue groups by every column). A stream column
    // named like the foreign key is rejected: silently preferring either
    // side would route by a stale value (stream side) or shadow a payload
    // column (routing side) with no error. Dataframe-qualified refs, not
    // names: the equi-key commonly exists on BOTH sides under one name
    // (stream.user_id = routing.user_id), where a bare col() is ambiguous
    require(!df.columns.contains(fkCol),
      s"repartitionByForeignKey: the stream already carries a column named " +
        s"'$fkCol'; the foreign key must resolve from the ROUTING table — " +
        "rename the stream column first")
    new GStream(routed.select(df.columns.toSeq.map(c => df(c)) :+ routing.df(fkCol): _*)
      .repartition(col(s"`${fkCol.replace("`", "``")}`")))
  }

  /** rate_limiter (processors/rate_limiter.h:12-87): per-key token bucket on
    * event time; emits all rows with an `admitted` flag (the reference drops
    * rejected rows and counts them — `filter($"admitted")` reproduces that).
    */
  def rateLimit(keys: Seq[String], eventTimeMsCol: String, tieBreakCols: Seq[String],
                capacity: Long, ageTimeMs: Long): GStream =
    new GStream(RateLimit.replay(df, keys, eventTimeMsCol, tieBreakCols, capacity, ageTimeMs))

  /** thoughput_limiter [sic] (processors/thoughput_limiter.h:12-85): global
    * processing-time throttle. A wall-clock throttle has no meaning for a
    * finite batch plan, so rather than silently doing nothing this rejects;
    * the streaming equivalents are [[graft.streaming.Throttle.sourceOptions]]
    * (admission control via `maxOffsetsPerTrigger`) and
    * [[graft.streaming.Throttle.paceBatches]] (hard cap in `foreachBatch`).
    */
  def throughputLimit(messagesPerSec: Double): GStream =
    throw new UnsupportedOperationException(
      "throughputLimit is processing-time admission control and only applies to streams: " +
        "use graft.streaming.Throttle.sourceOptions(...) on the source or " +
        "Throttle.paceBatches(...) in foreachBatch")
}

/** A materialized table snapshot (the reference's `materialized_source`):
  * the result of `toTable`, joinable from streams and other tables.
  *
  * All table-table joins require DISTINCT column names across the two
  * sides: a shared name (key or payload) would survive the join twice and
  * every later reference to it dies with an ambiguous-reference
  * AnalysisException far from the join — rename one side first (the
  * IntervalJoin disjointness rule). After [[outerJoin]] specifically, a
  * row's identity is `COALESCE(left key, right key)` — right-only rows
  * carry NULL left keys (full-outer semantics), so chain further joins on
  * the coalesced form, never on one side's key alone.
  */
final class GTable(val df: DataFrame, val keys: Seq[String]) {
  private def requireDisjoint(right: GTable, what: String): Unit = {
    val dup = df.columns.toSet.intersect(right.df.columns.toSet)
    require(dup.isEmpty,
      s"$what: column names must be distinct across the two tables; " +
        s"shared: ${dup.toSeq.sorted.mkString(", ")} — rename one side first")
  }
  def leftJoin(right: GTable, on: Column): GTable = {
    requireDisjoint(right, "GTable.leftJoin")
    new GTable(Joins.tableTableLeft(df, right.df, on), keys)
  }
  def innerJoin(right: GTable, on: Column): GTable = {
    requireDisjoint(right, "GTable.innerJoin")
    new GTable(Joins.tableTableInner(df, right.df, on), keys)
  }
  def outerJoin(right: GTable, on: Column): GTable = {
    requireDisjoint(right, "GTable.outerJoin")
    new GTable(Joins.tableTableOuter(df, right.df, on), keys ++ right.keys)
  }
  def toStream: GStream = new GStream(df)
}

object GStream {
  def apply(df: DataFrame): GStream = new GStream(df)
}
