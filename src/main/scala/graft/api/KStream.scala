package graft.api

import org.apache.spark.sql.{Dataset, Encoder}

import graft.model.KRecord
import graft.streaming.StatefulOps

/** Typed topology facade over `Dataset[KRecord[K, V]]` — the streaming
  * counterpart of [[GStream]], giving the reference's topology vocabulary
  * (reference: include/kspp/topology.h + the processors headers) 1:1 so a
  * kspp topology ports line by line:
  *
  * {{{
  * // example3-count (examples/example3-count/example3-count.cpp:41-67):
  * KStream(lines)
  *   .flatMapRecords(r => split(r))   // flat_map
  *   .punctuatedCountByKey(2000)      // count_by_key(2s punctuate)
  * // example2-join (examples/example2-join/example2-join.cpp):
  * KStream(events).leftJoin(KStream(changelog).toTable)
  * }}}
  *
  * Works identically on batch Datasets (Spark runs the keyed-state operators
  * per group in batch) and on streaming ones (update-mode changelogs).
  */
final class KStream[K, V](val ds: Dataset[KRecord[K, V]]) {

  /** filter (processors/filter.h:48-55): the predicate sees every record,
    * including tombstones (whose value is None); false → dropped.
    */
  def filter(p: KRecord[K, V] => Boolean)(implicit e: Encoder[KRecord[K, V]]): KStream[K, V] =
    new KStream(ds.filter(p))

  /** flat_map, 1→N with free rekey/retype (processors/flat_map.h:8-97). */
  def flatMapRecords[K2, V2](f: KRecord[K, V] => IterableOnce[KRecord[K2, V2]])(
      implicit e: Encoder[KRecord[K2, V2]]): KStream[K2, V2] =
    new KStream(ds.flatMap(f))

  /** transform_value (processors/transform.h:11-89): value rewrite, key and
    * tombstones preserved.
    */
  def mapValues[V2](f: V => V2)(implicit e: Encoder[KRecord[K, V2]]): KStream[K, V2] =
    new KStream(ds.map(r => KRecord(r.key, r.value.map(f), r.eventTime)))

  /** merge (processors/merge.h:7-183). */
  def merge(others: KStream[K, V]*): KStream[K, V] =
    new KStream(others.foldLeft(ds)((acc, o) => acc.union(o.ds)))

  /** ktable (processors/ktable.h): materialize the changelog with LWW +
    * tombstone semantics; the result is joinable and forwards accepted
    * changes downstream via [[KTable.changelog]].
    */
  def toTable: KTable[K, V] = new KTable(ds)

  /** delay (processors/delay.h): records surface once the watermark passes
    * eventTime + delayMs.
    */
  def delay(delayMs: Long, watermarkDelay: String = "0 seconds")(
      implicit ek: Encoder[K], eh: Encoder[StatefulOps.Held[K, V]],
      ew: Encoder[StatefulOps.WRec[K, V]], er: Encoder[KRecord[K, V]]): KStream[K, V] =
    new KStream(StatefulOps.delay(ds, delayMs, watermarkDelay))

  /** rate_limiter (processors/rate_limiter.h): admits through the per-key
    * token bucket, rejected records dropped.
    */
  def rateLimit(capacity: Long, ageTimeMs: Long,
                gcWatermarkDelay: Option[String] = None)(
      implicit ek: Encoder[K], eb: Encoder[StatefulOps.Bucket],
      ew: Encoder[StatefulOps.WRec[K, V]],
      er: Encoder[KRecord[K, V]]): KStream[K, V] =
    new KStream(StatefulOps.rateLimiter(ds, capacity, ageTimeMs, gcWatermarkDelay))

  /** counter store aggregation (state_stores/mem_counter_store.h): values
    * add (out-of-order accepted, negatives subtract), tombstones delete
    * under the LWW timestamp rule.
    */
  def counter(implicit ek: Encoder[K], ec: Encoder[StatefulOps.CounterCell],
              er: Encoder[KRecord[K, Long]], ev: V =:= Long): KStream[K, Long] =
    new KStream(StatefulOps.counterByKey(ds.asInstanceOf[Dataset[KRecord[K, Long]]]))

  /** count_by_key with punctuate-interval snapshots (processors/count.h).
    * Input records count 1 each (the reference's `krecord<K, void>`).
    */
  def punctuatedCountByKey(punctuateIntervalMs: Long, watermarkDelay: String = "0 seconds")(
      implicit ek: Encoder[K], ec: Encoder[StatefulOps.Counter],
      ew: Encoder[StatefulOps.WRec[K, Long]], er: Encoder[KRecord[K, Long]]): KStream[K, Long] =
    new KStream(StatefulOps.punctuatedCount(
      ds.map(r => KRecord.of(r.key, 0L, r.eventTime))(er), punctuateIntervalMs, watermarkDelay))

  /** kstream_left_join (join.h:28-118): probe the table at current state on
    * each stream event; misses emit None on the right.
    */
  def leftJoin[R](table: KTable[K, R])(
      implicit ek: Encoder[K], es: Encoder[StatefulOps.SideRec[K, V, R]],
      ej: Encoder[StatefulOps.JoinState[V, R]],
      eo: Encoder[StatefulOps.JoinEmit[K, V, R]]): Dataset[StatefulOps.JoinEmit[K, V, R]] =
    StatefulOps.streamTableJoinChangelog(ds, table.log, StatefulOps.LeftJoin)

  /** kstream_inner_join (join.h:120-209): probe misses are dropped. */
  def innerJoin[R](table: KTable[K, R])(
      implicit ek: Encoder[K], es: Encoder[StatefulOps.SideRec[K, V, R]],
      ej: Encoder[StatefulOps.JoinState[V, R]],
      eo: Encoder[StatefulOps.JoinEmit[K, V, R]]): Dataset[StatefulOps.JoinEmit[K, V, R]] =
    StatefulOps.streamTableJoinChangelog(ds, table.log, StatefulOps.InnerJoin)
}

/** A materialized changelog table (processors/ktable.h + mem_store rules). */
final class KTable[K, V] private[api] (private[api] val log: Dataset[KRecord[K, V]]) {

  /** The accepted-changes changelog (upserts + accepted deletes, stale
    * updates dropped) — what the reference's ktable materializes.
    */
  def changelog(implicit ek: Encoder[K], ec: Encoder[StatefulOps.Cell[V]],
                er: Encoder[KRecord[K, V]]): Dataset[KRecord[K, V]] =
    StatefulOps.latestByKey(log)

  /** ktable_{left,inner,outer}_join (join.h:212-508): update-mode changelog
    * join driven by both sides' events.
    */
  def join[R](right: KTable[K, R], joinType: StatefulOps.JoinType)(
      implicit ek: Encoder[K], es: Encoder[StatefulOps.SideRec[K, V, R]],
      ej: Encoder[StatefulOps.JoinState[V, R]],
      eo: Encoder[StatefulOps.JoinEmit[K, V, R]]): Dataset[StatefulOps.JoinEmit[K, V, R]] =
    StatefulOps.tableTableJoinChangelog(log, right.log, joinType)
}

object KStream {
  def apply[K, V](ds: Dataset[KRecord[K, V]]): KStream[K, V] = new KStream(ds)
}
