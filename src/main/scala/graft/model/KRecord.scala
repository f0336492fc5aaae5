package graft.model

/** The engine's record shape, mirroring the reference's `krecord<K,V>`
  * (reference: include/kspp/krecord.h:12-64).
  *
  *  - `value == None` is a **tombstone**: a delete in table context, a skip in
  *    stream context (reference: processors/filter.h:48, join.h:89).
  *  - `eventTime` is epoch milliseconds (reference: krecord.h:7-10).
  *
  * In DataFrame-land the same contract is a row `(key, value NULLABLE,
  * event_time)`; this case class is the typed-Dataset view used by the
  * stateful streaming operators.
  */
final case class KRecord[K, V](key: K, value: Option[V], eventTime: Long) {
  def isTombstone: Boolean = value.isEmpty
}

object KRecord {
  def of[K, V](key: K, value: V, eventTime: Long): KRecord[K, V] =
    KRecord(key, Option(value), eventTime)
  def tombstone[K, V](key: K, eventTime: Long): KRecord[K, V] =
    KRecord(key, None, eventTime)
}
