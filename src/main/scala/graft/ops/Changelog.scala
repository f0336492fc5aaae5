package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog → table semantics: the batch analog of the reference's `ktable`
  * over `mem_store` (reference: processors/ktable.h:8-116,
  * state_stores/mem_store.h:64-83).
  *
  * Rules preserved exactly:
  *  - last-writer-wins by event time; on equal event time the later update
  *    wins (store skips only when the held record is *strictly* newer);
  *  - a null value is a tombstone: the key is absent from the snapshot when
  *    the winning record is a tombstone.
  *
  * Implementation is a `max_by` hash aggregation on (event time, tie-break)
  * — one shuffle on the key WITH map-side partial combine, so the shuffle
  * carries at most one row per (key, input partition) instead of the whole
  * changelog (the window/row_number formulation it replaced shuffled and
  * per-key sorted every event). No driver-side state; scales to arbitrarily
  * many keys. Ties beyond event time are broken by caller-supplied columns
  * and must totally order each key's rows for a deterministic snapshot
  * (Spark gives no intra-key order guarantee; the reference relies on queue
  * arrival order, which has no distributed analog).
  */
object Changelog {

  /** Latest surviving row per key. `valueCol == null` rows act as tombstones
    * and delete the key when they win.
    */
  def latestByKey(
      df: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      tieBreakCols: Seq[String],
      tombstoneCol: Option[String] = None): DataFrame = {
    val ordering = struct((eventTimeCol +: tieBreakCols).map(col): _*)
    val payload = struct(df.columns.map(col): _*)
    val latest = df
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ordering).as("__row"))
      .select(col("__row.*"))
    tombstoneCol match {
      case Some(c) => latest.filter(col(c).isNotNull)
      case None    => latest
    }
  }
}
