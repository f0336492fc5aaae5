package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Implementation is a single window rank — one shuffle on the key, no
  * driver-side state, scales to arbitrarily many keys. Ties beyond event
  * time are broken by caller-supplied columns so results stay deterministic
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
    val ordering: Seq[Column] =
      col(eventTimeCol).desc +: tieBreakCols.map(col(_).desc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    tombstoneCol match {
      case Some(c) => ranked.filter(col(c).isNotNull)
      case None    => ranked
    }
  }
}
