package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** The reference's five join operators (reference: processors/join.h:28-508),
  * re-expressed as declarative Spark joins so Catalyst is free to choose
  * broadcast-hash vs shuffle-hash vs sort-merge.
  *
  * All reference joins are equi-joins on the record key over co-partitioned
  * inputs; Spark's shuffle supplies the co-partitioning. For stream×table
  * joins the table side is typically a dimension snapshot orders of magnitude
  * smaller than the stream — `broadcastTable = true` (the default) pins a
  * broadcast-hash join so the 100 TB stream side never shuffles, INCLUDING
  * when the snapshot sits above Catalyst's conservative size estimate for
  * aggregated subtrees (a ktable is a groupBy output, whose stats would
  * often miss the auto-broadcast threshold and silently shuffle the
  * stream). The contract is the reference's own: the table side is
  * per-partition state assumed to fit in memory. A FACT-sized table fails
  * loudly ("Cannot broadcast a table larger than 8GB") — pass
  * `broadcastTable = false` there and Catalyst plans a shuffle join.
  */
object Joins {

  private def maybeBroadcast(table: DataFrame, bcast: Boolean): DataFrame =
    if (bcast) broadcast(table) else table

  /** kstream_left_join (join.h:28-118): stream event probes the table
    * snapshot; absent right ⇒ nulls.
    */
  def streamTableLeft(stream: DataFrame, table: DataFrame, on: Column,
                      broadcastTable: Boolean = true): DataFrame =
    stream.join(maybeBroadcast(table, broadcastTable), on, "left_outer")

  /** kstream_inner_join (join.h:120-209): emit only when the table has a
    * live (non-tombstoned) row for the key.
    */
  def streamTableInner(stream: DataFrame, table: DataFrame, on: Column,
                       broadcastTable: Boolean = true): DataFrame =
    stream.join(maybeBroadcast(table, broadcastTable), on, "inner")

  /** ktable_left_join (join.h:212-311): snapshot×snapshot, left drives. */
  def tableTableLeft(left: DataFrame, right: DataFrame, on: Column): DataFrame =
    left.join(right, on, "left_outer")

  /** ktable_inner_join (join.h:314-406). */
  def tableTableInner(left: DataFrame, right: DataFrame, on: Column): DataFrame =
    left.join(right, on, "inner")

  /** ktable_outer_join (join.h:408-508). */
  def tableTableOuter(left: DataFrame, right: DataFrame, on: Column): DataFrame =
    left.join(right, on, "full_outer")
}
