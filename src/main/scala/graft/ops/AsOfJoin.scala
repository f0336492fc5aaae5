package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal lookup) join: every left row is matched to the single
  * most recent right row with `rightTs <= leftTs` (or `<` when `strict`)
  * in the same key group — the event-against-slowly-changing-state lookup
  * the reference approximates by materializing a ktable and probing it per
  * stream event (processors/join.h:28-118 probes "state as of now"; this
  * operator probes "state as of the event's own timestamp", which the
  * reference cannot express without replaying inputs in lock-step).
  *
  * Scale shape — the reason this is NOT a range join: both inputs are
  * unioned and hash-partitioned by key ONCE, then sorted within partitions
  * by (ts, side); a running `last(right_payload, ignoreNulls)` window
  * carries each right row forward to the left rows that follow it. Cost is
  * one shuffle of |L| + |R| rows and an in-partition sort — no
  * BroadcastNestedLoopJoin, no per-key k_L × k_R candidate blow-up, and no
  * theta-join fallback, at any key skew. (A Catalyst range join would
  * expand to an inequality join; Spark plans those as nested loops.)
  *
  * Determinism: among right rows with equal (key, ts) the one greatest by
  * `rightTieBreak` wins; pass a unique column (or pre-aggregate the right
  * side) to make results reproducible across retries and engines.
  *
  * NULL timestamps follow standard as-of (and DuckDB ASOF) semantics, where
  * a NULL never satisfies the inequality: right rows with a null `rightTs`
  * are dropped before the union (they can match nothing), and left rows
  * with a null `leftTs` are emitted unmatched (ascending NULLS FIRST sorts
  * them before every right row, so no payload has been carried forward yet).
  */
object AsOfJoin {

  /** @param keyCols        equi-join key, present on both sides by name
    * @param leftTsCol      left event-time column
    * @param rightTsCol     right event-time column (same type as left's)
    * @param rightValueCols right columns carried onto matched left rows
    *                       (must not collide with left column names);
    *                       unmatched left rows get nulls
    * @param rightTieBreak  deterministic winner among right ts ties
    * @param strict         true ⇒ match `rightTs < leftTs` (exclusive)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTsCol: String, rightTsCol: String, rightValueCols: Seq[String],
           rightTieBreak: Seq[String] = Nil, strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightValueCols.forall(c => !leftCols.contains(c)),
      s"asOf: right value columns ${rightValueCols.filter(leftCols.contains)} collide with left")
    // __-prefixed names are this operator's internal working columns
    // (__ts/__side/__r/__m/__tb_*); a user column with that prefix would
    // collide ambiguously or be silently misread
    val reserved = (leftCols ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asOf: column names starting with '__' are reserved: ${reserved.mkString(", ")}")
    require(left.schema(leftTsCol).dataType == right.schema(rightTsCol).dataType,
      s"asOf: ts type mismatch ${left.schema(leftTsCol).dataType} vs ${right.schema(rightTsCol).dataType}")
    // a misspelled key would otherwise surface as an opaque
    // AnalysisException against the internal __-columns plan (the
    // IntervalJoin per-key require)
    keyCols.foreach { k =>
      require(leftCols.contains(k) && right.columns.contains(k),
        s"asOf: key column '$k' must exist on both sides")
      // keys are as load-bearing as the ts columns: unionByName would
      // silently WIDEN mismatched key types (LONG + DOUBLE → DOUBLE, where
      // adjacent longs above 2^53 collapse to one value) and distinct keys
      // would then share a window partition — payloads attached to the
      // wrong rows with no error
      require(left.schema(k).dataType == right.schema(k).dataType,
        s"asOf: key '$k' type mismatch ${left.schema(k).dataType} vs " +
          s"${right.schema(k).dataType} — cast one side explicitly first")
    }

    // inclusive: a right row at the left row's exact ts is visible ⇒ sort
    // right (0) before left (1) at equal ts; strict flips the side order
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)

    // user column names are backtick-quoted everywhere they meet col():
    // a bare dot would parse as a nested-field path (and could silently
    // resolve to a struct field) — the IntervalJoin q() rule
    def q(c: String): org.apache.spark.sql.Column =
      col(s"`${c.replace("`", "``")}`")

    val payload = struct(rightValueCols.map(q): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val tieNull = rightTieBreak.map(c =>
      lit(null).cast(right.schema(c).dataType).as(s"__tb_$c"))
    val tieVals = rightTieBreak.map(c => q(c).as(s"__tb_$c"))

    // keys ride along inside leftCols on the left; the right side aliases
    // its key columns to the left's names and nulls the rest of leftCols
    val l = left.select(
      Seq(q(leftTsCol).as("__ts"), lit(leftSide).as("__side"),
        lit(null).cast(payloadType).as("__r")) ++
        tieNull ++ leftCols.map(q): _*)
    // null rightTs can never satisfy `rightTs <= leftTs`, and a null KEY
    // never equi-joins (NULL = NULL is not true) — but the window
    // PARTITION BY groups nulls together, so unfiltered null-keyed right
    // rows would silently carry their payload onto null-keyed left rows.
    // Drop both before the union; null-keyed left rows then sit in a
    // partition with no right rows and come out unmatched, as ASOF demands
    val r = right.filter(keyCols.foldLeft(q(rightTsCol).isNotNull)(
      (acc, c) => acc && q(c).isNotNull)).select(
      Seq(q(rightTsCol).as("__ts"), lit(rightSide).as("__side"),
        payload.as("__r")) ++
        tieVals ++
        leftCols.map(c =>
          if (keyCols.contains(c)) q(c)
          else lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val order = col("__ts").asc +: col("__side").asc +:
      rightTieBreak.map(c => col(s"__tb_$c").asc)
    val w = Window.partitionBy(keyCols.map(q): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)
      .select(leftCols.map(q) ++
        rightValueCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Convenience overload joining on a single key column. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTsCol: String, rightTsCol: String,
           rightValueCols: Seq[String]): DataFrame =
    asOf(left, right, Seq(keyCol), leftTsCol, rightTsCol, rightValueCols)
}
