package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — the gaps-and-islands assignment every behavioral
  * training corpus (clickstreams, agent trajectories, dialogue turns) needs
  * before per-session packing. The reference's only time grouping is the
  * fixed tumbling slot of mem_windowed_store.h:260-262; variable-gap
  * sessions are an extension, expressed Spark-first.
  *
  * Scale shape: one hash-partition shuffle on the key and an in-partition
  * sort — `lag` marks session starts, a running sum numbers them. No
  * self-join, no per-key collect, no state beyond the window frame; skewed
  * keys cost one task their sort, never a cross product. The streaming
  * analog is Structured Streaming's built-in `session_window` aggregation
  * (watermark-evicted state), covered by the spec.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key, in time order): a new session
    * starts when the gap since the key's previous event exceeds `gapMs`.
    * `tieBreakCols` orders equal-ts events deterministically.
    */
  def assign(df: DataFrame, keyCols: Seq[String], tsCol: String,
             gapMs: Long, tieBreakCols: Seq[String] = Nil): DataFrame = {
    // withColumn would silently REPLACE an input 'session_idx' and the
    // closing select would re-emit the replaced values as payload — fail
    // loudly (the reserved-column stance)
    require(!df.columns.contains("session_idx"),
      "sessionize writes column 'session_idx' — rename the input column first")
    // a negative gap makes every event a singleton session — nonsense
    // output from an invalid argument (the IntervalJoin grainMs rule);
    // gapMs = 0 is legal: split on any strictly positive gap
    require(gapMs >= 0, s"sessionize: gapMs must be >= 0, got $gapMs")
    // the ts column must be TIMESTAMP or LONG epoch-millis (the
    // IntervalJoin contract). An implicit-cast type like STRING would be
    // worse than an error: unix_millis(cast(string)) yields NULL on any
    // malformed value under non-ANSI SQL, the NULL gap falls to
    // otherwise(0), and the corrupt event silently GLUES onto the prior
    // session — bypassing the NULL raise below — while the ordering would
    // compare lexicographically ('9:00' after '10:00').
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val msOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      df.schema(tsCol).dataType match {
        case TimestampType => unix_millis(_)
        case LongType => identity
        case t => throw new IllegalArgumentException(
          s"sessionize: '$tsCol' must be TIMESTAMP or LONG epoch-millis, got $t")
      }
    // user column names are backtick-quoted (the IntervalJoin q() rule)
    def q(c: String): org.apache.spark.sql.Column =
      col(s"`${c.replace("`", "``")}`")
    // a NULL timestamp would silently start its own session (nulls sort
    // first, lag() hands the next row a NULL prev, isNew fires) — k null
    // events inflate the count by k singleton sessions with NULL bounds.
    // Raise per row, naming the key (the tokenCountOrRaise stance).
    val ts = when(q(tsCol).isNull, raise_error(concat(
      lit(s"sessionize: NULL $tsCol at ${keyCols.mkString(",")}="),
      concat_ws(",", keyCols.map(q(_).cast("string")): _*)))
      .cast(df.schema(tsCol).dataType))
      .otherwise(q(tsCol))
    val order = ts.asc +: tieBreakCols.map(q(_).asc)
    val w = Window.partitionBy(keyCols.map(q): _*).orderBy(order: _*)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull ||
      msOf(ts) - msOf(prev) > gapMs, 1).otherwise(0)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count and start/end timestamps. Builds on
    * [[assign]]; the rollup reuses the same key partitioning, so at scale
    * the aggregation is map-side-combined within already-shuffled data.
    */
  def sessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
               gapMs: Long, tieBreakCols: Seq[String] = Nil): DataFrame = {
    // a key column named like a rollup stat would emit duplicate column
    // names through the closing agg (the Profile.bySlice stance)
    Seq("n_events", "session_start", "session_end").foreach(c =>
      require(!keyCols.contains(c),
        s"sessions writes stat column '$c' — rename the key column first"))
    def q(c: String): org.apache.spark.sql.Column =
      col(s"`${c.replace("`", "``")}`")
    assign(df, keyCols, tsCol, gapMs, tieBreakCols)
      .groupBy(keyCols.map(q) :+ col("session_idx"): _*)
      .agg(count(lit(1)).as("n_events"),
        min(q(tsCol)).as("session_start"),
        max(q(tsCol)).as("session_end"))
  }
}
