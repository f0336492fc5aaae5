package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Interval (range) join — enrich each fact row with every interval
  * containing its timestamp (`start <= ts < end`, optionally on equal
  * keys): campaigns active at click time, maintenance windows covering an
  * error, rate plans in force at usage time. The temporal sibling of
  * [[AsOfJoin]] (latest-at-or-before, 1:1) — this is containment, N:M.
  *
  * Scale shape — why this is NOT a theta join: Spark plans a bare
  * `ts BETWEEN start AND end` predicate as BroadcastNestedLoopJoin (or a
  * cartesian product), O(facts × intervals) at any size. Instead every
  * interval EXPLODES to the time grains it covers (narrow, fan-out =
  * ⌈length/grain⌉ — bounded by `maxGrainsPerInterval` with a LOUD codegen
  * raise_error, never a silent mega-row) and every fact maps to its
  * single grain (pure codegen), so candidates come from a hash EQUI-JOIN
  * on (keys…, grain) and the exact containment predicate only filters
  * them. A fact meets an interval in exactly ONE grain (its own), so no
  * post-join dedup is needed. Pick `grainMs` near the typical interval
  * length: finer grains multiply the interval side's rows, coarser grains
  * multiply false candidates per grain — both linear knobs, never
  * quadratic.
  *
  * Timestamps: `tsCol`/`startCol`/`endCol` may each be TimestampType
  * (converted via `unix_millis` — instant semantics, the
  * [[graft.sources.Tables]] contract) or LongType epoch-millis. Epochs
  * must be non-negative (`div` truncation = floor only there).
  *
  * Output: the fact columns + the interval's non-key columns (a USING
  * join on (keyCols…, grain) — other column names must be disjoint, or
  * Spark's ambiguity check fails loudly). Inner semantics: facts covered
  * by no interval drop out; one row per (fact, covering interval).
  */
object IntervalJoin {

  def join(facts: DataFrame, intervals: DataFrame,
           tsCol: String, startCol: String, endCol: String,
           keyCols: Seq[String] = Seq.empty,
           grainMs: Long = 3600000L,
           maxGrainsPerInterval: Long = 100000L): DataFrame = {
    require(grainMs > 0, s"grainMs must be positive: $grainMs")
    require(maxGrainsPerInterval > 0,
      s"maxGrainsPerInterval must be positive: $maxGrainsPerInterval")
    keyCols.foreach { k =>
      require(facts.columns.contains(k) && intervals.columns.contains(k),
        s"IntervalJoin: key column '$k' must exist on both sides")
    }
    Seq("__t", "__g", "__s", "__e").foreach(c =>
      require(!facts.columns.contains(c) && !intervals.columns.contains(c),
        s"IntervalJoin uses internal column '$c' — rename or drop it first"))
    def ms(df: DataFrame, name: String): Column = df.schema(name).dataType match {
      case TimestampType => unix_millis(col(name))
      case LongType => col(name)
      case t => throw new IllegalArgumentException(
        s"IntervalJoin: '$name' must be TIMESTAMP or LONG epoch-millis, got $t")
    }
    val f = facts
      .withColumn("__t", ms(facts, tsCol))
      .withColumn("__g", expr(s"__t div $grainMs"))
    val lastGrain =
      when(expr(s"(__e - 1) div $grainMs - __s div $grainMs") <= maxGrainsPerInterval,
        expr(s"(__e - 1) div $grainMs"))
        .otherwise(raise_error(concat(
          lit(s"IntervalJoin: interval spans more than $maxGrainsPerInterval grains of "),
          lit(s"$grainMs ms (start="), col("__s").cast("string"),
          lit(", end="), col("__e").cast("string"),
          lit(") - raise grainMs or maxGrainsPerInterval"))).cast("long"))
    val iv = intervals
      .withColumn("__s", ms(intervals, startCol))
      .withColumn("__e", ms(intervals, endCol))
      // an empty/inverted interval contains nothing — dropping it here is
      // result-invisible and saves its explode
      .filter(col("__e") > col("__s"))
      .withColumn("__g", explode(sequence(expr(s"__s div $grainMs"), lastGrain)))
    f.join(iv, keyCols :+ "__g")
      .filter(col("__t") >= col("__s") && col("__t") < col("__e"))
      .drop("__t", "__g", "__s", "__e")
  }
}
