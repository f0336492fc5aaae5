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
  * post-join dedup is needed — which is also what makes the LEFT variant
  * anti-join-free: the containment predicate rides IN the join condition
  * (not a post-filter), so an unmatched fact surfaces exactly once with
  * nulls instead of needing a second pass. Pick `grainMs` near the typical
  * interval length: finer grains multiply the interval side's rows,
  * coarser grains multiply false candidates per grain — both linear
  * knobs, never quadratic.
  *
  * Timestamps: `tsCol`/`startCol`/`endCol` may each be TimestampType
  * (converted via `unix_millis` — instant semantics, the
  * [[graft.sources.Tables]] contract) or LongType epoch-millis. Epochs
  * must be non-negative and this IS enforced (row-level raise_error):
  * SQL `div` truncates toward zero, so a fact at ts=-1 would map to grain
  * 0 while an interval covering it maps to grain -1 — a silent drop, the
  * opposite of this repo's fail-loud stance.
  *
  * NULL contract (standard SQL join semantics, the [[AsOfJoin]] NULL-doc
  * rule): a NULL fact timestamp matches no interval — the fact drops on
  * "inner" and survives with null interval payload on "left" (exactly how
  * the equivalent theta join treats it); an interval with a NULL start,
  * end, or key column contains nothing and is ignored. NULLs are NOT
  * errors here because they carry the conventional "unknown" meaning the
  * containment predicate already defines — unlike a NEGATIVE epoch, which
  * looks valid, buckets wrong, and only raises because it would otherwise
  * corrupt silently.
  *
  * Output: the fact columns + the interval's non-key columns (non-key
  * column names must be disjoint across the two sides — enforced).
  * `joinType` "inner" (default): facts covered by no interval drop out.
  * "left"/"left_outer": such facts survive with nulls in the interval
  * payload columns. Either way: one row per (fact, covering interval).
  */
object IntervalJoin {

  def join(facts: DataFrame, intervals: DataFrame,
           tsCol: String, startCol: String, endCol: String,
           keyCols: Seq[String] = Seq.empty,
           grainMs: Long = 3600000L,
           maxGrainsPerInterval: Long = 100000L,
           joinType: String = "inner"): DataFrame = {
    require(grainMs > 0, s"grainMs must be positive: $grainMs")
    require(maxGrainsPerInterval > 0,
      s"maxGrainsPerInterval must be positive: $maxGrainsPerInterval")
    val jt = joinType.toLowerCase.replace("_", "") match {
      case "inner" => "inner"
      case "left" | "leftouter" => "left_outer"
      case other => throw new IllegalArgumentException(
        s"IntervalJoin: joinType must be inner or left/left_outer, got '$other'")
    }
    keyCols.foreach { k =>
      require(facts.columns.contains(k) && intervals.columns.contains(k),
        s"IntervalJoin: key column '$k' must exist on both sides")
    }
    val dup = facts.columns.toSet.intersect(intervals.columns.toSet) -- keyCols
    require(dup.isEmpty,
      s"IntervalJoin: non-key columns must be disjoint across the two sides; " +
        s"shared: ${dup.toSeq.sorted.mkString(", ")} — rename or drop first")
    Seq("__t", "__g", "__s", "__e").foreach(c =>
      require(!facts.columns.contains(c) && !intervals.columns.contains(c),
        s"IntervalJoin uses internal column '$c' — rename or drop it first"))
    def ms(df: DataFrame, name: String): Column = df.schema(name).dataType match {
      case TimestampType => unix_millis(col(name))
      case LongType => col(name)
      case t => throw new IllegalArgumentException(
        s"IntervalJoin: '$name' must be TIMESTAMP or LONG epoch-millis, got $t")
    }
    // `div` truncates toward zero: negative epochs would grain-bucket wrong
    // and silently drop matches, so they fail loudly per row instead
    def nonNeg(c: Column, what: String): Column =
      when(c < 0, raise_error(concat(
        lit(s"IntervalJoin: negative epoch-millis in '$what' ("),
        c.cast("string"),
        lit(") - grain bucketing requires non-negative epochs"))).cast("long"))
        .otherwise(c)
    val f = facts
      .withColumn("__t", nonNeg(ms(facts, tsCol), tsCol))
      .withColumn("__g", expr(s"__t div $grainMs"))
    // grain count = lastGrain - firstGrain + 1, so the bound is diff < max
    val lastGrain =
      when(expr(s"(__e - 1) div $grainMs - __s div $grainMs") < maxGrainsPerInterval,
        expr(s"(__e - 1) div $grainMs"))
        .otherwise(raise_error(concat(
          lit(s"IntervalJoin: interval spans more than $maxGrainsPerInterval grains of "),
          lit(s"$grainMs ms (start="), col("__s").cast("string"),
          lit(", end="), col("__e").cast("string"),
          lit(") - raise grainMs or maxGrainsPerInterval"))).cast("long"))
    val iv = intervals
      .withColumn("__s", nonNeg(ms(intervals, startCol), startCol))
      .withColumn("__e", ms(intervals, endCol))
      // an empty/inverted/NULL-bounded interval contains nothing — dropping
      // it here is result-invisible and saves its explode; likewise a
      // NULL-keyed interval can never satisfy the equi-condition, and
      // filtering it BEFORE the explode saves ⌈length/grain⌉ wasted rows
      // per such interval (a month-long NULL-keyed interval at 1h grain is
      // ~720 shuffled rows the join discards)
      .filter(keyCols.foldLeft(col("__e") > col("__s"))(
        (acc, k) => acc && col(s"`${k.replace("`", "``")}`").isNotNull))
      .withColumn("__g", explode(sequence(expr(s"__s div $grainMs"), lastGrain)))
    val fa = f.alias("__fj")
    val ia = iv.alias("__ij")
    // grain + keys are equi-conditions (hash/sort-merge join); containment is
    // the residual condition — inside the join so LEFT keeps unmatched facts
    // user column names are backtick-quoted: a bare dot in `col("__fj.a.b")`
    // parses as a nested-field path and a literal backtick would unbalance
    // the quoting, so escape the latter by doubling (the SQL-identifier rule)
    def q(alias: String, c: String): Column =
      col(s"$alias.`${c.replace("`", "``")}`")
    val cond = ((col("__fj.__g") === col("__ij.__g")) +:
        keyCols.map(k => q("__fj", k) === q("__ij", k))).reduce(_ && _) &&
      col("__fj.__t") >= col("__ij.__s") && col("__fj.__t") < col("__ij.__e")
    val ivPayload = intervals.columns.filterNot(keyCols.contains)
    fa.join(ia, cond, jt)
      .select(facts.columns.map(c => q("__fj", c)).toSeq ++
        ivPayload.map(c => q("__ij", c)): _*)
  }
}
