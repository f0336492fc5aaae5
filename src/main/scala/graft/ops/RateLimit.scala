package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

/** Per-key token-bucket rate limiting, the batch/replay analog of the
  * reference's `rate_limiter` over `mem_token_bucket_store`
  * (reference: processors/rate_limiter.h:12-87,
  * state_stores/mem_token_bucket_store.h:24-57).
  *
  * Bucket math preserved exactly:
  *  - integer tokens, bucket starts full (`capacity`), timestamp starts 0;
  *  - aging: `delta = floor((ts - tstamp) * capacity / ageTimeMs)`; only when
  *    `delta > 0` does the bucket advance its timestamp and refill
  *    (`tokens = min(capacity, tokens + delta)`) — no aging on zero/negative
  *    deltas;
  *  - consume: reject when `tokens == 0`, else decrement and admit.
  *
  * Scale shape: one shuffle to co-locate each key's events, then a sorted
  * single-pass scan per partition — no per-group buffering, no driver state,
  * so a skewed key degrades to a sequential scan of that key only.
  */
object RateLimit {

  /** Overflow-safe token refill: the naive `elapsed * capacity / ageTimeMs`
    * multiplies BEFORE dividing, so a large capacity against epoch-millis
    * elapsed times (first event: elapsed ≈ 1.7e12 against tstamp 0; the
    * product wraps past capacity ≈ 5.4e6) goes negative — the bucket then
    * never refills and, after the initial `capacity` admissions, rejects
    * every event forever. A full-or-more period clamps to `capacity`
    * exactly (callers min-clamp anyway); a partial period whose product
    * would overflow computes exactly through BigInt on that rare branch
    * only. Shared by the batch replay and the streaming rateLimiter twin.
    */
  private[graft] def refillTokens(elapsed: Long, capacity: Long, ageTimeMs: Long): Long =
    if (elapsed <= 0) 0L
    else if (elapsed >= ageTimeMs) capacity
    else if (capacity > Long.MaxValue / elapsed)
      (BigInt(elapsed) * capacity / ageTimeMs).toLong
    else elapsed * capacity / ageTimeMs

  /** Deterministic CONTENT rendering for retry-stable tiebreaks: arrays
    * render by element content (recursively), Options and Products (tuples,
    * case classes) recurse into their fields, everything else through
    * String.valueOf. A top-level-only Array[Byte] special case is not
    * enough — a value that EMBEDS a byte array (a (topic, payload) tuple, a
    * case class with a payload field) would still render the array via its
    * identity hashCode, different on every micro-batch retry, so the
    * intra-timestamp admit order would silently change across attempts.
    */
  private[graft] def deepRender(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => java.util.Arrays.toString(b)
    case a: Array[_] => a.iterator.map(deepRender).mkString("[", ", ", "]")
    case o: Option[_] => o.map(x => s"Some(${deepRender(x)})").getOrElse("None")
    // collections render ITERATIVELY before the Product case: a scala List
    // is a Product of cons cells, so the Product branch would recurse one
    // frame pair per ELEMENT — StackOverflowError on a long list value;
    // here recursion depth = nesting depth only
    case it: Iterable[_] => it.iterator.map(deepRender).mkString("Iterable(", ",", ")")
    case p: Product => p.productIterator.map(deepRender)
      .mkString(p.productPrefix + "(", ",", ")")
    case other => String.valueOf(other)
  }

  /** Returns `df`'s columns plus a boolean `admitted`, replaying each key's
    * events in `(eventTimeMs, tieBreak)` order through a token bucket.
    *
    * @param eventTimeMsCol name of a LONG column of epoch-millis event time
    * @param tieBreakCols   deterministic intra-timestamp ordering
    */
  def replay(
      df: DataFrame,
      keyCols: Seq[String],
      eventTimeMsCol: String,
      tieBreakCols: Seq[String],
      capacity: Long,
      ageTimeMs: Long): DataFrame = {
    require(capacity > 0 && ageTimeMs > 0)
    val schema = df.schema
    val outSchema = StructType(schema.fields :+ StructField("admitted", BooleanType, nullable = false))
    val keyIdx = keyCols.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(eventTimeMsCol)
    val sortCols = (keyCols ++ Seq(eventTimeMsCol) ++ tieBreakCols).map(col)

    df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions { iter =>
        var curKey: Seq[Any] = null
        var tokens = capacity
        var tstamp = 0L
        iter.map { row =>
          // binary keys compare by VALUE: a raw Array[Byte] inside the Seq
          // compares by reference, making every row look like a new key and
          // silently resetting the bucket per record
          val k: Seq[Any] = keyIdx.map(i => row.get(i) match {
            case b: Array[Byte] => b.toSeq
            case x => x
          })
          if (k != curKey) { curKey = k; tokens = capacity; tstamp = 0L }
          val ts = row.getLong(tsIdx)
          // age (mem_token_bucket_store.h __age)
          val delta = RateLimit.refillTokens(ts - tstamp, capacity, ageTimeMs)
          if (delta > 0) {
            tstamp = ts
            tokens = math.min(capacity, tokens + delta)
          }
          val admitted = tokens > 0
          if (admitted) tokens -= 1
          Row.fromSeq(row.toSeq :+ admitted)
        }
      }(Encoders.row(outSchema))
  }
}
