package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.{Sessionize, Sketches, TextAnalysis}
import graft.ops.AsOfJoin

/** Semantics of the temporal/sketch extension operators: as-of join,
  * sessionization, the KMV distinct sketch, and PII redaction.
  */
class TemporalOpsSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  // ---------------------------------------------------------------- as-of

  private def asOfFixture = {
    import spark.implicits._
    val left = Seq(
      (1L, "u", ts(1000)), // before any right row
      (2L, "u", ts(2000)), // exactly at a right row (inclusive match)
      (3L, "u", ts(3500)), // between right rows
      (4L, "u", ts(9000)), // after the last right row
      (5L, "v", ts(5000))  // key with no right rows at all
    ).toDF("event_id", "key", "t")
    val right = Seq(
      ("u", ts(2000), 20L),
      ("u", ts(4000), 40L)
    ).toDF("key", "rt", "rv")
    (left, right)
  }

  test("asOf matches each left row to the latest right row with rt <= lt") {
    val (left, right) = asOfFixture
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"))
      .select("event_id", "rv").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(1L -> None, 2L -> Some(20L), 3L -> Some(20L),
      4L -> Some(40L), 5L -> None))
  }

  test("asOf strict excludes the equal-timestamp right row") {
    val (left, right) = asOfFixture
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"),
        strict = true)
      .select("event_id", "rv").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(2L) === None) // rt == lt no longer visible
    assert(out(3L) === Some(20L) && out(4L) === Some(40L))
  }

  test("asOf resolves right-side timestamp ties by the tie-break column") {
    import spark.implicits._
    val left = Seq((1L, "u", ts(5000))).toDF("event_id", "key", "t")
    val right = Seq(("u", ts(2000), 1L, "lo"), ("u", ts(2000), 9L, "hi"))
      .toDF("key", "rt", "seq", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"),
      rightTieBreak = Seq("seq"))
    assert(out.select("rv").as[String].collect().toSeq === Seq("hi"))
  }

  test("asOf rejects colliding right value column names") {
    val (left, right) = asOfFixture
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right.withColumnRenamed("rv", "event_id"),
        Seq("key"), "t", "rt", Seq("event_id"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asOf never matches null timestamps: null rt rows drop, null lt rows stay unmatched") {
    import spark.implicits._
    val left = Seq(
      (1L, "u", Some(ts(5000))),
      (2L, "u", None) // null left ts: kept, but matches nothing
    ).toDF("event_id", "key", "t")
    val right = Seq(
      ("u", Some(ts(2000)), 20L),
      ("u", Option.empty[Timestamp], 99L) // null right ts: can match nothing
    ).toDF("key", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"))
      .select("event_id", "rv").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // without the null-rt filter, rv=99 would sort NULLS FIRST and be
    // carried forward onto BOTH left rows
    assert(out === Map(1L -> Some(20L), 2L -> None))
  }

  test("asOf never matches null keys: NULL = NULL is not an equi-join hit") {
    import spark.implicits._
    // the window PARTITION BY groups nulls together, so without the
    // null-key right filter the null-keyed left row would silently pick
    // up rv=42 — DuckDB ASOF (and every SQL equi-join) leaves it unmatched
    val left = Seq(
      (1L, Option("u"), ts(5000)),
      (2L, Option.empty[String], ts(5000))
    ).toDF("event_id", "key", "t")
    val right = Seq(
      (Option("u"), ts(2000), 20L),
      (Option.empty[String], ts(2000), 42L)
    ).toDF("key", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"))
      .select("event_id", "rv").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(1L -> Some(20L), 2L -> None),
      s"null-keyed left rows must stay unmatched: $out")
  }

  test("asOf rejects missing keys and key-type mismatches (unionByName widening hazard)") {
    import spark.implicits._
    val (left, right) = asOfFixture
    val e1 = intercept[IllegalArgumentException](
      AsOfJoin.asOf(left, right, Seq("keyy"), "t", "rt", Seq("rv")))
    assert(e1.getMessage.contains("key column 'keyy'"), e1.getMessage)
    // a LONG/DOUBLE key mismatch would silently widen through unionByName
    // and collapse adjacent longs above 2^53 into one window partition
    val leftLong = Seq((1L, 7L, ts(1000))).toDF("event_id", "key", "t")
    val rightDouble = Seq((7.0, ts(500), 5L)).toDF("key", "rt", "rv")
    val e2 = intercept[IllegalArgumentException](
      AsOfJoin.asOf(leftLong, rightDouble, Seq("key"), "t", "rt", Seq("rv")))
    assert(e2.getMessage.contains("type mismatch"), e2.getMessage)
  }

  test("asOf and sessionize quote user column names (dots are not field paths)") {
    import spark.implicits._
    // a flat column literally named "a.b" is legal; bare col("a.b") would
    // parse it as a nested-field path and fail (or silently resolve into
    // a struct field) — the IntervalJoin q() rule, now shared
    val left = Seq((1L, "u", ts(2000))).toDF("event.id", "the.key", "t.s")
    val right = Seq(("u", ts(1000), 10L)).toDF("the.key", "r.t", "r.v")
    val out = AsOfJoin.asOf(left, right, Seq("the.key"), "t.s", "r.t", Seq("r.v"))
      .select(col("`event.id`"), col("`r.v`")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
    val sess = Sessionize.sessions(
      Seq(("u", ts(0)), ("u", ts(100)), ("u", ts(5000))).toDF("k.ey", "t.s"),
      Seq("k.ey"), "t.s", gapMs = 1000L)
      .select("n_events").collect().map(_.getLong(0)).sorted
    assert(sess.toSeq == Seq(1L, 2L))
  }

  test("sessionize validates the ts type and gap, and accepts LONG epoch-millis") {
    import spark.implicits._
    // a STRING ts would implicit-cast: malformed values become NULL gaps
    // that silently glue events onto the previous session, and ordering
    // would be lexicographic — reject the type instead
    val str = Seq(("u", "2024-01-01 00:00:00")).toDF("k", "t")
    val e1 = intercept[IllegalArgumentException](
      Sessionize.assign(str, Seq("k"), "t", 1000L))
    assert(e1.getMessage.contains("TIMESTAMP or LONG"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Sessionize.assign(Seq(("u", ts(0))).toDF("k", "t"), Seq("k"), "t", -1L))
    assert(e2.getMessage.contains("gapMs"), e2.getMessage)
    // LONG epoch-millis sessions identically to the timestamp form
    val longTs = Seq(("u", 0L), ("u", 100L), ("u", 5000L)).toDF("k", "t")
    val idx = Sessionize.assign(longTs, Seq("k"), "t", 1000L)
      .select("t", "session_idx").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx == Map(0L -> 1L, 100L -> 1L, 5000L -> 2L))
  }

  test("asOf rejects reserved __-prefixed input columns") {
    val (left, right) = asOfFixture
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left.withColumn("__ts", col("t")), right,
        Seq("key"), "t", "rt", Seq("rv"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("asOf plans as union + window — one shuffle, no join operator") {
    val (left, right) = asOfFixture
    val p = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    // exactly one exchange: the hash partitioning by key that feeds the
    // window — a range-join rewrite would add more (or a nested loop)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  // --------------------------------------------------------------- sessions

  private def sessionFixture = {
    import spark.implicits._
    Seq(
      (1L, "u", ts(0L)),
      (2L, "u", ts(60000L)),    // 1 min gap — same session
      (3L, "u", ts(2000000L)),  // 32+ min gap — new session
      (4L, "u", ts(2060000L)),
      (5L, "w", ts(500L))       // other key: own numbering
    ).toDF("event_id", "key", "t")
  }

  test("sessionize assigns 1-based per-key session indices on gap > gapMs") {
    val out = Sessionize.assign(sessionFixture, Seq("key"), "t",
        gapMs = 30 * 60 * 1000L, tieBreakCols = Seq("event_id"))
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize rejects inputs whose columns collide with its outputs") {
    // withColumn would silently replace an input 'session_idx'; a key
    // named like a rollup stat would emit duplicate output columns
    intercept[IllegalArgumentException] {
      Sessionize.assign(sessionFixture.withColumn("session_idx",
        org.apache.spark.sql.functions.lit(9L)), Seq("key"), "t", gapMs = 1000L)
    }
    intercept[IllegalArgumentException] {
      Sessionize.sessions(sessionFixture.withColumnRenamed("key", "n_events"),
        Seq("n_events"), "t", gapMs = 1000L)
    }
  }

  test("sessions rollup aggregates count and bounds per session") {
    val out = Sessionize.sessions(sessionFixture, Seq("key"), "t",
        gapMs = 30 * 60 * 1000L, tieBreakCols = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(out(("u", 1L)) === ((2L, ts(0L), ts(60000L))))
    assert(out(("u", 2L)) === ((2L, ts(2000000L), ts(2060000L))))
    assert(out(("w", 1L)) === ((1L, ts(500L), ts(500L))))
  }

  test("batch sessions agree with Structured Streaming session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 40).map { i =>
      // three bursts per user separated by > gap
      val burst = i % 3
      val user = "u" + (i % 2)
      (user, ts(burst * 10000000L + (i / 3) * 1000L))
    }
    val gap = 60 * 60 * 1000L // 1h

    val batch = Sessionize.sessions(rows.toDF("key", "t"), Seq("key"), "t", gap)
      .select("key", "session_start", "session_end")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Timestamp)]
    in.addData(rows)
    val q = in.toDS().toDF("key", "t")
      .withWatermark("t", "0 seconds")
      .groupBy(session_window(col("t"), s"$gap milliseconds"), col("key"))
      .agg(min("t").as("session_start"), max("t").as("session_end"))
      .select("key", "session_start", "session_end")
      .writeStream.format("memory").queryName("sess_sw").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streaming = spark.table("sess_sw")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(streaming === batch)
  }

  // -------------------------------------------------------------------- kmv

  test("kmv sketch is exact below k and estimates above k") {
    import spark.implicits._
    // 10 distinct values, k=64 ⇒ exact
    val small = (0 until 100).map(i => ("g", i % 10)).toDF("g", "v")
    val exact = Sketches.distinctSketch(small, Seq("g"), "v", k = 64)
      .select("n_kept", "est_distinct").head()
    assert(exact.getLong(0) === 10L && exact.getDouble(1) === 10.0)

    // 5000 distinct values, k=64 ⇒ estimate within 25%
    val big = (0 until 5000).map(i => ("g", i)).toDF("g", "v")
    val est = Sketches.distinctSketch(big, Seq("g"), "v", k = 64)
      .select("est_distinct").head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est")
  }

  test("sketch knob and id guards: k bounds fail loudly, NULL ids raise instead of biasing") {
    import spark.implicits._
    val df = Seq(("g", 1, 1L), ("g", 2, 2L)).toDF("g", "v", "id")
    // k = 1 degenerates the saturated estimator to (k-1)·2^60/kth = 0.0
    // for every non-empty group — plainly wrong with no error
    val e = intercept[IllegalArgumentException](
      Sketches.distinctSketch(df, Seq("g"), "v", k = 1))
    assert(e.getMessage.contains("k >= 2"), e.getMessage)
    intercept[IllegalArgumentException](
      Sketches.quantileSketch(df, Seq("g"), "v", "id", k = 0))
    // a NULL id silently VANISHED from the quantile sample (concat is
    // null-intolerant; the row still counted in n_docs) — biased
    // quantiles; the shared hash60 raises per row instead
    val withNull = Seq(("g", 1.0, Some(1L)), ("g", 2.0, None))
      .toDF("g", "v", "id")
    val err = intercept[Exception](
      Sketches.quantileSketch(withNull, Seq("g"), "v", "id").collect())
    assert(err.getMessage.contains("NULL id"), err.getMessage)
  }

  test("kmv sketch is invariant to partitioning (partial merge is sound)") {
    import spark.implicits._
    val df = (0 until 3000).map(i => ("g" + (i % 3), i % 997)).toDF("g", "v")
    def run(parts: Int) =
      Sketches.distinctSketch(df.repartition(parts), Seq("g"), "v", k = 32)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    assert(run(1) === run(13))
  }

  test("kmv sketch ignores nulls and guards the all-null group") {
    import spark.implicits._
    val df = Seq(("g", Some(1)), ("g", None), ("h", None))
      .toDF("g", "v")
    val out = Sketches.distinctSketch(df, Seq("g"), "v", k = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.isNullAt(2), r.getDouble(3))).toMap
    assert(out("g") === ((1L, false, 1.0)))
    assert(out("h") === ((0L, true, 0.0)))
  }

  test("quantile sketch is exact below k and rank-approximate above k") {
    import spark.implicits._
    // 9 values, k=128 ⇒ the sample IS the data; quantiles are exact ranks
    val small = (1 to 9).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val exact = Sketches.quantileSketch(small, Seq("g"), "v", "id", k = 128)
      .select("n_sample", "p25", "p50", "p75", "p90").head()
    // n=9: rank(q) = floor(q*8)+1 ⇒ p25→3rd=3.0, p50→5th=5.0, p75→7th=7.0, p90→8th=8.0
    assert(exact.getLong(0) === 9L)
    assert((exact.getDouble(1), exact.getDouble(2), exact.getDouble(3), exact.getDouble(4))
      === ((3.0, 5.0, 7.0, 8.0)))

    // 10k uniform values, k=128 ⇒ estimates within ~3/sqrt(128) rank error
    val big = (0 until 10000).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val est = Sketches.quantileSketch(big, Seq("g"), "v", "id", k = 128)
      .select("p50").head().getDouble(0)
    assert(math.abs(est / 10000.0 - 0.5) < 0.27, s"p50 estimate $est")
  }

  test("quantile sketch is invariant to partitioning (partial merge is sound)") {
    import spark.implicits._
    val df = (0 until 3000).map(i => ("g" + (i % 3), i.toLong, (i % 997).toDouble))
      .toDF("g", "id", "v")
    def run(parts: Int) =
      Sketches.quantileSketch(df.repartition(parts), Seq("g"), "v", "id", k = 32)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(run(1) === run(13))
  }

  test("quantile sketch skips null values and guards the all-null group") {
    import spark.implicits._
    val df = Seq(("g", 1L, Some(5.0)), ("g", 2L, None), ("h", 3L, None))
      .toDF("g", "id", "v")
    val out = Sketches.quantileSketch(df, Seq("g"), "v", "id", k = 8,
        quantiles = Seq(0.5))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out("g") === ((1L, Some(5.0))))
    assert(out("h") === ((0L, None)))
  }

  test("kmv and quantile sketches run on streams: complete-mode result equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the sketches are plain Catalyst aggregates, so continuous corpus
    // profiling is the SAME operator inside a streaming groupBy — no
    // separate code path to trust
    val rows = (0 until 500).map(i => ("g" + (i % 2), i.toLong, (i % 97).toDouble))
    val batchKmv = Sketches.distinctSketch(rows.toDF("g", "id", "v"), Seq("g"), "v", k = 16)
      .collect().map(_.toString).sorted.toSeq
    val batchQ = Sketches.quantileSketch(rows.toDF("g", "id", "v"), Seq("g"), "v", "id", k = 16)
      .collect().map(_.toString).sorted.toSeq

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    in.addData(rows.take(200))
    val q1 = Sketches.distinctSketch(in.toDF().toDF("g", "id", "v"), Seq("g"), "v", k = 16)
      .writeStream.format("memory").queryName("kmv_stream").outputMode("complete").start()
    val q2 = Sketches.quantileSketch(in.toDF().toDF("g", "id", "v"), Seq("g"), "v", "id", k = 16)
      .writeStream.format("memory").queryName("q_stream").outputMode("complete").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      in.addData(rows.drop(200)) // second micro-batch merges into sketch state
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.table("kmv_stream").collect().map(_.toString).sorted.toSeq === batchKmv)
      assert(spark.table("q_stream").collect().map(_.toString).sorted.toSeq === batchQ)
    } finally { q1.stop(); q2.stop() }
  }

  // -------------------------------------------------------------------- pii

  test("redactPii masks emails, phones, and IPv4s; leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      "mail a.b+c@sub.example.org now",
      "call +1 (415) 555-0100 today",
      "host 10.0.255.7 down",
      "all clean here",
      "multi bob@x.io and +44-20-7946-0958 at 192.168.0.1"
    ).toDF("text")
    val out = TextAnalysis.redactPii(df, "text").select("redacted")
      .as[String].collect().toSeq
    assert(out === Seq(
      "mail <EMAIL> now",
      "call <PHONE> today",
      "host <IP> down",
      "all clean here",
      "multi <EMAIL> and <PHONE> at <IP>"))
  }

  test("redactPii keeps an IP adjacent to a phone as its own class (IPs mask first)") {
    import spark.implicits._
    // with phone-before-IP ordering the greedy phone pattern swallowed the
    // digits/dots run: "+1-555-0100 192.0.2.7" became one <PHONE> tag
    val out = TextAnalysis.redactPii(Seq("+1-555-0100 192.0.2.7").toDF("text"), "text")
      .select("redacted").as[String].head()
    assert(out === "<PHONE> <IP>")
  }

  test("redactPii masks a dotted phone whole: the word-bounded IP pattern cannot fire inside it") {
    import spark.implicits._
    // without the \b bounds the IP pattern matched "1.555.123.456" inside
    // the number, leaking "+<IP>7" — partial digits under the wrong class
    val out = TextAnalysis.redactPii(Seq("call +1.555.123.4567 now").toDF("text"), "text")
      .select("redacted").as[String].head()
    assert(out === "call <PHONE> now")
  }

  test("redactPii propagates null text") {
    import spark.implicits._
    val df = Seq(Some("ok"), None).toDF("text")
    val out = TextAnalysis.redactPii(df, "text").select("redacted")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(out.toSet === Set(Some("ok"), None))
  }

  test("sketches reject group columns colliding with written columns and dup quantiles") {
    import spark.implicits._
    // a group column named like an output (or the internal list) column
    // would yield ambiguous/duplicate output columns — fail loudly instead
    val qdf = Seq(("g", 1L, 1.0)).toDF("qs", "id", "v")
    intercept[IllegalArgumentException] {
      Sketches.quantileSketch(qdf, Seq("qs"), "v", "id")
    }
    val pdf = Seq(("g", 1L, 1.0)).toDF("p50", "id", "v")
    intercept[IllegalArgumentException] {
      Sketches.quantileSketch(pdf, Seq("p50"), "v", "id")
    }
    intercept[IllegalArgumentException] { // duplicate quantile ⇒ duplicate p25
      Sketches.quantileSketch(Seq(("g", 1L, 1.0)).toDF("g", "id", "v"),
        Seq("g"), "v", "id", quantiles = Seq(0.25, 0.25))
    }
    val kdf = Seq(("g", 1)).toDF("n_kept", "v")
    intercept[IllegalArgumentException] {
      Sketches.distinctSketch(kdf, Seq("n_kept"), "v")
    }
  }

  // --------------------------------------------------------- interval join

  test("intervalJoin: inclusive start, exclusive end, multi-match, keys, grain-invariant") {
    import spark.implicits._
    val facts = Seq(
      (1L, "a", 1000L),  // inside iv1 only
      (2L, "a", 5000L),  // = iv1.end (exclusive: out) and = iv2.start (in)
      (3L, "a", 7000L),  // inside iv2 AND iv3 (overlap: two rows)
      (4L, "a", 20000L), // covered by nothing
      (5L, "b", 1000L),  // right time, wrong key
      (6L, "a", 0L)      // = iv1.start (inclusive: in)
    ).toDF("fact_id", "k", "t")
    val ivs = Seq(
      (10L, "a", 0L, 5000L),
      (11L, "a", 5000L, 9000L),
      (12L, "a", 6000L, 8000L),
      (13L, "a", 9000L, 9000L),  // empty: matches nothing
      (14L, "a", 9000L, 8000L),  // inverted: matches nothing
      (15L, "b", 30000L, 31000L) // key b, elsewhere in time
    ).toDF("iv_id", "k", "s", "e")
    val expected = Set((1L, 10L), (2L, 11L), (3L, 11L), (3L, 12L), (6L, 10L))
    for (grain <- Seq(1000L, 2500L, 7000L, 100000L)) {
      val got = graft.ops.IntervalJoin.join(facts, ivs, "t", "s", "e",
          keyCols = Seq("k"), grainMs = grain)
        .select("fact_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"grain $grain")
    }
  }

  test("intervalJoin left: uncovered facts survive with nulls, same grain-invariance sweep") {
    import spark.implicits._
    val facts = Seq(
      (1L, "a", 1000L),  // inside iv1 only
      (2L, "a", 5000L),  // = iv1.end (exclusive) and = iv2.start (in)
      (3L, "a", 7000L),  // inside iv2 AND iv3: two matched rows, no null row
      (4L, "a", 20000L), // covered by nothing -> survives with null iv_id
      (5L, "b", 1000L),  // right time, wrong key -> null iv_id
      (6L, "a", 0L)      // = iv1.start (inclusive)
    ).toDF("fact_id", "k", "t")
    val ivs = Seq(
      (10L, "a", 0L, 5000L),
      (11L, "a", 5000L, 9000L),
      (12L, "a", 6000L, 8000L),
      (13L, "a", 9000L, 9000L),  // empty: matches nothing
      (15L, "b", 30000L, 31000L) // key b, elsewhere in time
    ).toDF("iv_id", "k", "s", "e")
    val expected = Set(
      (1L, Some(10L)), (2L, Some(11L)), (3L, Some(11L)), (3L, Some(12L)),
      (6L, Some(10L)), (4L, None), (5L, None))
    for (grain <- Seq(1000L, 2500L, 7000L, 100000L);
         jt <- Seq("left", "left_outer", "LEFT_OUTER")) {
      val got = graft.ops.IntervalJoin.join(facts, ivs, "t", "s", "e",
          keyCols = Seq("k"), grainMs = grain, joinType = jt)
        .select("fact_id", "iv_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == expected, s"grain $grain joinType $jt")
    }
    intercept[IllegalArgumentException] {
      graft.ops.IntervalJoin.join(facts, ivs, "t", "s", "e", joinType = "full")
    }
  }

  test("intervalJoin handles column names containing dots and backticks") {
    import spark.implicits._
    // a bare col("__fj.a.b") would mis-parse "a.b" as a nested-field path;
    // the join quotes every user column, so dotted/backticked names keep
    // working (keys, payload, and the output projection)
    val facts = Seq((1L, "a", 1000L), (2L, "a", 9999L))
      .toDF("fact.id", "the`key", "t")
    val ivs = Seq((10L, "a", 0L, 5000L)).toDF("iv.id", "the`key", "s", "e")
    val got = graft.ops.IntervalJoin.join(facts, ivs, "t", "s", "e",
        keyCols = Seq("the`key"), grainMs = 1000L, joinType = "left")
      .select(col("`fact.id`"), col("`iv.id`")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got == Set((1L, Some(10L)), (2L, None)))
  }

  test("intervalJoin fails loudly on negative epochs instead of silently dropping") {
    import spark.implicits._
    val ivs = Seq((10L, 0L, 5000L)).toDF("iv_id", "s", "e")
    // a fact at ts=-1 would grain-bucket to 0 (div truncates toward zero)
    // while an interval covering it sits in grain -1 — must raise, not drop
    val negFact = intercept[Exception] {
      graft.ops.IntervalJoin.join(
        Seq((1L, -1L)).toDF("fact_id", "t"), ivs, "t", "s", "e",
        grainMs = 1000L).count()
    }
    assert(negFact.getMessage != null &&
      negFact.getMessage.contains("negative epoch"), negFact.getMessage)
    val negIv = intercept[Exception] {
      graft.ops.IntervalJoin.join(
        Seq((1L, 5L)).toDF("fact_id", "t"),
        Seq((10L, -100L, 5000L)).toDF("iv_id", "s", "e"), "t", "s", "e",
        grainMs = 1000L).count()
    }
    assert(negIv.getMessage != null &&
      negIv.getMessage.contains("negative epoch"), negIv.getMessage)
  }

  test("intervalJoin grain guard bounds the COUNT: exactly max grains passes, max+1 raises") {
    import spark.implicits._
    val facts = Seq((1L, 5L)).toDF("fact_id", "t")
    // [0, 5000) at 1000 ms grain covers grains 0..4 = exactly 5
    val atMax = graft.ops.IntervalJoin.join(facts,
        Seq((10L, 0L, 5000L)).toDF("iv_id", "s", "e"), "t", "s", "e",
        grainMs = 1000L, maxGrainsPerInterval = 5L)
      .select("fact_id", "iv_id").collect()
    assert(atMax.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
    // [0, 5001) covers grains 0..5 = 6 > 5 — must raise
    val over = intercept[Exception] {
      graft.ops.IntervalJoin.join(facts,
        Seq((10L, 0L, 5001L)).toDF("iv_id", "s", "e"), "t", "s", "e",
        grainMs = 1000L, maxGrainsPerInterval = 5L).count()
    }
    assert(over.getMessage != null && over.getMessage.contains("IntervalJoin"),
      over.getMessage)
  }

  test("intervalJoin rejects shared non-key columns loudly") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      graft.ops.IntervalJoin.join(
        Seq((1L, "x", 5L)).toDF("fact_id", "name", "t"),
        Seq((10L, "y", 0L, 5000L)).toDF("iv_id", "name", "s", "e"),
        "t", "s", "e", grainMs = 1000L)
    }
    assert(e.getMessage.contains("disjoint"), e.getMessage)
  }

  test("intervalJoin equals the sequential containment model on random workloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val facts = (0 until 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(100000).toLong))
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(100000).toLong
      (100L + i, s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(20000).toLong - 2000L)
    }
    val expected = (for {
      (fid, fk, t) <- facts
      (vid, vk, s, e) <- ivs
      if fk == vk && t >= s && t < e
    } yield (fid, vid)).toSet
    assert(expected.nonEmpty)
    val got = graft.ops.IntervalJoin.join(
        facts.toDF("fact_id", "k", "t"), ivs.toDF("iv_id", "k", "s", "e"),
        "t", "s", "e", keyCols = Seq("k"), grainMs = 3000L)
      .select("fact_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("intervalJoin runs stream-static: a fact stream joins static intervals statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ivs = Seq((10L, 0L, 5000L), (11L, 5000L, 9000L), (12L, 6000L, 8000L))
      .toDF("iv_id", "s", "e")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = graft.ops.IntervalJoin.join(
        input.toDF().toDF("fact_id", "t"), ivs, "t", "s", "e", grainMs = 2500L)
      .select("fact_id", "iv_id")
      .writeStream.format("memory").queryName("iv_hits").outputMode("append").start()
    try {
      input.addData(1L -> 1000L, 2L -> 5000L)
      q.processAllAvailable()
      input.addData(3L -> 7000L, 4L -> 20000L) // second batch: no state carried
      q.processAllAvailable()
      val got = spark.table("iv_hits").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 11L), (3L, 11L), (3L, 12L)))
      assert(q.recentProgress.forall(_.stateOperators.isEmpty),
        "stream-static interval join must be stateless")
    } finally q.stop()
  }

  test("intervalJoin accepts timestamps, rejects other types, and bounds the grain fan-out") {
    import spark.implicits._
    val facts = Seq((1L, ts(5000))).toDF("fact_id", "t")
    val ivs = Seq((10L, ts(0), ts(10000))).toDF("iv_id", "s", "e")
    val out = graft.ops.IntervalJoin.join(facts, ivs, "t", "s", "e", grainMs = 1000L)
      .select("fact_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L)))
    intercept[IllegalArgumentException] {
      graft.ops.IntervalJoin.join(
        Seq((1L, "not a time")).toDF("fact_id", "t"), ivs, "t", "s", "e")
    }
    // a 10^9-ms interval at 1 ms grain would explode to 10^9 rows — loud
    val huge = Seq((10L, 0L, 1000000000L)).toDF("iv_id", "s", "e")
    val e = intercept[Exception] {
      graft.ops.IntervalJoin.join(Seq((1L, 5L)).toDF("fact_id", "t"), huge,
        "t", "s", "e", grainMs = 1L, maxGrainsPerInterval = 1000L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("IntervalJoin"), e.getMessage)
  }

  test("intervalJoin NULL contract: null fact ts drops/survives by join type, null intervals are ignored pre-explode") {
    import spark.implicits._
    val facts = Seq((1L, Some(500L)), (2L, None))
      .toDF("fact_id", "t")
    val ivs = Seq(
      (10L, Some("a"), Some(0L), Some(1000L)), // genuine cover of fact 1... key "a"
      (11L, None, Some(0L), Some(1000L)),      // NULL key: contains nothing
      (12L, Some("a"), None, Some(1000L)),     // NULL start: ignored
      (13L, Some("a"), Some(0L), None))        // NULL end: ignored
      .toDF("iv_id", "k", "s", "e")
    val factsK = facts.withColumn("k", lit("a"))
    val inner = graft.ops.IntervalJoin.join(factsK, ivs, "t", "s", "e",
      keyCols = Seq("k"), grainMs = 100L)
      .select("fact_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // fact 2 (NULL ts) drops on inner; only the genuine interval matches
    assert(inner.toSeq == Seq((1L, 10L)), inner.toSeq.toString)
    val left = graft.ops.IntervalJoin.join(factsK, ivs, "t", "s", "e",
      keyCols = Seq("k"), grainMs = 100L, joinType = "left")
      .select("fact_id", "iv_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // fact 2 survives the LEFT variant with a null payload
    assert(left.toSet == Set((1L, Some(10L)), (2L, None)), left.toSeq.toString)
  }
}
