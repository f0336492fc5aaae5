package graft

import org.apache.spark.sql.functions._

import graft.model.KRecord
import graft.ops.{Changelog, Joins, RateLimit}

/** Golden semantics ported from the reference's unit tests (cited per test). */
class OperatorSemanticsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  /** The test8_join.cpp:91-112 fixture: two changelogs, all records key 42,
    * null value = tombstone.
    */
  private def fixture = {
    import spark.implicits._
    val left = Seq(
      (42, null.asInstanceOf[String], 1L), (42, "A", 3L), (42, "B", 5L),
      (42, null.asInstanceOf[String], 7L), (42, "C", 9L),
      (42, null.asInstanceOf[String], 12L), (42, "D", 15L)
    ).toDF("key", "value", "event_time")
    val right = Seq(
      (42, null.asInstanceOf[String], 2L), (42, "a", 4L), (42, "b", 6L),
      (42, null.asInstanceOf[String], 8L), (42, "c", 10L),
      (42, null.asInstanceOf[String], 11L), (42, null.asInstanceOf[String], 13L), (42, "d", 14L)
    ).toDF("key", "value", "event_time")
    (left, right)
  }

  test("ktable LWW snapshot honors tombstones (mem_store.h:64-83, test2_mem_store)") {
    import spark.implicits._
    val (left, _) = fixture
    val snap = Changelog.latestByKey(left, Seq("key"), "event_time", Nil, tombstoneCol = Some("value"))
    assert(snap.collect().toSeq == Seq(Row(42, "D", 15L)))

    // delete wins when it is the latest record
    val deleted = left.filter($"event_time" <= 12)
    val snap2 = Changelog.latestByKey(deleted, Seq("key"), "event_time", Nil, tombstoneCol = Some("value"))
    assert(snap2.count() == 0)
  }

  test("LWW skips stale updates: stored strictly newer wins (mem_store.h:75-77)") {
    import spark.implicits._
    // out-of-order arrival: the t=9 "C" must beat the late-arriving t=8 "X"
    val df = Seq((1, "C", 9L), (1, "X", 8L)).toDF("key", "value", "event_time")
    val snap = Changelog.latestByKey(df, Seq("key"), "event_time", Nil, Some("value"))
    assert(snap.collect().toSeq == Seq(Row(1, "C", 9L)))
  }

  test("table-table join snapshots (join.h:212-508, test8_join.cpp final states)") {
    import spark.implicits._
    val (left, right) = fixture
    val lt = Changelog.latestByKey(left, Seq("key"), "event_time", Nil, Some("value"))
      .select($"key".as("lk"), $"value".as("lv"))
    val rt = Changelog.latestByKey(right, Seq("key"), "event_time", Nil, Some("value"))
      .select($"key".as("rk"), $"value".as("rv"))
    val inner = Joins.tableTableInner(lt, rt, $"lk" === $"rk").select("lk", "lv", "rv")
    assert(inner.collect().toSeq == Seq(Row(42, "D", "d")))
    val outer = Joins.tableTableOuter(lt, rt, $"lk" === $"rk").select("lv", "rv")
    assert(outer.collect().toSeq == Seq(Row("D", "d")))
  }

  test("token bucket admit/deny replay (mem_token_bucket_store, test3_mem_token_bucket.cpp)") {
    import spark.implicits._
    // bucket(agetime=100ms, capacity=2); key 2 consumed at t0, t0+10, t0+20, t0+101
    val t0 = 1700000000000L
    val df = Seq(
      (0, t0, 1L), (1, t0, 2L),
      (2, t0, 3L), (2, t0 + 10, 4L), (2, t0 + 20, 5L), (2, t0 + 101, 6L)
    ).toDF("key", "ts_ms", "id")
    val out = RateLimit.replay(df, Seq("key"), "ts_ms", Seq("id"), capacity = 2, ageTimeMs = 100)
      .filter($"key" === 2).orderBy("id").select("admitted").as[Boolean].collect().toSeq
    assert(out == Seq(true, true, false, true))
  }

  test("token bucket replay on BINARY keys: same-key rows share one bucket") {
    import spark.implicits._
    // Kafka keys are bytes; a raw Array[Byte] inside the key Seq compares
    // by reference, so every row would look like a new key and reset the
    // bucket — all four same-key records would be admitted at capacity 1
    val t0 = 1700000000000L
    val df = Seq(
      (Array[Byte](1, 2), t0, 1L), (Array[Byte](1, 2), t0 + 1, 2L),
      (Array[Byte](1, 2), t0 + 2, 3L), (Array[Byte](1, 2), t0 + 3, 4L),
      (Array[Byte](9, 9), t0, 5L)
    ).toDF("key", "ts_ms", "id")
    val out = RateLimit.replay(df, Seq("key"), "ts_ms", Seq("id"),
        capacity = 1, ageTimeMs = 100000)
      .orderBy("id").select("admitted").as[Boolean].collect().toSeq
    assert(out == Seq(true, false, false, false, true),
      s"binary keys must compare by value, not reference: $out")
  }

  test("token bucket refill survives large capacity x epoch-millis elapsed (overflow)") {
    import spark.implicits._
    // naive (ts - tstamp) * capacity overflows Long on the FIRST event
    // (tstamp 0, ts ~1.7e12, capacity 1e7 → product ~1.7e19 wraps
    // negative): the bucket then never refills and after `capacity`
    // admissions rejects everything forever
    val t0 = 1700000000000L
    val cap = 10000000L
    val df = Seq((1, t0, 1L), (1, t0 + 1, 2L), (1, t0 + 86400001L, 3L))
      .toDF("key", "ts_ms", "id")
    val out = RateLimit.replay(df, Seq("key"), "ts_ms", Seq("id"),
        capacity = cap, ageTimeMs = 86400000L)
      .orderBy("id").select("admitted").as[Boolean].collect().toSeq
    assert(out == Seq(true, true, true), s"refill must not overflow: $out")
    // the shared kernel: exact partial refill, exact overflow branch,
    // full-period clamp, and zero/negative elapsed
    assert(RateLimit.refillTokens(50L, 10L, 100L) == 5L)
    assert(RateLimit.refillTokens(100L, 10L, 100L) == 10L)
    assert(RateLimit.refillTokens(200L, 10L, 100L) == 10L, "over-full clamps")
    assert(RateLimit.refillTokens(0L, 10L, 100L) == 0L)
    assert(RateLimit.refillTokens(-5L, 10L, 100L) == 0L)
    // overflow branch computes EXACTLY (not a clamp): elapsed half the
    // period at huge capacity refills half the capacity
    val bigCap = Long.MaxValue / 2
    assert(RateLimit.refillTokens(50L, bigCap, 100L) == bigCap / 2,
      "partial refill through the BigInt branch must stay exact")
  }

  test("kstream joins drop/keep unmatched stream rows (join.h:28-209)") {
    import spark.implicits._
    val stream = Seq((1, "e1"), (2, "e2"), (3, "e3")).toDF("k", "payload")
    val table = Seq((1, "t1"), (3, "t3")).toDF("tk", "tv")
    val inner = Joins.streamTableInner(stream, table, $"k" === $"tk")
    assert(inner.count() == 2)
    val left = Joins.streamTableLeft(stream, table, $"k" === $"tk")
      .select("k", "tv").orderBy("k")
    assert(left.collect().toSeq == Seq(Row(1, "t1"), Row(2, null), Row(3, "t3")))
  }

  test("repartition_by_foreign_key drops unroutable keys (repartition.h:64-73)") {
    import spark.implicits._
    val usernames = (1 to 10).map(i => (i, s"user_$i")).toDF("user_id", "name")
    // the routing table carries an extra payload column the reference's
    // repartition would never forward — the output must be the stream's
    // own record plus the resolved foreign key, nothing else
    val routing = Seq((1, 100, "x"), (2, 100, "y"), (3, 200, "z"))
      .toDF("user_id", "channel_id", "extra")
    val g = api.GStream(usernames)
      .repartitionByForeignKey(new api.GTable(routing, Seq("user_id")),
        usernames("user_id") === routing("user_id"), "channel_id")
    assert(g.df.count() == 3) // users 4..10 have no route
    assert(g.df.columns.toSeq == Seq("user_id", "name", "channel_id"),
      s"routing payload must not leak: ${g.df.columns.toSeq}")
    // whole-record ops downstream see the forwarded record, so the count
    // keys stay the stream's own (+fk), not the routing payload
    assert(g.countByValue().df.columns.count(_ == "extra") == 0)
    // a stream column named like the foreign key is rejected: silently
    // preferring either side would route by a stale value with no error
    val staleFk = usernames.withColumn("channel_id", lit(999))
    val e = intercept[IllegalArgumentException](
      api.GStream(staleFk).repartitionByForeignKey(
        new api.GTable(routing, Seq("user_id")),
        staleFk("user_id") === routing("user_id"), "channel_id"))
    assert(e.getMessage.contains("ROUTING"), e.getMessage)
  }

  test("facade guards: count-column collisions, delay knob/type, table-join disjointness") {
    import spark.implicits._
    val df = Seq((1, "a", 5L)).toDF("k", "cnt", "ts")
    intercept[IllegalArgumentException](
      api.GStream(df).countByKey(Seq("cnt"))) // count name collides with a key
    intercept[IllegalArgumentException](
      api.GStream(df).countByValue()) // 'cnt' already an input column
    assert(api.GStream(df).countByValue("n").df.columns.count(_ == "n") == 1)
    // delay: negative knob and non-time types fail loudly — `+ lit(ms)` on
    // a DATE would add DAYS, on a STRING it would null-coerce
    intercept[IllegalArgumentException](api.GStream(df).delay("ts", -1L))
    intercept[IllegalArgumentException](api.GStream(df).delay("cnt", 100L))
    val dated = df.withColumn("d", to_date(lit("2024-01-01")))
    intercept[IllegalArgumentException](api.GStream(dated).delay("d", 5000L))
    // table-table joins reject shared column names up front instead of an
    // ambiguous-reference AnalysisException far from the join
    val a = new api.GTable(Seq((1, "x")).toDF("k", "v"), Seq("k"))
    val b = new api.GTable(Seq((1, "y")).toDF("k", "w"), Seq("k"))
    val e = intercept[IllegalArgumentException](a.innerJoin(b, col("k") === col("k")))
    assert(e.getMessage.contains("shared: k"), e.getMessage)
    val b2 = new api.GTable(Seq((1, "y")).toDF("k2", "w"), Seq("k2"))
    assert(a.outerJoin(b2, a.df("k") === b2.df("k2")).df.count() == 1)
  }

  test("GStream.delay works on the epoch-millis convention and on timestamps") {
    import spark.implicits._
    // the library's event-time convention is epoch ms (bigint) — an
    // INTERVAL add on that type is a Catalyst DATATYPE_MISMATCH; release
    // must come out as eventTime + delayMs
    val ms = Seq((1L, 1000L), (2L, 2500L)).toDF("id", "event_time")
    val gotMs = api.GStream(ms).delay("event_time", 500L).df
      .orderBy("id").select("release_time").as[Long].collect().toSeq
    assert(gotMs == Seq(1500L, 3000L), s"epoch-ms delay: $gotMs")
    // timestamp columns keep the interval form
    val ts = ms.withColumn("event_time", timestamp_millis(col("event_time")))
    val gotTs = api.GStream(ts).delay("event_time", 500L).df
      .orderBy("id").select(unix_millis(col("release_time"))).as[Long].collect().toSeq
    assert(gotTs == Seq(1500L, 3000L), s"timestamp delay: $gotTs")
  }

  test("sumByKey with no aggregates fails with a named error, not head-of-empty-list") {
    import spark.implicits._
    val df = Seq((1, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](api.GStream(df).sumByKey(Seq("k")))
    assert(e.getMessage.contains("at least one"), e.getMessage)
  }

  test("salted aggregate equals plain aggregate under a hot key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one hot key carrying 90% of rows
    val rows = (1 to 900).map(i => ("hot", i.toLong)) ++ (1 to 100).map(i => (s"k${i % 7}", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = graft.ops.Salt.saltedAggregate(df, Seq("k"), graft.ops.Salt.saltCol(col("v"), 16),
      "cnt" -> (count(lit(1)), sum(col("cnt"))),
      "total" -> (sum(col("v")), sum(col("total"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join under a hot probe key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val big = ((1 to 500).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"k$i", i))).toDF("k", "id")
    val small = (Seq("hot") ++ (1 to 30).map(i => s"k$i")).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = graft.ops.Salt.saltedJoin(big, small, "k", buckets = 8, saltFrom = col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    // left join keeps unmatched big-side rows exactly once
    val plainLeft = big.join(small, Seq("k"), "left").count()
    val saltedLeft = graft.ops.Salt.saltedJoin(big, small, "k", 8, col("id"), "left").count()
    assert(saltedLeft == plainLeft)
    // an input '__salt' would be silently replaced (and maybe read by the
    // salt expression) — fail loudly instead; zero buckets would explode
    // an empty array and silently drop every small-side row
    intercept[IllegalArgumentException] {
      graft.ops.Salt.saltedJoin(big.withColumn("__salt", lit(1)), small, "k", 8, col("id"))
    }
    intercept[IllegalArgumentException] {
      graft.ops.Salt.saltedJoin(big, small, "k", 0, col("id"))
    }
    intercept[IllegalArgumentException] {
      graft.ops.Salt.saltedAggregate(big.withColumn("__salt", lit(1)), Seq("k"),
        graft.ops.Salt.saltCol(col("id"), 8), "cnt" -> (count(lit(1)), sum(col("cnt"))))
    }
  }
}
