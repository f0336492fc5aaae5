package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

/** The DataSource V2 CDC stream against embedded Derby: cursor offsets in
  * the checkpointed offset log, admission-controlled page pacing, and
  * restart-resume picking up only rows inserted after the last commit.
  */
class CdcStreamSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:cdcv2;create=true"

  test("readStream paces by maxItemsPerFetch, sees every row once, resumes from checkpoint") {
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src (ts VARCHAR(10) NOT NULL, id VARCHAR(10) NOT NULL, payload VARCHAR(20))")
    // equal-ts run ('300', ids 3/4/5) exercises the tie-break clause across
    // a page boundary (page size 3 splits it)
    val rows = Seq(("100", "1"), ("200", "2"), ("300", "3"), ("300", "4"), ("300", "5"),
      ("400", "6"), ("500", "7"))
    rows.foreach { case (ts, id) => st.execute(s"INSERT INTO src VALUES ('$ts', '$id', 'p-$ts-$id')") }

    val checkpoint = Files.createTempDirectory("cdcv2-ckpt").toString
    val outDir = Files.createTempDirectory("cdcv2-out").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.format("graft-cdc") // short name via DataSourceRegister
        .option("url", url)
        .option("query", "SELECT * FROM src")
        .option("tsColumn", "ts").option("idColumn", "id")
        .option("maxItemsPerFetch", "3")
        .load()
      val q = stream.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    val got = spark.read.parquet(outDir).orderBy("TS", "ID")
      .collect().map(r => (r.getAs[String]("TS"), r.getAs[String]("ID"), r.getAs[String]("PAYLOAD"))).toSeq
    assert(got == rows.map { case (ts, id) => (ts, id, s"p-$ts-$id") })
    // admission control split the 7-row backlog into ceil(7/3) = 3 batches
    val offsetFiles = new java.io.File(checkpoint, "offsets").list().filterNot(_.contains("."))
    assert(offsetFiles.map(_.toInt).sorted.toSeq == Seq(0, 1, 2))

    // restart: only rows past the committed cursor appear, including the
    // reference's equal-ts late arrival (ts=500 id=8 after cursor (500,7))
    st.execute("INSERT INTO src VALUES ('500', '8', 'late-eq-ts')")
    st.execute("INSERT INTO src VALUES ('600', '9', 'new')")
    runOnce()
    val resumed = spark.read.parquet(outDir).orderBy("TS", "ID")
      .collect().map(r => (r.getAs[String]("TS"), r.getAs[String]("ID"))).toSeq
    assert(resumed == (rows ++ Seq(("500", "8"), ("600", "9"))).sorted)
    conn.close()
  }

  test("AvailableNow on an empty-at-prepare table reports no progress for post-start inserts") {
    import graft.sources.CdcV2
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src_empty (ts VARCHAR(10) NOT NULL, id VARCHAR(10) NOT NULL)")
    // drive the MicroBatchStream contract directly (the query-level test
    // races the async prepare against the insert): prepare on the EMPTY
    // table, insert afterwards, and ask for the next offset — the
    // AvailableNow contract is "process only data available at query
    // start", so the answer must be NO PROGRESS, not the paced offset
    // (which would chase fresh inserts and keep the run-once query alive)
    val conf = CdcV2.Conf(Map("url" -> url, "query" -> "SELECT * FROM src_empty",
      "tsColumn" -> "ts", "idColumn" -> "id", "maxItemsPerFetch" -> "3"))
    val stream = new CdcV2.CdcMicroBatchStream(
      new org.apache.spark.sql.types.StructType(), conf)
    stream.prepareForTriggerAvailableNow()
    st.execute("INSERT INTO src_empty VALUES ('100', '1')")
    val start = stream.initialOffset()
    val next = stream.latestOffset(start,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(3L))
    assert(next == start, s"empty-at-prepare must clamp to no progress, got $next")
    // while a NON-empty prepare still clamps to the prepared tip
    stream.prepareForTriggerAvailableNow()
    st.execute("INSERT INTO src_empty VALUES ('200', '2')")
    val next2 = stream.latestOffset(start,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(3L))
    assert(next2 == CdcV2.CdcOffset("100", "1"),
      s"non-empty prepare must clamp to the prepared tip, got $next2")
    conn.close()
  }

  test("a NULL cursor value fails loudly by column name instead of poisoning the cursor") {
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src_null (ts VARCHAR(10), id VARCHAR(10), payload VARCHAR(20))")
    st.execute("INSERT INTO src_null VALUES ('100', '1', 'ok')")
    st.execute("INSERT INTO src_null VALUES (NULL, '2', 'poison')")
    // poll path (CdcCursor): NULLs sort last in Derby ASC, so the poison
    // row is the page tail — a bare NPE here would re-crash every run
    val props = new java.util.Properties()
    val spec = graft.sources.CdcCursor.Spec("SELECT * FROM src_null",
      Some("ts"), Some("id"), maxItemsPerFetch = 10,
      limitClause = n => s" FETCH FIRST $n ROWS ONLY")
    val e = intercept[IllegalStateException] {
      graft.sources.CdcCursor.poll(spark, url, props, spec,
        graft.sources.CdcCursor.State(None, None, atEof = false))
    }
    assert(e.getMessage.contains("NULL in cursor column 'ts'"), e.getMessage)
    conn.close()
  }
}

/** Offset-comparison semantics used by AvailableNow clamping: numeric when
  * both values parse (matching how the DB compares literals against
  * numeric cursor columns), lexicographic otherwise.
  */
class CdcOffsetOrderSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.sources.CdcV2.{cmpVal, notPast, CdcOffset}

  test("numeric values compare numerically across digit-count boundaries") {
    assert(cmpVal("999", "1000") < 0) // lexicographically "999" > "1000"
    assert(cmpVal("3", "10") < 0)
    assert(cmpVal("1000000000", "999999999") > 0)
    assert(cmpVal("42", "42") == 0)
  }

  test("non-numeric values fall back to string order") {
    assert(cmpVal("a", "b") < 0)
    assert(cmpVal("2026-01-02 10:00:00", "2026-01-02 09:59:59") > 0)
  }

  test("notPast is the end-inclusive range check on (ts, id)") {
    assert(notPast(CdcOffset("300", "3"), CdcOffset("300", "10"))) // numeric id tie-break
    assert(!notPast(CdcOffset("300", "11"), CdcOffset("300", "10")))
    assert(notPast(CdcOffset("999", "1"), CdcOffset("1000", "0")))
    assert(!notPast(CdcOffset("1000", "0"), CdcOffset("999", "1")))
  }
}

/** End-to-end composition: the graft-cdc V2 source feeding the kspp LWW
  * table operator — CDC rows become a keyed changelog whose streaming
  * state resolves each key to its newest version, across paced batches.
  */
class CdcToTableSpec extends SparkSpec {
  test("CDC stream drives a streaming LWW table across micro-batches") {
    val url = "jdbc:derby:memory:cdclww;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src (ts VARCHAR(10) NOT NULL, id VARCHAR(10) NOT NULL, k VARCHAR(10), v VARCHAR(10))")
    // key k1 updated three times (last at ts 500), k2 once
    Seq(("100", "1", "k1", "a"), ("200", "2", "k2", "x"), ("300", "3", "k1", "b"),
      ("500", "4", "k1", "c")).foreach { case (ts, id, k, v) =>
      st.execute(s"INSERT INTO src VALUES ('$ts', '$id', '$k', '$v')")
    }

    import spark.implicits._
    val checkpoint = java.nio.file.Files.createTempDirectory("cdclww-ckpt").toString
    val stream = spark.readStream.format("graft-cdc")
      .option("url", url).option("query", "SELECT * FROM src")
      .option("tsColumn", "ts").option("idColumn", "id")
      .option("maxItemsPerFetch", "2") // forces the changelog across ≥2 batches
      .load()
      .select($"K".as[String], $"V".as[String], $"TS".cast("long").as[Long])
      .map { case (k, v, ts) => graft.model.KRecord[String, String](k, Some(v), ts) }
    val table = graft.streaming.StatefulOps.latestByKey(stream)
    val q = table.toDF().writeStream.format("memory").queryName("cdc_lww")
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    // the final update per key is the LWW winner
    val last = spark.sql(
      "SELECT key, value FROM cdc_lww WHERE eventTime = (SELECT max(eventTime) FROM cdc_lww c2 WHERE c2.key = cdc_lww.key)")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(last == Map("k1" -> "c", "k2" -> "x"))
    conn.close()
  }
}
