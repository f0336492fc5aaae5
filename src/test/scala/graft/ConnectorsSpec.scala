package graft

import java.util.Properties

import org.apache.avro.SchemaBuilder
import org.apache.avro.generic.GenericRecordBuilder

import graft.serde.ConfluentAvro
import graft.sinks.JdbcUpsert
import graft.sources.CdcCursor

/** Connector-layer tests: CDC cursor WHERE-clause generation + a real JDBC
  * pagination round-trip (embedded Derby), the JDBC upsert planner's
  * reference semantics, and the Confluent avro framing.
  */
class ConnectorsSpec extends SparkSpec {

  // ------------------------------------------------------------- CDC cursor

  private val spec = CdcCursor.Spec("SELECT * FROM t", Some("ts"), Some("id"))

  test("cursor WHERE clauses match postgres_read_cursor.cpp:77-95") {
    // fresh start: no predicate, just the total order
    assert(spec.whereClause(CdcCursor.State(None, None, atEof = false)) ==
      " ORDER BY ts ASC, id ASC")
    // both columns: equal-ts tie-break on id, strictly-newer ts
    assert(spec.whereClause(CdcCursor.State(Some("100"), Some("7"), atEof = false)) ==
      " WHERE (ts = '100' AND id > '7') OR (ts > '100') ORDER BY ts ASC, id ASC")
    // ts only: >= (same-ts rows may still be arriving)
    val tsOnly = spec.copy(idColumn = None)
    assert(tsOnly.whereClause(CdcCursor.State(Some("100"), None, atEof = false)) ==
      " WHERE ts >= '100' ORDER BY ts ASC")
    // id only: strict >
    val idOnly = spec.copy(tsColumn = None)
    assert(idOnly.whereClause(CdcCursor.State(None, Some("7"), atEof = false)) ==
      " WHERE id > '7' ORDER BY id ASC")
    // rescrape at eof rewinds the ts window (connection_params.h:31-41)
    val rescrape = spec.copy(rescrape = CdcCursor.RescrapeLastQueryTs(10))
    assert(rescrape.whereClause(CdcCursor.State(Some("100"), Some("7"), atEof = true)) ==
      " WHERE ts >= '90' ORDER BY ts ASC, id ASC")
    // not at eof: rescrape policy dormant, normal cursor predicate
    assert(rescrape.whereClause(CdcCursor.State(Some("100"), Some("7"), atEof = false)) ==
      " WHERE (ts = '100' AND id > '7') OR (ts > '100') ORDER BY ts ASC, id ASC")
    // rescrape against a non-numeric ts column names the misconfiguration
    // instead of a bare NumberFormatException at the first eof poll
    val e = intercept[IllegalArgumentException](rescrape.whereClause(
      CdcCursor.State(Some("2026-08-15 10:30:00.0"), Some("7"), atEof = true)))
    assert(e.getMessage.contains("numeric ts column"), e.getMessage)
  }

  test("pollSql wraps the base query and bounds the page") {
    val sql = spec.copy(maxItemsPerFetch = 3).pollSql(CdcCursor.State(None, None, atEof = false))
    assert(sql == "SELECT * FROM (SELECT * FROM t) graft_src ORDER BY ts ASC, id ASC LIMIT 3")
  }

  test("JDBC pagination sees every row exactly once, including equal-ts runs (Derby)") {
    val url = "jdbc:derby:memory:cdctest;create=true"
    val props = new Properties()
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE src (ts VARCHAR(10) NOT NULL, id VARCHAR(10) NOT NULL, payload VARCHAR(20))")
      // duplicate ts values across page boundaries: the tie-break must carry
      // the cursor through an equal-ts run without skipping or repeating
      val rows = Seq(
        ("100", "1"), ("100", "2"), ("100", "3"), ("100", "4"),
        ("200", "1"), ("200", "2"), ("300", "1"), ("300", "2"), ("300", "3"), ("400", "1"))
      rows.foreach { case (ts, id) =>
        st.execute(s"INSERT INTO src VALUES ('$ts', '$id', 'p-$ts-$id')")
      }
      st.close()

      // Derby has no LIMIT; FETCH FIRST is the standard spelling
      val derbySpec = CdcCursor.Spec("SELECT * FROM src", Some("ts"), Some("id"),
        maxItemsPerFetch = 3, limitClause = n => s" FETCH FIRST $n ROWS ONLY")
      val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var state = CdcCursor.State(None, None, atEof = false)
      var pages = 0
      while (!state.atEof && pages < 20) {
        val (df, next) = CdcCursor.poll(spark, url, props, derbySpec, state)
        seen ++= df.collect().map(r => (r.getString(0), r.getString(1)))
        state = next
        pages += 1
      }
      assert(seen.toList == rows.toList, s"pagination mismatch: $seen")
      assert(pages >= 4) // 10 rows / 3 per page

      // a row appended after eof is picked up by the next poll
      val st2 = conn.createStatement()
      st2.execute("INSERT INTO src VALUES ('400', '2', 'late')")
      st2.close()
      val (df2, _) = CdcCursor.poll(spark, url, props, derbySpec, state.copy(atEof = false))
      assert(df2.collect().map(r => (r.getString(0), r.getString(1))).toList == List(("400", "2")))
    } finally conn.close()
  }

  test("drain + FileOffsetStore resumes pagination across restarts (offset_storage_provider)") {
    val url = "jdbc:derby:memory:cdcoffsets;create=true"
    val props = new Properties()
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE src2 (ts VARCHAR(10) NOT NULL, id VARCHAR(10) NOT NULL)")
      (1 to 7).foreach(i => st.execute(s"INSERT INTO src2 VALUES ('${100 + i}', '$i')"))
      st.close()
      val derbySpec = CdcCursor.Spec("SELECT * FROM src2", Some("ts"), Some("id"),
        maxItemsPerFetch = 3, limitClause = n => s" FETCH FIRST $n ROWS ONLY")
      val offsets = java.nio.file.Files.createTempDirectory("graft_off").toFile.getAbsolutePath + "/cursor"
      val store = new CdcCursor.FileOffsetStore(spark, offsets)
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      // first drain: everything currently in the table
      val n1 = CdcCursor.drain(spark, url, props, derbySpec, store) { df =>
        seen ++= df.collect().map(_.getString(1))
      }
      assert(n1 == 7 && seen.toList == (1 to 7).map(_.toString).toList)
      // "restart": a fresh store instance resumes from the committed cursor —
      // new rows only, nothing replayed
      val st2 = conn.createStatement()
      st2.execute("INSERT INTO src2 VALUES ('200', '8')")
      st2.close()
      val store2 = new CdcCursor.FileOffsetStore(spark, offsets)
      val seen2 = scala.collection.mutable.ArrayBuffer.empty[String]
      val n2 = CdcCursor.drain(spark, url, props, derbySpec, store2) { df =>
        seen2 ++= df.collect().map(_.getString(1))
      }
      assert(n2 == 1 && seen2.toList == List("8"), s"resume saw $seen2")
    } finally conn.close()
  }

  // ----------------------------------------------------------- JDBC upsert

  private val cols = Seq("k", "v")

  test("planStatements splits when a key repeats in one INSERT (postgres_producer.cpp:210-232)") {
    val rows = Seq(
      (Seq[Any]("a", 1), false), (Seq[Any]("b", 1), false), (Seq[Any]("a", 2), false))
    val stmts = JdbcUpsert.planStatements("t", cols, Seq("k"), rows)
    assert(stmts.size == 2)
    assert(stmts.head.contains("('a', 1)") && stmts.head.contains("('b', 1)"))
    assert(stmts(1).contains("('a', 2)"))
  }

  test("NULL key values are rejected loudly on both upsert and delete paths") {
    // `k = NULL` never matches (the DELETE silently no-ops) and conflict
    // targets treat NULLs as distinct (every retry INSERTS a duplicate) —
    // either way the idempotent-retry argument breaks, so a NULL key must
    // fail the batch, the MqttSink/ElasticsearchSink stance
    val e = intercept[IllegalArgumentException](JdbcUpsert.planStatements(
      "t", cols, Seq("k"), Seq((Seq[Any](null, 1), false))))
    assert(e.getMessage.contains("NULL key column 'k'"), e.getMessage)
    intercept[IllegalArgumentException](JdbcUpsert.planStatements(
      "t", cols, Seq("k"), Seq((Seq[Any](null, null), true))))
    // non-key nulls stay legal (tombstone marker, nullable values)
    assert(JdbcUpsert.planStatements("t", cols, Seq("k"),
      Seq((Seq[Any]("a", null), true))).nonEmpty)
    // and the prepared-statement path shares the guard
    intercept[IllegalArgumentException](
      JdbcUpsert.requireKeyNonNull(Seq("a", null), Seq("k1", "k2")))
    JdbcUpsert.requireKeyNonNull(Seq("a", 1), Seq("k1", "k2"))
  }

  test("planStatements preserves upsert/delete order per key") {
    val rows = Seq(
      (Seq[Any]("a", 1), false), (Seq[Any]("a", null), true), (Seq[Any]("a", 3), false))
    val stmts = JdbcUpsert.planStatements("t", cols, Seq("k"), rows)
    assert(stmts.size == 3)
    assert(stmts(0).startsWith("INSERT") && stmts(1).startsWith("DELETE") && stmts(2).startsWith("INSERT"))
  }

  test("planStatements batches consecutive deletes together and honors maxBatch") {
    val deletes = (1 to 5).map(i => (Seq[Any](s"k$i", null), true))
    val stmts = JdbcUpsert.planStatements("t", cols, Seq("k"), deletes, maxBatch = 2)
    assert(stmts.size == 3) // 2 + 2 + 1
    assert(stmts.forall(_.startsWith("DELETE")))
    val ups = (1 to 5).map(i => (Seq[Any](s"k$i", i), false))
    val ustmts = JdbcUpsert.planStatements("t", cols, Seq("k"), ups, maxBatch = 2)
    assert(ustmts.size == 3 && ustmts.forall(_.startsWith("INSERT")))
  }

  test("prepared statement SQL binds every column and key") {
    assert(JdbcUpsert.preparedUpsertSql("t", cols, Seq("k")) ==
      "INSERT INTO t (k, v) VALUES (?, ?) ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v")
    assert(JdbcUpsert.preparedDeleteSql("t", Seq("k", "k2")) ==
      "DELETE FROM t WHERE k = ? AND k2 = ?")
    // key-only table: nothing to update on conflict
    assert(JdbcUpsert.preparedUpsertSql("t", Seq("k"), Seq("k")) ==
      "INSERT INTO t (k) VALUES (?) ON CONFLICT (k) DO NOTHING")
  }

  // -------------------------------------------------------- Confluent avro

  test("Confluent framing round-trips records incl. nulls (avro_serdes.h:80-104)") {
    val schema = SchemaBuilder.record("Ev").fields()
      .requiredLong("id")
      .optionalString("name")
      .endRecord()
    val registry = new ConfluentAvro.InMemorySchemaRegistry
    val schemaId = registry.register("ev-value", schema)

    val rec = new GenericRecordBuilder(schema).set("id", 42L).set("name", "x").build()
    val bytes = ConfluentAvro.encode(rec, schemaId)
    assert(bytes(0) == 0x00.toByte) // magic
    assert(ConfluentAvro.deframe(bytes).schemaId == schemaId)
    val back = ConfluentAvro.decode(bytes, registry)
    assert(back.get("id") == 42L && back.get("name").toString == "x")

    val withNull = new GenericRecordBuilder(schema).set("id", 7L).build()
    val back2 = ConfluentAvro.decode(ConfluentAvro.encode(withNull, schemaId), registry)
    assert(back2.get("id") == 7L && back2.get("name") == null)

    // registry ids are content-addressed: same schema+subject → same id
    assert(registry.register("ev-value", schema) == schemaId)
    // frames shorter than magic+id are rejected
    intercept[IllegalArgumentException] { ConfluentAvro.deframe(Array[Byte](0, 1, 2)) }
    // wrong magic byte is rejected
    intercept[IllegalArgumentException] { ConfluentAvro.deframe(Array[Byte](1, 0, 0, 0, 1, 9)) }
  }

  test("decodeToJsonUdf surfaces framed avro as JSON for from_json") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val schema = SchemaBuilder.record("Kv").fields().requiredLong("n").endRecord()
    val registry = new ConfluentAvro.InMemorySchemaRegistry
    val id = registry.register("kv", schema)
    val payloads = (1L to 3L).map { n =>
      ConfluentAvro.encode(new GenericRecordBuilder(schema).set("n", n).build(), id)
    }
    val df = payloads.toDF("raw")
    val dec = ConfluentAvro.decodeToJsonUdf(registry)
    val out = df.select(from_json(dec(col("raw")), lit("n LONG")).getField("n").as[Long])
      .collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L))
  }
}

/** The HTTP schema registry client against a loopback server speaking the
  * Confluent subjects API, including multi-URL first-success failover.
  */
class HttpRegistrySpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.serde.ConfluentAvro

  test("register/get round-trip with failover past a dead base url") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}""")
    val stored = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val nextId = new java.util.concurrent.atomic.AtomicInteger(41)
    val server = com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val path = ex.getRequestURI.getPath
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val resp: String =
        if (path.startsWith("/subjects/") && path.endsWith("/versions")) {
          assert(ex.getRequestHeaders.getFirst("Content-Type")
            == "application/vnd.schemaregistry.v1+json")
          val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes, "UTF-8"))
          val id = nextId.incrementAndGet()
          stored.put(id, body.get("schema").asText())
          s"""{"id":$id}"""
        } else if (path.startsWith("/schemas/ids/")) {
          val id = path.substring("/schemas/ids/".length).toInt
          mapper.createObjectNode().put("schema", stored.get(id)).toString
        } else sys.error(s"unexpected path $path")
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      // first base url refuses connections → the client must fail over
      val registry = new ConfluentAvro.HttpSchemaRegistry(Seq(
        "http://127.0.0.1:1/", s"http://127.0.0.1:${server.getAddress.getPort}"))
      val id = registry.register("events-value", schema)
      assert(id == 42)
      assert(registry.register("events-value", schema) == 42) // cached, no re-POST
      assert(registry.get(id).getField("x").schema().getType
        == org.apache.avro.Schema.Type.LONG)
      // full wire round-trip through the fetched schema
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("x", 7L)
      val decoded = ConfluentAvro.decode(ConfluentAvro.encode(rec, id), registry)
      assert(decoded.get("x") == 7L)
    } finally server.stop(0)
  }
}

/** Reference URI utilities transcribed: tests/test7_cluster_uri.cpp and
  * tests/test7_url_vector.cpp assertion sequences.
  */
class ClusterUriSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.connect.ClusterUri

  test("cluster uri: scheme lowered, multi-host authority, path") {
    val u = ClusterUri.parse("Zk://127.0.0.1:2181,192.168.100.44:2181/nisseGul")
    assert(u.good && u.scheme == "zk")
    assert(u.authority == "127.0.0.1:2181,192.168.100.44:2181")
    assert(u.path == "/nisseGul")
    assert(u.str == "zk://127.0.0.1:2181,192.168.100.44:2181/nisseGul")

    val noPath = ClusterUri.parse("Zk://127.0.0.1:2181,192.168.100.44:2181")
    assert(noPath.good && noPath.path == "" &&
      noPath.str == "zk://127.0.0.1:2181,192.168.100.44:2181")
  }

  test("cluster uri: ipv6 authorities, whitespace stripped") {
    val u = ClusterUri.parse(
      "https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321, [::1]:5555 ,[0:0:0:0:0:0:0:1]:1432")
    assert(u.good && u.scheme == "https" && u.path == "")
    assert(u.authority == "[2001:db8:85a3:0:0:8a2e:370:7334]:4321,[::1]:5555,[0:0:0:0:0:0:0:1]:1432")
    assert(u.str == "https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321,[::1]:5555,[0:0:0:0:0:0:0:1]:1432")
  }

  test("url list: full urls split on commas, default scheme applied") {
    val v = ClusterUri.splitUrlList(
      "Https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh, https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh")
    assert(v.size == 2)
    v.foreach { url =>
      assert(url.good && url.scheme == "https")
      assert(url.authority == "[2001:db8:85a3:0:0:8a2e:370:7334]:4321")
      assert(url.path == "/hfadsjkh")
      assert(url.str == "https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh")
    }
    val withDefault = ClusterUri.splitUrlList(
      "Https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh, [2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh",
      defaultScheme = "https")
    assert(withDefault.size == 2)
    withDefault.foreach(url => assert(url.good && url.scheme == "https" &&
      url.str == "https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh"))
  }
}

/** The reference's offset_storage_provider surface
  * (utils/offset_storage_provider.h + features/aws/s3_offset_storage
  * _provider.h): fs/null/s3 backends, URI factory, buffered commit gating,
  * and the CDC cursor-store swap.
  */
class OffsetStorageSpec extends SparkSpec {

  /** Loopback single-object "S3": stores PUT bodies by path, honors GET with
    * an optional `Range: bytes=a-b`, 404s missing objects, and records the
    * Authorization header of every request.
    */
  private def withS3Server(f: (Int, java.util.concurrent.ConcurrentHashMap[String, Array[Byte]],
                               java.util.List[String]) => Unit): Unit = {
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val auths = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val server = com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      auths.add(ex.getRequestHeaders.getFirst("Authorization"))
      val path = ex.getRequestURI.getPath
      ex.getRequestMethod match {
        case "PUT" =>
          objects.put(path, ex.getRequestBody.readAllBytes())
          ex.sendResponseHeaders(200, -1)
        case "GET" =>
          Option(objects.get(path)) match {
            case None => ex.getRequestBody.readAllBytes(); ex.sendResponseHeaders(404, -1)
            case Some(full) =>
              val body = Option(ex.getRequestHeaders.getFirst("Range")) match {
                case Some(r) if r.startsWith("bytes=") =>
                  val Array(a, b) = r.stripPrefix("bytes=").split("-", 2).map(_.toInt)
                  full.slice(a, (b + 1).min(full.length))
                case _ => full
              }
              ex.sendResponseHeaders(200, body.length)
              ex.getResponseBody.write(body)
          }
        case _ => ex.sendResponseHeaders(405, -1)
      }
      ex.close()
    })
    server.start()
    try f(server.getAddress.getPort, objects, auths) finally server.stop(0)
  }

  test("fs offset storage: LE binary file, STORED/BEGINNING/fixed starts, buffered commits") {
    import graft.connect.OffsetStorage
    val dir = java.nio.file.Files.createTempDirectory("graft_os")
    val path = dir.resolve("nested/topic.offset") // parent dir auto-created
    val s = new OffsetStorage.FsStore(path)
    // nothing stored yet
    assert(s.start(OffsetStorage.OffsetStored) == OffsetStorage.OffsetBeginning)
    // fixed/BEGINNING/END override storage (offset_storage_provider.cpp:16-28)
    assert(s.start(OffsetStorage.OffsetBeginning) == OffsetStorage.OffsetBeginning)
    assert(s.start(OffsetStorage.OffsetEnd) == OffsetStorage.OffsetEnd)
    assert(s.start(42L) == 42L)
    // buffered commit gating (offset_storage.h:20-27): a flush establishes
    // the watermark; afterwards only flush or > maxPendingOffsets persists
    def stored(): Long = OffsetStorage.fromBytes(java.nio.file.Files.readAllBytes(path))
    s.setMaxPendingOffsets(10)
    s.commit(100L, flush = true)
    assert(stored() == 100L)
    s.commit(105L, flush = false) // 5 pending ≤ 10: buffered only
    assert(stored() == 100L)
    s.commit(120L, flush = false) // 20 pending > 10: persisted
    assert(stored() == 120L)
    // close persists pending (the reference destructors flush)
    s.commit(125L, flush = false)
    s.close()
    assert(stored() == 125L)
    // the file is 8 little-endian bytes — byte-compatible with the
    // reference's native x86 write((char*)&offset, 8)
    assert(java.nio.file.Files.readAllBytes(path).toSeq ==
      Seq[Byte](125, 0, 0, 0, 0, 0, 0, 0))
    // a fresh store resumes; successful load marks the offset flushed
    val s2 = new OffsetStorage.FsStore(path)
    assert(s2.start(OffsetStorage.OffsetStored) == 125L)
    s2.commit(125L, flush = true) // no-op: nothing newer than flushed
    assert(stored() == 125L)
    // atomic persist: the write goes through temp+ATOMIC_MOVE, so no .tmp
    // residue is left and the 8-byte file is never truncated in place (a
    // crash mid-write must not rewind the stream to OffsetBeginning)
    assert(!java.nio.file.Files.exists(path.resolveSibling("topic.offset.tmp")),
      "temp file must be renamed away")
  }

  test("null offset storage starts at END and persists nothing") {
    import graft.connect.OffsetStorage
    val s = new OffsetStorage.NullStore
    assert(s.start(OffsetStorage.OffsetStored) == OffsetStorage.OffsetEnd)
    s.commit(7L, flush = true)
    s.close() // nothing to observe — just must not throw
  }

  test("s3 offset storage: ranged GET + PUT with SigV4 auth against a loopback object server") {
    import graft.connect.OffsetStorage
    withS3Server { (port, objects, auths) =>
      def client() = new OffsetStorage.S3ObjectClient(s"http://127.0.0.1:$port",
        "bkt", "topic.offset", "AKID", "SECRET")
      val s = new OffsetStorage.S3Store(client())
      // missing object → BEGINNING (s3_offset_storage_provider.cpp:93-107)
      assert(s.start(OffsetStorage.OffsetStored) == OffsetStorage.OffsetBeginning)
      s.commit(4242L, flush = true)
      assert(objects.containsKey("/bkt/topic.offset"))
      assert(OffsetStorage.fromBytes(objects.get("/bkt/topic.offset")) == 4242L)
      // restart on a fresh store+client resumes from the stored object
      val s2 = new OffsetStorage.S3Store(client())
      assert(s2.start(OffsetStorage.OffsetStored) == 4242L)
      // every request carried a SigV4 Authorization with the s3 scope
      assert(auths.size() >= 3)
      auths.forEach { a =>
        assert(a != null && a.startsWith("AWS4-HMAC-SHA256 Credential=AKID/"), a)
        assert(a.contains("/us-east-1/s3/aws4_request"), a)
        assert(a.contains("x-amz-content-sha256"), a)
      }
    }
  }

  test("offset provider factory dispatches on scheme like get_offset_provider") {
    import graft.connect.OffsetStorage
    assert(OffsetStorage.provider("").isInstanceOf[OffsetStorage.NullStore])
    assert(OffsetStorage.provider("null:").isInstanceOf[OffsetStorage.NullStore])
    val dir = java.nio.file.Files.createTempDirectory("graft_osp")
    assert(OffsetStorage.provider(s"file://$dir/x.offset").isInstanceOf[OffsetStorage.FsStore])
    // kafka: is a documented exclusion — the error must say so, not read as
    // an unrecognized-scheme bug
    val kafkaErr = intercept[RuntimeException](OffsetStorage.provider("kafka://broker/topic"))
    assert(kafkaErr.getMessage.contains("deliberately"), kafkaErr.getMessage)
    assert(kafkaErr.getMessage.contains("file:"), kafkaErr.getMessage)
    intercept[RuntimeException](
      OffsetStorage.provider("s3://127.0.0.1/bkt/key", env = _ => None)) // creds required
    // IPv4 host → TLS off (s3_offset_storage_provider.cpp:56-64): proven by
    // a working end-to-end roundtrip against the plain-HTTP loopback server
    withS3Server { (port, objects, _) =>
      val env = Map("S3_ACCESS_KEY_ID" -> "AKID", "S3_SECRET_ACCESS_KEY" -> "SECRET")
      val viaUri = OffsetStorage.provider(s"s3://127.0.0.1:$port/bkt/from-uri", env.get)
      viaUri.commit(7L, flush = true)
      assert(OffsetStorage.fromBytes(objects.get("/bkt/from-uri")) == 7L)
    }
  }

  test("drain swaps cursor stores: S3CursorStore resumes exactly like FileOffsetStore") {
    val url = "jdbc:derby:memory:cdcs3;create=true"
    val props = new Properties()
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE src3 (ts VARCHAR(10) NOT NULL, id VARCHAR(10) NOT NULL)")
      (1 to 5).foreach(i => st.execute(s"INSERT INTO src3 VALUES ('${100 + i}', '$i')"))
      st.close()
      val derbySpec = CdcCursor.Spec("SELECT * FROM src3", Some("ts"), Some("id"),
        maxItemsPerFetch = 2, limitClause = n => s" FETCH FIRST $n ROWS ONLY")
      withS3Server { (port, objects, _) =>
        def store() = new CdcCursor.S3CursorStore(
          new graft.connect.OffsetStorage.S3ObjectClient(s"http://127.0.0.1:$port",
            "bkt", "cdc.cursor", "AKID", "SECRET"))
        val seen = scala.collection.mutable.ArrayBuffer.empty[String]
        val n1 = CdcCursor.drain(spark, url, props, derbySpec, store()) { df =>
          seen ++= df.collect().map(_.getString(1))
        }
        assert(n1 == 5 && seen.toList == (1 to 5).map(_.toString).toList)
        assert(objects.containsKey("/bkt/cdc.cursor"))
        // restart against the same bucket: only the appended row arrives
        val st2 = conn.createStatement()
        st2.execute("INSERT INTO src3 VALUES ('200', '6')")
        st2.close()
        val seen2 = scala.collection.mutable.ArrayBuffer.empty[String]
        val n2 = CdcCursor.drain(spark, url, props, derbySpec, store()) { df =>
          seen2 ++= df.collect().map(_.getString(1))
        }
        assert(n2 == 1 && seen2.toList == List("6"), s"resume saw $seen2")
      }
    } finally conn.close()
  }
}
