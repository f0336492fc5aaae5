package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import graft.connect.{KinesisClient, KinesisSource, SigV4}

/** Kinesis source tests: the SigV4 signer against an independently computed
  * vector (hashlib/hmac transcription of the published algorithm), the
  * JSON-API client against a scripted transport (shard paging, iterator
  * chains, base64 payloads, arrival timestamps), and the signed-HTTP
  * transport against a loopback HTTP server.
  */
class KinesisSpec extends SparkSpec {

  test("SigV4 authorization matches an independently computed vector") {
    // Expected value computed with a separate Python implementation of the
    // published signing chain (same inputs, hashlib/hmac).
    val auth = SigV4.authorization(
      host = "kinesis.us-east-1.amazonaws.com",
      target = "Kinesis_20131202.DescribeStream",
      body = """{"StreamName":"events"}""",
      amzDate = "20260101T000000Z",
      region = "us-east-1", service = "kinesis",
      accessKey = "AKIDEXAMPLE", secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
    assert(auth == "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20260101/us-east-1/kinesis/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date;x-amz-target, " +
      "Signature=42794ce55de6bbc838eac2d8a4efb114053ae0f2cf4103c78e369bd33798fda7")
  }

  test("generic SigV4 (S3 GET with range) matches an independently computed vector") {
    // Same Python hashlib/hmac cross-implementation as above, over the S3
    // offset store's ranged GET header set.
    val emptyHash = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    val auth = SigV4.authorizationFor(
      method = "GET", path = "/bucket/cursor",
      headers = Seq("host" -> "127.0.0.1:9000", "range" -> "bytes=0-7",
        "x-amz-content-sha256" -> emptyHash, "x-amz-date" -> "20260812T120000Z"),
      payloadHash = emptyHash, amzDate = "20260812T120000Z",
      region = "us-east-1", service = "s3",
      accessKey = "AKIDEXAMPLE", secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
    assert(auth == "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20260812/us-east-1/s3/aws4_request, " +
      "SignedHeaders=host;range;x-amz-content-sha256;x-amz-date, " +
      "Signature=2ea1695bc17f941ce267930a7aabc81857a561c0539c8c7c1611d0cf18d01c77")
  }

  /** Scripted two-shard stream: DescribeStream pages (HasMoreShards on the
    * first page, like kinesis_consumer.cpp:124-144 expects), iterator per
    * shard, then per-iterator GetRecords chains ending in an empty page.
    */
  private def fakeTransport(pages: Map[String, (Seq[(String, String, Double)], Option[String], Long)])
  : (String, String) => String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    (target, body) => {
      val req = mapper.readTree(body)
      target match {
        case "Kinesis_20131202.DescribeStream" =>
          assert(req.get("StreamName").asText() == "events")
          val page1 = !req.has("ExclusiveStartShardId")
          val shards = if (page1) Seq("shardId-000") else Seq("shardId-001")
          val shardsJson = shards.map(s => s"""{"ShardId":"$s"}""").mkString(",")
          s"""{"StreamDescription":{"Shards":[$shardsJson],"HasMoreShards":$page1}}"""
        case "Kinesis_20131202.GetShardIterator" =>
          assert(req.get("StreamName").asText() == "events")
          assert(req.get("ShardIteratorType").asText() == "TRIM_HORIZON")
          s"""{"ShardIterator":"it-${req.get("ShardId").asText()}-0"}"""
        case "Kinesis_20131202.GetRecords" =>
          val it = req.get("ShardIterator").asText()
          val (recs, next, behind) = pages(it)
          val recsJson = recs.map { case (k, v, ts) =>
            val b64 = Base64.getEncoder.encodeToString(v.getBytes(UTF_8))
            s"""{"PartitionKey":"$k","Data":"$b64","ApproximateArrivalTimestamp":$ts}"""
          }.mkString(",")
          val nextJson = next.map(n => s""","NextShardIterator":"$n"""").getOrElse("")
          s"""{"Records":[$recsJson],"MillisBehindLatest":$behind$nextJson}"""
        case other => fail(s"unexpected target $other")
      }
    }
  }

  test("listShards follows HasMoreShards paging; drain decodes base64 + arrival ts") {
    val transport = fakeTransport(Map(
      "it-shardId-000-0" -> (Seq(("u1", "hello", 1700000000.5), ("u2", "world", 1700000001.0)),
        Some("it-shardId-000-1"), 5000L),
      // mid-shard empty page (idle segment): MillisBehindLatest > 0, so the
      // drain must keep following the iterator rather than stop early
      "it-shardId-000-1" -> (Nil, Some("it-shardId-000-2"), 3000L),
      "it-shardId-000-2" -> (Seq(("u3", "!", 1700000002.25)), Some("it-shardId-000-3"), 0L),
      "it-shardId-000-3" -> (Nil, Some("it-shardId-000-4"), 0L)))
    assert(KinesisClient.listShards(transport, "events") == Seq("shardId-000", "shardId-001"))
    val df = KinesisSource.drain(spark, transport, "events", partition = 0)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // reference record mapping (kinesis_consumer.cpp:188-196): key =
    // PartitionKey, value = data, ts = arrival millis; stops on empty page
    assert(rows == Seq(("u1", "hello", 1700000000500L), ("u2", "world", 1700000001000L),
      ("u3", "!", 1700000002250L)))
  }

  test("listShards fails loudly when HasMoreShards lies with an empty page") {
    // a page that ADDS nothing with HasMoreShards=true would re-send the
    // identical request forever; exiting SILENTLY instead would plan
    // readers for a SUBSET of shards and never consume the rest — the
    // only honest outcome for a contradictory API reply is a loud error
    // the next trigger retries
    val transport: (String, String) => String = (target, body) => {
      val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      assert(target == "Kinesis_20131202.DescribeStream")
      if (!req.has("ExclusiveStartShardId"))
        """{"StreamDescription":{"Shards":[{"ShardId":"s0"}],"HasMoreShards":true}}"""
      else
        """{"StreamDescription":{"Shards":[],"HasMoreShards":true}}"""
    }
    val e = intercept[RuntimeException](KinesisClient.listShards(transport, "events"))
    assert(e.getMessage.contains("possibly-partial shard list"), e.getMessage)
  }

  test("transport retries throttling and 5xx with bounded backoff, fails fast otherwise") {
    val codes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val script = new java.util.concurrent.atomic.AtomicReference[Seq[(Int, String)]](Nil)
    val server = com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { exchange =>
      exchange.getRequestBody.readAllBytes()
      val s = script.get()
      val (code, body) = if (s.isEmpty) (200, "{}") else s.head
      script.set(if (s.isEmpty) Nil else s.tail)
      codes.add(code)
      val b = body.getBytes(UTF_8)
      exchange.sendResponseHeaders(code, b.length)
      exchange.getResponseBody.write(b)
      exchange.close()
    })
    server.start()
    try {
      val transport = KinesisClient.httpTransport(region = "us-east-1",
        endpointOverride = Some(s"http://127.0.0.1:${server.getAddress.getPort}"),
        accessKey = "AK", secretKey = "SK", sessionToken = None)
      // two throttles then success: the call must succeed on attempt 3
      script.set(Seq(
        (400, """{"__type":"ProvisionedThroughputExceededException"}"""),
        (500, "oops")))
      assert(transport("Kinesis_20131202.GetRecords", "{}") == "{}")
      assert(codes.size == 3, s"expected 3 attempts, saw $codes")
      // a non-retriable 400 (validation) fails on the FIRST attempt
      codes.clear()
      script.set(Seq((400, """{"__type":"ValidationException"}"""), (200, "{}")))
      val e = intercept[IllegalArgumentException](
        transport("Kinesis_20131202.GetRecords", "{}"))
      assert(e.getMessage.contains("ValidationException"))
      assert(codes.size == 1, s"validation errors must not retry: $codes")
    } finally server.stop(0)
  }

  test("an out-of-retention checkpoint sequence falls back to TRIM_HORIZON instead of poisoning") {
    val types = collection.mutable.ArrayBuffer.empty[String]
    val transport: (String, String) => String = (target, body) => {
      assert(target == "Kinesis_20131202.GetShardIterator")
      val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val t = req.get("ShardIteratorType").asText()
      types += t
      if (t == "AFTER_SEQUENCE_NUMBER")
        throw new IllegalArgumentException(
          """Kinesis GetShardIterator failed: 400 {"__type":"InvalidArgumentException","message":"sequence number out of retention"}""")
      else s"""{"ShardIterator":"it-horizon"}"""
    }
    val it = KinesisClient.shardIteratorOrHorizon(transport, "events", "s0",
      "AFTER_SEQUENCE_NUMBER", Some("49590000000000000000000000"))
    assert(it == "it-horizon")
    assert(types.toSeq == Seq("AFTER_SEQUENCE_NUMBER", "TRIM_HORIZON"))
    // WITHOUT a sequence (LATEST/TRIM_HORIZON request itself failing),
    // the error is real and must propagate — no silent rewrite
    val failAll: (String, String) => String = (_, _) =>
      throw new IllegalArgumentException("""{"__type":"InvalidArgumentException"}""")
    intercept[IllegalArgumentException](
      KinesisClient.shardIteratorOrHorizon(failAll, "events", "s0", "LATEST", None))
    // an InvalidArgumentException that is NOT sequence-shaped (malformed
    // request, wrong shard id) must also propagate, even on a
    // sequence-relative request — rewinding THOSE to TRIM_HORIZON would
    // silently re-read the whole retention window
    val wrongShard: (String, String) => String = (_, _) =>
      throw new IllegalArgumentException(
        """Kinesis GetShardIterator failed: 400 {"__type":"InvalidArgumentException","message":"Invalid ShardId bogus"}""")
    intercept[IllegalArgumentException](
      KinesisClient.shardIteratorOrHorizon(wrongShard, "events", "bogus",
        "AFTER_SEQUENCE_NUMBER", Some("49590000000000000000000000")))
  }

  test("getRecords clamps Limit to the API maximum of 10000") {
    // a per-shard batch budget above 10000 must not leak into the request:
    // the real API rejects Limit > 10000 with ValidationException, failing
    // the stream on its first trigger
    var seen = -1
    val capture: (String, String) => String = { (target, body) =>
      val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      seen = req.get("Limit").asInt()
      """{"Records":[],"MillisBehindLatest":0}"""
    }
    KinesisClient.getRecords(capture, "it-x", limit = 20000)
    assert(seen == 10000, s"Limit must clamp to 10000, sent $seen")
    KinesisClient.getRecords(capture, "it-x", limit = 0)
    assert(seen == 1, s"Limit must clamp up to 1, sent $seen")
  }

  test("httpTransport sends a SigV4-signed x-amz-json-1.1 POST") {
    val received = new java.util.concurrent.atomic.AtomicReference[(String, String, String, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
      received.set((
        exchange.getRequestHeaders.getFirst("X-Amz-Target"),
        exchange.getRequestHeaders.getFirst("Authorization"),
        exchange.getRequestHeaders.getFirst("X-Amz-Security-Token"),
        body))
      val resp = """{"StreamDescription":{"Shards":[{"ShardId":"s0"}],"HasMoreShards":false}}"""
        .getBytes(UTF_8)
      exchange.sendResponseHeaders(200, resp.length)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    try {
      val transport = KinesisClient.httpTransport(
        region = "eu-west-1",
        endpointOverride = Some(s"http://127.0.0.1:${server.getAddress.getPort}"),
        accessKey = "AKIDTEST", secretKey = "secret", sessionToken = Some("tok"))
      val shards = KinesisClient.listShards(transport, "events")
      assert(shards == Seq("s0"))
      val (target, auth, token, body) = received.get()
      assert(target == "Kinesis_20131202.DescribeStream")
      assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDTEST/"))
      assert(auth.contains("/eu-west-1/kinesis/aws4_request"))
      assert(auth.contains(
        "SignedHeaders=content-type;host;x-amz-date;x-amz-security-token;x-amz-target"))
      assert(token == "tok")
      assert(body == """{"StreamName":"events"}""")
    } finally server.stop(0)
  }
}

/** In-JVM Kinesis ledger behind the V2 stream tests: shard → ordered
  * (seq, key, value, tsSec) records, with real iterator-token semantics
  * (TRIM_HORIZON, AFTER_SEQUENCE_NUMBER, Limit paging, MillisBehindLatest).
  */
object KinesisLedger {
  val shards = new scala.collection.concurrent.TrieMap[String, Vector[(Long, String, String, Double)]]()
  def clear(): Unit = shards.clear()
  def append(shard: String, seq: Long, key: String, value: String, tsSec: Double): Unit =
    shards.put(shard, shards.getOrElse(shard, Vector.empty) :+ ((seq, key, value, tsSec)))
}

final class LedgerTransportFactory extends graft.connect.KinesisTransportFactory {
  override def create(options: Map[String, String]): (String, String) => String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    (target, body) => {
      val req = mapper.readTree(body)
      target match {
        case "Kinesis_20131202.DescribeStream" =>
          val shardsJson = KinesisLedger.shards.keys.toSeq.sorted
            .map(s => s"""{"ShardId":"$s"}""").mkString(",")
          s"""{"StreamDescription":{"Shards":[$shardsJson],"HasMoreShards":false}}"""
        case "Kinesis_20131202.GetShardIterator" =>
          val shard = req.get("ShardId").asText()
          val recs = KinesisLedger.shards.getOrElse(shard, Vector.empty)
          val idx = req.get("ShardIteratorType").asText() match {
            case "TRIM_HORIZON" => 0
            case "LATEST" => recs.size
            case "AFTER_SEQUENCE_NUMBER" =>
              val after = req.get("StartingSequenceNumber").asText().toLong
              recs.indexWhere(_._1 > after) match { case -1 => recs.size; case i => i }
            case "AT_SEQUENCE_NUMBER" =>
              val at = req.get("StartingSequenceNumber").asText().toLong
              recs.indexWhere(_._1 >= at) match { case -1 => recs.size; case i => i }
            case other => fail(s"unexpected iterator type $other")
          }
          s"""{"ShardIterator":"it|$shard|$idx"}"""
        case "Kinesis_20131202.GetRecords" =>
          val Array(_, shard, idxStr) = req.get("ShardIterator").asText().split('|')
          val idx = idxStr.toInt
          val limit = if (req.has("Limit")) req.get("Limit").asInt() else 10000
          val recs = KinesisLedger.shards.getOrElse(shard, Vector.empty)
          val page = recs.slice(idx, idx + limit)
          val recsJson = page.map { case (seq, k, v, ts) =>
            val b64 = java.util.Base64.getEncoder.encodeToString(v.getBytes("UTF-8"))
            s"""{"PartitionKey":"$k","Data":"$b64","ApproximateArrivalTimestamp":$ts,"SequenceNumber":"$seq"}"""
          }.mkString(",")
          val behind = recs.size - (idx + page.size)
          s"""{"Records":[$recsJson],"MillisBehindLatest":$behind,"NextShardIterator":"it|$shard|${idx + page.size}"}"""
        case other => fail(s"unexpected target $other")
      }
    }
  }
  private def fail(msg: String): Nothing = throw new IllegalStateException(msg)
}

/** The V2 stream: per-shard partitions, sequence-number offsets, pacing. */
class KinesisStreamSpec extends SparkSpec {
  test("readStream consumes all shards in paced batches and picks up appended records") {
    KinesisLedger.clear()
    (1L to 5L).foreach(i => KinesisLedger.append("shard-0", i, s"k$i", s"v$i", 1700000000.0 + i))
    (1L to 3L).foreach(i => KinesisLedger.append("shard-1", 100 + i, s"j$i", s"w$i", 1700000100.0 + i))

    val stream = spark.readStream.format("graft-kinesis")
      .option("stream", "events")
      .option("transportFactory", classOf[LedgerTransportFactory].getName)
      .option("maxRecordsPerShardBatch", "2")
      .load()
    val q = stream.writeStream.format("memory").queryName("kin_v2").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT shard, sequence_number, key, value, event_time_ms FROM kin_v2")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      assert(got.length == 8) // every record exactly once across both shards
      assert(got.count(_._1 == "shard-0") == 5 && got.count(_._1 == "shard-1") == 3)
      assert(got.filter(_._1 == "shard-0").map(_._2.toLong).sorted.toSeq == (1L to 5L))
      assert(got.find(_._2 == "101").exists(r => r._3 == "j1" && r._4 == "w1" && r._5 == 1700000101000L))
      // pacing: 2 records per shard per batch → shard-0's 5 records need ≥3 batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)

      KinesisLedger.append("shard-0", 6, "k6", "v6", 1700000006.5)
      q.processAllAvailable()
      val after = spark.sql("SELECT sequence_number FROM kin_v2").collect().map(_.getString(0))
      assert(after.length == 9 && after.count(_ == "6") == 1)
    } finally q.stop()
  }
}
