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
