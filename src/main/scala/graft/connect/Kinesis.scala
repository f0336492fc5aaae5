package graft.connect

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** AWS Signature Version 4 request signing — the published HMAC-SHA256
  * chain (date → region → service → aws4_request) over a canonical
  * request. Only what the Kinesis JSON API needs: POST to `/`, no query
  * string, fixed header set.
  */
object SigV4 {
  private val mapperDate = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  private def sha256Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg.getBytes(UTF_8))
  }

  /** Authorization header value for a Kinesis-style POST: body-hash,
    * canonical request over (content-type, host, x-amz-date, x-amz-target
    * [, x-amz-security-token]), string-to-sign, signing-key chain.
    */
  def authorization(host: String, target: String, body: String, amzDate: String,
                    region: String, service: String, accessKey: String, secretKey: String,
                    sessionToken: Option[String] = None): String = {
    val dateStamp = amzDate.take(8)
    val payloadHash = sha256Hex(body.getBytes(UTF_8))
    val baseHeaders = Seq(
      "content-type" -> "application/x-amz-json-1.1",
      "host" -> host,
      "x-amz-date" -> amzDate) ++
      sessionToken.map("x-amz-security-token" -> _) :+ ("x-amz-target" -> target)
    val canonicalHeaders = baseHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = baseHeaders.map(_._1).mkString(";")
    val canonicalRequest = s"POST\n/\n\n$canonicalHeaders\n$signedHeaders\n$payloadHash"
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign =
      s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${sha256Hex(canonicalRequest.getBytes(UTF_8))}"
    val signingKey = hmac(hmac(hmac(hmac(
      ("AWS4" + secretKey).getBytes(UTF_8), dateStamp), region), service), "aws4_request")
    val signature = hmac(signingKey, stringToSign).map("%02x".format(_)).mkString
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }

  def amzDateNow(): String = mapperDate.format(Instant.now())

  private[connect] def sha256HexBytes(b: Array[Byte]): String = sha256Hex(b)

  /** Generic SigV4 Authorization header over an arbitrary header set (the
    * Kinesis POST above is the fixed-header special case; the S3 offset
    * store signs GET/PUT object requests with this). `headers` must be
    * exactly the headers the request will send — lowercase names, no
    * duplicates — and the request must carry no query string.
    */
  def authorizationFor(method: String, path: String, headers: Seq[(String, String)],
                       payloadHash: String, amzDate: String, region: String, service: String,
                       accessKey: String, secretKey: String): String = {
    val dateStamp = amzDate.take(8)
    val sorted = headers.map { case (k, v) => (k.toLowerCase, v.trim) }.sortBy(_._1)
    val canonicalHeaders = sorted.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sorted.map(_._1).mkString(";")
    val canonicalRequest = s"$method\n$path\n\n$canonicalHeaders\n$signedHeaders\n$payloadHash"
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign =
      s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${sha256Hex(canonicalRequest.getBytes(UTF_8))}"
    val signingKey = hmac(hmac(hmac(hmac(
      ("AWS4" + secretKey).getBytes(UTF_8), dateStamp), region), service), "aws4_request")
    val signature = hmac(signingKey, stringToSign).map("%02x".format(_)).mkString
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}

/** Kinesis string source (reference:
  * libraries/kspp-kinesis/kinesis_source.h:14-87,
  * kinesis_consumer.cpp:20-211). The reference links the AWS C++ SDK; the
  * container has no AWS runtime, so the consumer speaks the public Kinesis
  * JSON API (`x-amz-json-1.1` POSTs with `X-Amz-Target:
  * Kinesis_20131202.*`, SigV4-signed) through a pluggable
  * `(target, body) → json` transport — tests and air-gapped runs inject a
  * fake, production uses [[KinesisClient.httpTransport]].
  *
  * Record contract matches kinesis_consumer.cpp:188-196: key =
  * PartitionKey, value = record data (base64-decoded), event_time =
  * ApproximateArrivalTimestamp millis.
  */
object KinesisClient {

  /** One HttpClient per JVM: each instance owns a thread + connection
    * pool, and a per-reader/per-probe `newHttpClient()` churned one per
    * shard per micro-batch (the ElasticsearchSink sharing rationale).
    */
  private[connect] lazy val sharedHttpClient = java.net.http.HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  final case class KRecord(key: String, value: Array[Byte], eventTimeMs: Long,
                           sequenceNumber: String)
  final case class RecordsPage(records: Seq[KRecord], nextIterator: Option[String],
                               millisBehindLatest: Option[Long])

  /** Production transport: SigV4-signed POST to the regional endpoint.
    * Credentials resolve from the same env vars the reference reads
    * (kinesis_consumer.cpp:47-85): AWS_ACCESS_KEY_ID,
    * AWS_SECRET_ACCESS_KEY, AWS_SESSION_TOKEN, AWS_REGION,
    * AWS_CUSTOM_ENDPOINT.
    */
  def httpTransport(region: String = sys.env.getOrElse("AWS_REGION", "us-east-1"),
                    endpointOverride: Option[String] = sys.env.get("AWS_CUSTOM_ENDPOINT"),
                    accessKey: String = sys.env.getOrElse("AWS_ACCESS_KEY_ID", ""),
                    secretKey: String = sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", ""),
                    sessionToken: Option[String] = sys.env.get("AWS_SESSION_TOKEN"))
  : (String, String) => String = {
    // Sign exactly the authority the HTTP client will put in the Host
    // header — a trailing slash or path in AWS_CUSTOM_ENDPOINT must not
    // leak into the canonical headers.
    val host = endpointOverride.map(e => java.net.URI.create(e).getAuthority)
      .getOrElse(s"kinesis.$region.amazonaws.com")
    val base = endpointOverride.map { e =>
      val u = java.net.URI.create(e); s"${u.getScheme}://${u.getAuthority}"
    }.getOrElse(s"https://$host")
    val client = KinesisClient.sharedHttpClient
    val send: (String, String) => (Int, String) = (target, body) => {
      val amzDate = SigV4.amzDateNow()
      val auth = SigV4.authorization(host, target, body, amzDate, region, "kinesis",
        accessKey, secretKey, sessionToken)
      val b = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$base/"))
        .header("Content-Type", "application/x-amz-json-1.1")
        .header("X-Amz-Date", amzDate)
        .header("X-Amz-Target", target)
        .header("Authorization", auth)
      sessionToken.foreach(b.header("X-Amz-Security-Token", _))
      val req = b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    // Routine throttling (GetRecords is capped at 5 calls/sec/shard, and
    // the unpaced probe loop can exceed that on a deep backlog) and
    // transient 5xx must not fail the whole micro-batch on the first hit:
    // bounded exponential backoff, the ElasticsearchSink.postChunks
    // stance. Every attempt re-signs (X-Amz-Date must be fresh).
    (target, body) => {
      var attempt = 0
      var out: String = null
      while (out == null) {
        val (code, respBody) = send(target, body)
        if (code / 100 == 2) out = respBody
        else {
          val throttled = code == 400 &&
            (respBody.contains("ProvisionedThroughputExceededException") ||
              respBody.contains("LimitExceededException") ||
              respBody.contains("ThrottlingException"))
          attempt += 1
          if (!(throttled || code / 100 == 5) || attempt > KinesisClient.MaxRetries)
            throw new IllegalArgumentException(
              s"Kinesis $target failed: $code $respBody")
          Thread.sleep(math.min(100L << attempt, 2000L))
        }
      }
      out
    }
  }

  /** Bounded retry budget for throttled/5xx Kinesis calls — with the
    * 100·2^attempt ms backoff this is ≤ ~6 s of waiting before the
    * micro-batch fails for real.
    */
  val MaxRetries = 5

  /** All shard ids, following HasMoreShards/ExclusiveStartShardId paging
    * exactly like kinesis_consumer.cpp:124-144.
    */
  def listShards(transport: (String, String) => String, stream: String): Seq[String] = {
    val shards = collection.mutable.ArrayBuffer.empty[String]
    var startAfter: Option[String] = None
    var more = true
    while (more) {
      val req = mapper.createObjectNode().put("StreamName", stream)
      startAfter.foreach(req.put("ExclusiveStartShardId", _))
      val resp = mapper.readTree(transport("Kinesis_20131202.DescribeStream", req.toString))
      val desc = resp.get("StreamDescription")
      val before = shards.size
      desc.get("Shards").forEach((s: JsonNode) => shards += s.get("ShardId").asText())
      more = desc.get("HasMoreShards").asBoolean()
      // HasMoreShards=true with a page that ADDED nothing would re-send
      // the identical request forever; exiting SILENTLY instead would
      // plan readers for a subset of shards and never consume the rest —
      // fail loudly, the only honest option for a contradictory API reply
      if (more && shards.size == before) sys.error(
        s"DescribeStream for '$stream' returned an empty page with " +
          "HasMoreShards=true after " + before + " shards — refusing to " +
          "continue with a possibly-partial shard list; retry the trigger")
      startAfter = shards.lastOption
    }
    shards.toSeq
  }

  /** Shard iterator; the reference starts at LATEST
    * (kinesis_consumer.cpp:149-152, TRIM_HORIZON left as the commented
    * earliest option) — both are supported here.
    */
  def shardIterator(transport: (String, String) => String, stream: String,
                    shardId: String, iteratorType: String = "LATEST",
                    startingSequenceNumber: Option[String] = None): String = {
    val req = mapper.createObjectNode().put("StreamName", stream)
      .put("ShardId", shardId).put("ShardIteratorType", iteratorType)
    startingSequenceNumber.foreach(req.put("StartingSequenceNumber", _))
    mapper.readTree(transport("Kinesis_20131202.GetShardIterator", req.toString))
      .get("ShardIterator").asText()
  }

  /** [[shardIterator]] with the poison-offset escape hatch: a checkpointed
    * sequence number OLDER THAN THE STREAM RETENTION is rejected by
    * GetShardIterator on every call (InvalidArgumentException) — without a
    * fallback the stream can never progress again short of deleting the
    * checkpoint. When a sequence-relative request fails that way, resolve
    * TRIM_HORIZON instead (one stderr note): re-reading from the earliest
    * retained record is at-least-once — exactly the delivery contract the
    * source already documents — while the poison offset is forever.
    *
    * The fallback is deliberately NARROW: only sequence-relative iterator
    * types (AT/AFTER_SEQUENCE_NUMBER) with an InvalidArgumentException
    * whose message is sequence-shaped qualify. A malformed request or a
    * wrong shard id also raises InvalidArgumentException, and silently
    * rewinding THOSE to the stream head would re-read the whole retention
    * window behind one stderr line — they must propagate instead.
    */
  private val SequenceIteratorTypes = Set("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER")

  def shardIteratorOrHorizon(transport: (String, String) => String, stream: String,
                             shardId: String, iteratorType: String,
                             startingSequenceNumber: Option[String]): String =
    try shardIterator(transport, stream, shardId, iteratorType, startingSequenceNumber)
    catch {
      case e: IllegalArgumentException
          if startingSequenceNumber.isDefined &&
            SequenceIteratorTypes.contains(iteratorType) &&
            e.getMessage != null && e.getMessage.contains("InvalidArgumentException") &&
            e.getMessage.toLowerCase.contains("sequence") =>
        System.err.println(
          s"kinesis: checkpointed sequence for shard $shardId no longer in " +
            s"retention (${e.getMessage.take(200)}); re-reading from TRIM_HORIZON")
        shardIterator(transport, stream, shardId, "TRIM_HORIZON", None)
      case e: IllegalArgumentException
          if startingSequenceNumber.isDefined &&
            SequenceIteratorTypes.contains(iteratorType) &&
            e.getMessage != null && e.getMessage.contains("InvalidArgumentException") =>
        // the DELIBERATE trade of the narrow fallback: a transport that
        // strips the retention message (proxies/emulators returning only
        // the bare __type) will NOT auto-rewind — that error could equally
        // be a malformed request, and rewinding those silently re-reads
        // the whole retention window. Name the way out before propagating,
        // so the poison-offset stall is diagnosable from one log line.
        System.err.println(
          s"kinesis: InvalidArgumentException for a sequence-relative read " +
            s"on shard $shardId without retention-specific text " +
            s"(${e.getMessage.take(200)}); NOT auto-falling back — if this " +
            "checkpoint is out of retention, clear it (or start the query " +
            "from TRIM_HORIZON) to recover")
        throw e
    }

  /** One GetRecords page → decoded records + next iterator
    * (kinesis_consumer.cpp:178-210).
    */
  def getRecords(transport: (String, String) => String, iterator: String,
                 limit: Int = 10000): RecordsPage = {
    // the API rejects Limit outside [1, 10000] with ValidationException —
    // a larger per-shard batch budget just takes more hops
    val req = mapper.createObjectNode().put("ShardIterator", iterator)
      .put("Limit", math.max(1, math.min(limit, 10000)))
    val resp = mapper.readTree(transport("Kinesis_20131202.GetRecords", req.toString))
    val recs = collection.mutable.ArrayBuffer.empty[KRecord]
    resp.get("Records").forEach { (r: JsonNode) =>
      // ApproximateArrivalTimestamp is epoch seconds (possibly fractional)
      val ts = (r.get("ApproximateArrivalTimestamp").asDouble() * 1000).toLong
      val seq = Option(r.get("SequenceNumber")).map(_.asText()).getOrElse("")
      recs += KRecord(r.get("PartitionKey").asText(),
        Base64.getDecoder.decode(r.get("Data").asText()), ts, seq)
    }
    val next = Option(resp.get("NextShardIterator")).filterNot(_.isNull).map(_.asText())
    val behind = Option(resp.get("MillisBehindLatest")).filterNot(_.isNull).map(_.asLong())
    RecordsPage(recs.toSeq, next, behind)
  }
}

object KinesisSource {
  import KinesisClient._

  /** Drain one shard (the reference binds one consumer per partition index,
    * kinesis_consumer.cpp:20-22,147-149) from `iteratorType` until
    * `maxBatches` GetRecords pages or the iterator ends, into
    * `(key, value, event_time_ms)` rows — same drain-loop shape as the CDC
    * and MQTT sources.
    */
  def drain(spark: SparkSession, transport: (String, String) => String, stream: String,
            partition: Int, maxBatches: Int = 10,
            iteratorType: String = "TRIM_HORIZON"): DataFrame = {
    val shards = listShards(transport, stream)
    require(partition < shards.size, s"partition $partition out of ${shards.size} shards")
    var it: Option[String] = Some(shardIterator(transport, stream, shards(partition), iteratorType))
    val buf = collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var batches = 0
    var caughtUp = false
    while (it.isDefined && batches < maxBatches && !caughtUp) {
      val page = getRecords(transport, it.get)
      // Kinesis legitimately returns empty pages mid-shard while the
      // iterator traverses idle segments; "caught up" (the reference's
      // eof_) is an empty page WITH MillisBehindLatest == 0. Absent the
      // field, fall back to treating the empty page as caught up.
      caughtUp = page.records.isEmpty && page.millisBehindLatest.forall(_ == 0L)
      page.records.foreach(r => buf += ((r.key, new String(r.value, UTF_8), r.eventTimeMs)))
      it = page.nextIterator
      batches += 1
    }
    import spark.implicits._
    buf.toSeq.toDF("key", "value", "event_time_ms")
  }
}
