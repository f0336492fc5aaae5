package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Elasticsearch bulk sink (reference:
  * libraries/kspp-es/elasticsearch_producer.h:17-120 and the kafka2es tool):
  * key → `_id`, value → JSON doc, tombstone → bulk `delete` action, batched
  * NDJSON POSTs to `/_bulk`, with 2xx/4xx/5xx response counters.
  *
  * The JSON doc is rendered Spark-side with `to_json` (codegen, no UDF); the
  * partition loop only concatenates NDJSON and posts. The HTTP transport is
  * a pluggable `(payload → status)` function so tests (and air-gapped runs)
  * inject a fake; [[httpTransport]] is the production java.net.http default.
  * Use from `foreachBatch` for streaming, or directly on a batch DataFrame.
  */
object ElasticsearchSink {

  /** One bulk line pair (or single delete line) per input row. Action lines
    * are rendered with `to_json` so ids containing quotes/backslashes stay
    * valid JSON.
    */
  def bulkCommands(batch: DataFrame, index: String, idCol: String,
                   tombstoneCol: Option[String]): DataFrame = {
    val docCols = batch.columns.filterNot(c => c == idCol).map(col)
    // a NULL id must raise, not slip through: to_json drops null fields, so
    // the action would lose its _id — ES then auto-generates one, breaking
    // the idempotent-upsert argument retries rest on (and a delete without
    // _id is a per-item error). The MqttSink null-key stance.
    val idStr = when(col(idCol).isNull, raise_error(lit(
      s"ElasticsearchSink: NULL $idCol — an action without _id breaks idempotent upsert/delete"))
      .cast("string")).otherwise(col(idCol).cast("string"))
    def actionJson(verb: String) = concat(lit("{\"" + verb + "\":"),
      to_json(struct(lit(index).as("_index"), idStr.as("_id"))), lit("}"))
    val indexAction = concat(actionJson("index"), lit("\n"), to_json(struct(docCols: _*)))
    val action = tombstoneCol match {
      case Some(tc) => when(col(tc).isNull, actionJson("delete")).otherwise(indexAction)
      case None     => indexAction
    }
    batch.select(action.as("bulk_cmd"))
  }

  final case class Stats(ok: Long, clientErrors: Long, serverErrors: Long, retries: Long = 0)

  /** An HTTP answer with its body — ES signals per-item failures inside a
    * 200 response (`"errors":true`), so a status-only transport cannot see
    * them and silently under-counts failures.
    */
  final case class HttpResult(status: Int, body: String = "")

  /** Count per-item failures in a bulk response body: (4xx items, 5xx
    * items). Fast path: a response without `"errors":true` scans nothing.
    * Only item metadata appears in the response (documents are not
    * echoed), so the `"status":` matches are exactly the per-item codes.
    */
  private[graft] def bulkItemErrors(body: String): (Long, Long) = {
    if (body == null || !body.contains("\"errors\":true")) (0L, 0L)
    else {
      var c = 0L
      var sv = 0L
      "\"status\"\\s*:\\s*(\\d+)".r.findAllMatchIn(body).foreach { m =>
        val st = m.group(1).toInt
        // 429 (es_rejected_execution) is the per-item TRANSIENT rejection —
        // classify with 5xx so the bounded retry loop replays it
        if (st == 429 || st >= 500) sv += 1 else if (st >= 400) c += 1
      }
      (c, sv)
    }
  }

  /** Serializable POST transport shared by the HTTP sinks: the function
    * ships into `foreachPartition`, so the (non-serializable) HttpClient
    * must be constructed lazily on the executor, not captured from the
    * driver.
    */
  // one HttpClient per JVM (thread-safe), shared by every task's transport
  // copy — per-task construction would churn a thread+connection pool per
  // partition per trigger
  @transient private lazy val sharedHttpClient = java.net.http.HttpClient.newHttpClient()

  private[sinks] final class SerializableHttpPost(uri: String, contentType: String)
      extends (String => HttpResult) with Serializable {
    override def apply(payload: String): HttpResult = {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(uri))
        .header("Content-Type", contentType)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
        .build()
      val resp = sharedHttpClient.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      HttpResult(resp.statusCode(), resp.body())
    }
  }

  /** Production transport: POST the NDJSON payload to `<baseUrl>/_bulk`.
    * One HTTP client per executor (reused across chunks).
    */
  def httpTransport(baseUrl: String): String => HttpResult =
    new SerializableHttpPost(s"$baseUrl/_bulk", "application/x-ndjson")

  /** Shared chunked-POST loop for HTTP batch sinks: groups `maxPerPost`
    * string rows per payload and classifies response statuses into the
    * reference producer's 2xx/4xx/5xx counters, all in one pass over the
    * input (null rows are counted — not posted — in the same pass, so the
    * invalid count cannot disagree with the posted set under a
    * non-deterministic upstream).
    *
    * A 5xx answer retries the same payload up to `maxRetries` times with
    * exponential backoff (`backoffMs`, doubled per attempt) before counting
    * the chunk as a server error — the reference producer's bounded
    * retry-on-HTTP_SERVER_ERROR loop (elasticsearch_producer.h:17-120,
    * elasticsearch_producer.cpp retry path). 4xx is never retried: the
    * payload will not get better.
    */
  private[sinks] def postChunks(lines: DataFrame, transport: String => HttpResult,
                                maxPerPost: Int, sep: String, suffix: String,
                                countNullAsClientError: Boolean = false,
                                maxRetries: Int = 0, backoffMs: Long = 100,
                                itemErrors: Option[String => (Long, Long)] = None): Stats = {
    val sc = lines.sparkSession.sparkContext
    val ok = sc.longAccumulator("http_2xx")
    val clientErr = sc.longAccumulator("http_4xx")
    val serverErr = sc.longAccumulator("http_5xx")
    val retried = sc.longAccumulator("http_retries")
    lines.foreachPartition { (it: Iterator[Row]) =>
      val buf = new scala.collection.mutable.ArrayBuffer[String](maxPerPost)
      // a transport-level failure (connection refused, timeout) is the same
      // transient outage as a 5xx answer — map it to a synthetic 599 so one
      // loop retries both instead of an IOException failing the whole task
      def attemptPost(payload: String): HttpResult =
        try transport(payload) catch { case _: java.io.IOException => HttpResult(599) }
      def flush(): Unit = if (buf.nonEmpty) {
        val payload = buf.mkString("", sep, suffix)
        val n = buf.size.toLong
        var res = attemptPost(payload)
        var items = itemErrors.map(_.apply(res.body))
        // retry whole-chunk on a 5xx status OR any 5xx ITEM inside a 2xx
        // answer (es_rejected_execution under load arrives as 200 +
        // "errors":true): idempotent _id-keyed actions make the full-chunk
        // replay safe, and the reference producer retries server errors
        def transientFailure: Boolean =
          res.status >= 500 || (res.status < 300 && items.exists(_._2 > 0))
        var attempt = 0
        while (transientFailure && attempt < maxRetries) {
          if (backoffMs > 0) Thread.sleep(backoffMs << attempt)
          attempt += 1
          retried.add(1)
          res = attemptPost(payload)
          items = itemErrors.map(_.apply(res.body))
        }
        res.status match {
          case s if s >= 200 && s < 300 => items match {
            case Some((c, sv)) =>
              // per-item failures inside a 2xx bulk answer would otherwise
              // count as ok — the silent-loss mode a status-only transport
              // cannot see
              ok.add(n - c - sv); clientErr.add(c); serverErr.add(sv)
            case None => ok.add(n)
          }
          case s if s >= 400 && s < 500 => clientErr.add(n)
          case _                        => serverErr.add(n)
        }
        buf.clear()
      }
      it.foreach { r =>
        if (r.isNullAt(0)) { if (countNullAsClientError) clientErr.add(1) }
        else {
          buf += r.getString(0)
          if (buf.size >= maxPerPost) flush()
        }
      }
      flush()
    }
    Stats(ok.value, clientErr.value, serverErr.value, retried.value)
  }

  /** Write a (micro-)batch: per partition, group `maxDocsPerBulk` commands
    * per POST. Returns 2xx/4xx/5xx counts (the reference's
    * `success`/`http4xx`/`http5xx` metrics); `maxRetries`/`backoffMs`
    * bound the per-chunk 5xx retry loop.
    */
  def write(batch: DataFrame, index: String, idCol: String, tombstoneCol: Option[String],
            transport: String => HttpResult, maxDocsPerBulk: Int = 500,
            maxRetries: Int = 0, backoffMs: Long = 100): Stats =
    postChunks(bulkCommands(batch, index, idCol, tombstoneCol), transport, maxDocsPerBulk,
      sep = "\n", suffix = "\n", countNullAsClientError = false, maxRetries, backoffMs,
      itemErrors = Some(bulkItemErrors))


}
