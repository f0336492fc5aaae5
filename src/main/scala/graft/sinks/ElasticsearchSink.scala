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
    def actionJson(verb: String) = concat(lit("{\"" + verb + "\":"),
      to_json(struct(lit(index).as("_index"), col(idCol).cast("string").as("_id"))), lit("}"))
    val indexAction = concat(actionJson("index"), lit("\n"), to_json(struct(docCols: _*)))
    val action = tombstoneCol match {
      case Some(tc) => when(col(tc).isNull, actionJson("delete")).otherwise(indexAction)
      case None     => indexAction
    }
    batch.select(action.as("bulk_cmd"))
  }

  final case class Stats(ok: Long, clientErrors: Long, serverErrors: Long, retries: Long = 0)

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
      extends (String => Int) with Serializable {
    override def apply(payload: String): Int = {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(uri))
        .header("Content-Type", contentType)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
        .build()
      sharedHttpClient.send(req, java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
    }
  }

  /** Production transport: POST the NDJSON payload to `<baseUrl>/_bulk`.
    * One HTTP client per executor (reused across chunks).
    */
  def httpTransport(baseUrl: String): String => Int =
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
  private[sinks] def postChunks(lines: DataFrame, transport: String => Int,
                                maxPerPost: Int, sep: String, suffix: String,
                                countNullAsClientError: Boolean = false,
                                maxRetries: Int = 0, backoffMs: Long = 100): Stats = {
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
      def attemptPost(payload: String): Int =
        try transport(payload) catch { case _: java.io.IOException => 599 }
      def flush(): Unit = if (buf.nonEmpty) {
        val payload = buf.mkString("", sep, suffix)
        val n = buf.size.toLong
        var status = attemptPost(payload)
        var attempt = 0
        while (status >= 500 && attempt < maxRetries) {
          if (backoffMs > 0) Thread.sleep(backoffMs << attempt)
          attempt += 1
          retried.add(1)
          status = attemptPost(payload)
        }
        status match {
          case s if s >= 200 && s < 300 => ok.add(n)
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
            transport: String => Int, maxDocsPerBulk: Int = 500,
            maxRetries: Int = 0, backoffMs: Long = 100): Stats =
    postChunks(bulkCommands(batch, index, idCol, tombstoneCol), transport, maxDocsPerBulk,
      sep = "\n", suffix = "\n", countNullAsClientError = false, maxRetries, backoffMs)
}
