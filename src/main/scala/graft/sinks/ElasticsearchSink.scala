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

  final case class Stats(ok: Long, clientErrors: Long, serverErrors: Long)

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
    * reference producer's 2xx/4xx/5xx counters.
    */
  private[sinks] def postChunks(lines: DataFrame, transport: String => Int,
                                maxPerPost: Int, sep: String, suffix: String): Stats = {
    val sc = lines.sparkSession.sparkContext
    val ok = sc.longAccumulator("http_2xx")
    val clientErr = sc.longAccumulator("http_4xx")
    val serverErr = sc.longAccumulator("http_5xx")
    lines.foreachPartition { (it: Iterator[Row]) =>
      it.grouped(maxPerPost).foreach { chunk =>
        val payload = chunk.map(_.getString(0)).mkString("", sep, suffix)
        val n = chunk.size.toLong
        transport(payload) match {
          case s if s >= 200 && s < 300 => ok.add(n)
          case s if s >= 400 && s < 500 => clientErr.add(n)
          case _                        => serverErr.add(n)
        }
      }
    }
    Stats(ok.value, clientErr.value, serverErr.value)
  }

  /** Write a (micro-)batch: per partition, group `maxDocsPerBulk` commands
    * per POST. Returns 2xx/4xx/5xx counts (the reference's
    * `success`/`http4xx`/`http5xx` metrics).
    */
  def write(batch: DataFrame, index: String, idCol: String, tombstoneCol: Option[String],
            transport: String => Int, maxDocsPerBulk: Int = 500): Stats =
    postChunks(bulkCommands(batch, index, idCol, tombstoneCol), transport, maxDocsPerBulk,
      sep = "\n", suffix = "\n")
}
