package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol sink (reference:
  * libraries/kspp-influx/influx_sink.h:10-53): the reference consumes
  * `<void, string>` records that already carry line-protocol text and POSTs
  * newline-joined batches to `/write?db=...`. Same contract here: a string
  * column of line-protocol rows, chunked per partition through a pluggable
  * transport, with 2xx/4xx/5xx counters.
  *
  * [[lineProtocol]] is a convenience builder for the common case of
  * (measurement, tags, fields, timestamp) columns — rendered Spark-side with
  * codegen'd `concat`, no UDF.
  */
object InfluxSink {

  /** Render `measurement,tag=v,... field=v,... ts` from columns. Tags and
    * fields are (name → column) pairs; the timestamp column must be epoch
    * nanos (Influx's default precision).
    */
  def lineProtocol(measurement: String, tags: Seq[(String, org.apache.spark.sql.Column)],
                   fields: Seq[(String, org.apache.spark.sql.Column)],
                   timeNs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(fields.nonEmpty, "influx line protocol requires at least one field")
    // line protocol requires escaping space/comma/equals in tag values
    def escTag(v: org.apache.spark.sql.Column) =
      regexp_replace(v.cast("string"), "([ ,=])", "\\\\$1")
    val tagPart =
      if (tags.isEmpty) lit(measurement)
      else concat(lit(measurement), concat(tags.map { case (k, v) =>
        concat(lit("," + k + "="), escTag(v)) }: _*))
    val fieldPart = concat_ws(",",
      fields.map { case (k, v) => concat(lit(k + "="), v.cast("string")) }: _*)
    concat(tagPart, lit(" "), fieldPart, lit(" "), timeNs.cast("string"))
  }

  /** POST the payload to `<baseUrl>/write?db=<db>`. */
  def httpTransport(baseUrl: String, db: String): String => Int = {
    payload =>
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$baseUrl/write?db=$db"))
        .header("Content-Type", "text/plain; charset=utf-8")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
        .build()
      client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  /** Write a (micro-)batch of line-protocol strings (first column). */
  def write(lines: DataFrame, transport: String => Int,
            maxLinesPerPost: Int = 1000): ElasticsearchSink.Stats = {
    val sc = lines.sparkSession.sparkContext
    val ok = sc.longAccumulator("influx_2xx")
    val clientErr = sc.longAccumulator("influx_4xx")
    val serverErr = sc.longAccumulator("influx_5xx")
    lines.select(col(lines.columns.head).cast("string")).foreachPartition { (it: Iterator[Row]) =>
      it.grouped(maxLinesPerPost).foreach { chunk =>
        val status = transport(chunk.map(_.getString(0)).mkString("\n"))
        val n = chunk.size.toLong
        if (status >= 200 && status < 300) ok.add(n)
        else if (status >= 400 && status < 500) clientErr.add(n)
        else serverErr.add(n)
      }
    }
    ElasticsearchSink.Stats(ok.value, clientErr.value, serverErr.value)
  }
}
