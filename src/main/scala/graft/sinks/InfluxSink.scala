package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** InfluxDB line-protocol sink (reference:
  * libraries/kspp-influx/influx_sink.h:10-53): the reference consumes
  * `<void, string>` records that already carry line-protocol text and POSTs
  * newline-joined batches to `/write?db=...`. Same contract here: a string
  * column of line-protocol rows, chunked per partition through a pluggable
  * transport, with 2xx/4xx/5xx counters.
  *
  * [[lineProtocol]] renders (measurement, tags, fields, timestamp) columns
  * with codegen'd `concat` — string fields quoted and escaped, integer
  * fields suffixed `i`, null tags/fields omitted, tag values escaped — per
  * the line-protocol spec. It takes the source DataFrame to resolve field
  * types at plan time.
  */
object InfluxSink {

  // Line protocol cannot carry a raw newline ANYWHERE — it terminates the
  // point, so one newline-bearing value splits its row into two malformed
  // lines and the server 400s the whole ≤1000-line chunk (the same
  // fails-the-WHOLE-chunk blast radius the unsupported-type check below
  // rejects at plan time). Tags have no escape for it in the spec: \n/\r
  // map to a space (lossy but chunk-safe). String fields keep them
  // losslessly as the two-character escapes \n/\r, which the earlier
  // backslash-doubling pass would otherwise mangle — hence ordered last.

  private def escTag(v: Column): Column =
    // newline-to-space FIRST, then the escape pass — the substituted space
    // must itself be escaped, or it terminates the tag set and malforms
    // the line (the chunk-poisoning this mapping exists to prevent)
    regexp_replace(
      regexp_replace(v.cast("string"), "[\\n\\r]", " "),
      "([ ,=])", "\\\\$1")

  private def escFieldString(v: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      v.cast("string"),
      "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      "\\n", "\\\\n"), "\\r", "\\\\r")

  /** Render `measurement,tag=v,... field=v,... ts`. `timeNs` must be epoch
    * nanos (Influx's default precision). Null tags and fields are omitted.
    */
  def lineProtocol(df: DataFrame, measurement: String, tags: Seq[(String, Column)],
                   fields: Seq[(String, Column)], timeNs: Column): Column = {
    require(fields.nonEmpty, "influx line protocol requires at least one field")
    val fieldTypes = df.select(fields.map(_._2): _*).schema.fields.map(_.dataType)
    val fieldParts = fields.zip(fieldTypes).map { case ((k, v), dt) =>
      val rendered = dt match {
        case StringType => concat(lit(k + "=\""), escFieldString(v), lit("\""))
        case ByteType | ShortType | IntegerType | LongType =>
          concat(lit(k + "="), v.cast("string"), lit("i"))
        case FloatType | DoubleType | BooleanType =>
          concat(lit(k + "="), v.cast("string"))
        case other => throw new IllegalArgumentException(
          // e.g. a TimestampType renders with an unescaped space, which
          // terminates the field set early and fails the WHOLE chunk —
          // reject at plan time where the error names the column
          s"InfluxSink: field '$k' has unsupported type $other — cast it to " +
            "string/integer/float/boolean explicitly")
      }
      when(v.isNotNull, rendered)
    }
    val tagPart = concat(lit(measurement) +: tags.map { case (k, v) =>
      coalesce(when(v.isNotNull, concat(lit("," + k + "="), escTag(v))), lit(""))
    }: _*)
    val line = concat(tagPart, lit(" "), concat_ws(",", fieldParts: _*), lit(" "),
      timeNs.cast("string"))
    // a row with every field null would render a field-less line, which the
    // server rejects (failing the whole chunk) — emit null instead; write()
    // drops null lines
    when(coalesce(fieldParts: _*).isNotNull, line)
  }

  /** POST the payload to `<baseUrl>/write?db=<db>`. Serializable; one HTTP
    * client per executor (reused across chunks).
    */
  def httpTransport(baseUrl: String, db: String): String => Int = {
    val post = new ElasticsearchSink.SerializableHttpPost(
      s"$baseUrl/write?db=$db", "text/plain; charset=utf-8")
    (s: String) => post(s).status // Influx has no per-item result body
  }

  /** Write a (micro-)batch of line-protocol strings (first column). Null
    * lines — all-null-fields rows, or a null timestamp — cannot be sent
    * (the server would reject the whole chunk) and are counted as client
    * errors rather than silently vanishing.
    */
  def write(lines: DataFrame, transport: String => Int,
            maxLinesPerPost: Int = 1000,
            maxRetries: Int = 0, backoffMs: Long = 100): ElasticsearchSink.Stats = {
    val c = col(lines.columns.head).cast("string")
    val all = lines.select(c.as("line"))
    // nulls are counted inside the same single pass that posts the valid
    // lines — a second action over a non-deterministic upstream could
    // disagree with the posted set. Influx has no per-item result body
    // (204 = all accepted), so the status-only transport loses nothing.
    ElasticsearchSink.postChunks(all,
      (s: String) => ElasticsearchSink.HttpResult(transport(s)), maxLinesPerPost,
      sep = "\n", suffix = "", countNullAsClientError = true, maxRetries, backoffMs)
  }

}
