package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

/** Global processing-time throughput control, the analog of the reference's
  * `thoughput_limiter` [sic] (reference: processors/thoughput_limiter.h:12-85
  * — a single token bucket of capacity 1 on wall-clock time).
  *
  * In a distributed engine, per-record wall-clock throttling is an
  * anti-pattern; the Spark-native mechanism is admission control at the
  * source (`maxOffsetsPerTrigger` / `maxFilesPerTrigger`) plus trigger
  * pacing, which bounds rows/sec per micro-batch without stalling executor
  * threads. [[paceBatches]] adds a driver-side pacing hook for sinks that
  * need a hard cap.
  */
object Throttle {

  /** Source options capping rows per trigger for a target msgs/sec at a
    * given trigger interval.
    *
    * KAFKA-SHAPED SOURCES ONLY by default: `maxOffsetsPerTrigger` is a
    * Kafka (and rate-source) option, and Spark IGNORES unknown source
    * options without error — applied to a FILE source the stream would run
    * completely unthrottled while the caller believes admission control is
    * active (the silent no-op this object's own scaladoc warns against,
    * which is also why there is no file-source default here: a file
    * source's knob is `maxFilesPerTrigger`, a FILE count this row-rate
    * arithmetic cannot derive — pass it explicitly via `optionKey` with
    * your own files-per-trigger math).
    */
  def sourceOptions(messagesPerSec: Long, triggerIntervalMs: Long,
                    optionKey: String = "maxOffsetsPerTrigger"): Map[String, String] = {
    require(messagesPerSec > 0 && triggerIntervalMs > 0,
      s"Throttle.sourceOptions: rates must be positive, got " +
        s"messagesPerSec=$messagesPerSec triggerIntervalMs=$triggerIntervalMs")
    val rows = (messagesPerSec * triggerIntervalMs) / 1000
    // a truncated 0 would make the source admit nothing and the stream
    // stall forever with no error — fail loudly instead of silently parking
    require(rows > 0,
      s"Throttle.sourceOptions: $messagesPerSec msg/s over a " +
        s"$triggerIntervalMs ms trigger rounds to 0 rows per trigger — " +
        "increase the trigger interval")
    Map(optionKey -> rows.toString)
  }

  /** foreachBatch wrapper: if a micro-batch finished faster than its row
    * budget allows, sleep the difference on the driver (executors are idle
    * between batches anyway). Token-bucket with capacity one batch —
    * thoughput_limiter.h's bucket, at batch granularity.
    */
  def paceBatches(writer: DataFrame => Unit, messagesPerSec: Long): (DataFrame, Long) => Unit = {
    // the sourceOptions stance: silently coercing 0 (or a negative value
    // intended as "unlimited") to 1 msg/s would park the driver for
    // n seconds per n-row batch with no error
    require(messagesPerSec > 0,
      s"paceBatches: messagesPerSec must be positive, got $messagesPerSec")
    (batch: DataFrame, _: Long) =>
      val t0 = System.nanoTime()
      val n = batch.persist().count()
      // unpersist in finally: a throwing writer retried by foreachBatch
      // would otherwise stack one leaked cached copy per attempt
      try writer(batch) finally batch.unpersist()
      val budgetMs = (n * 1000) / messagesPerSec
      val spentMs = (System.nanoTime() - t0) / 1000000
      if (spentMs < budgetMs) Thread.sleep(budgetMs - spentMs)
  }
}
