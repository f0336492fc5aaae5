package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sink wrappers mirroring the reference's sink set (reference: the sinks
  * headers, kspp-pg / kspp-es tools).
  */
object Sinks {

  /** Kafka topic sink with the reference's producer-compatible default
    * partitioner (sinks/kafka_sink.h:13-280): partition = murmur2(key bytes)
    * masked positive, mod partition count — so records land on the same
    * partitions a librdkafka/Java producer would send them to. Retry /
    * queue-full handling is the connector's job.
    */
  /** The reference's default producer partition for a binary key:
    * `murmur2(key) & 0x7fffffff % numPartitions` (kspp.h:283-296 /
    * librdkafka / Java producer). Requires `GraftFunctions.register`.
    */
  def kafkaPartition(key: org.apache.spark.sql.Column, numPartitions: Int): org.apache.spark.sql.Column =
    pmod(call_function("kafka_murmur2", key).bitwiseAND(lit(0x7fffffff)), lit(numPartitions))

  def kafka(df: DataFrame, brokers: String, topic: String,
            keyCol: String, valueCol: String,
            numPartitions: Option[Int] = None): DataStreamWriter[org.apache.spark.sql.Row] = {
    var out = df.select(
      col(keyCol).cast("binary").as("key"),
      col(valueCol).cast("binary").as("value"))
    numPartitions.foreach { n =>
      out = out.withColumn("partition", kafkaPartition(col("key"), n))
    }
    out.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
  }

  /** Tumbling-window bucket start in epoch millis — the single definition
    * of the rotation rule shared by the parquet and avro windowed sinks
    * (sinks/avro_file_sink.h:58-96 rotation).
    */
  def windowStartMs(eventTime: org.apache.spark.sql.Column, windowMs: Long): org.apache.spark.sql.Column =
    floor(unix_millis(eventTime) / windowMs).cast("long") * windowMs

  /** Event-time-windowed file sink (sinks/avro_file_sink.h:58-96): the
    * reference rotates one file per event-time window; the Spark analog is a
    * directory partition per window bucket, giving the same
    * one-file-set-per-window layout plus partition pruning on read.
    * Format is parquet/avro-agnostic (`format` param).
    */
  def windowedFiles(df: DataFrame, eventTimeCol: String, windowMs: Long,
                    path: String, format: String = "parquet"): Unit =
    df.withColumn("window_start", timestamp_millis(windowStartMs(col(eventTimeCol), windowMs)))
      .write.partitionBy("window_start").format(format).mode("append").save(path)

  /** Streaming variant: append mode with a checkpoint, one partition dir per
    * window as files arrive.
    */
  def windowedFileStream(df: DataFrame, eventTimeCol: String, windowMs: Long,
                         path: String, checkpoint: String,
                         format: String = "parquet"): DataStreamWriter[org.apache.spark.sql.Row] =
    df.withColumn("window_start", timestamp_millis(windowStartMs(col(eventTimeCol), windowMs)))
      .writeStream.partitionBy("window_start").format(format)
      .option("path", path).option("checkpointLocation", checkpoint)

  /** Test/debug sinks (null_sink / array_sink / stream_sink → console,
    * memory, collect are Spark built-ins; nothing to wrap).
    */

  /** Bucketed, sorted table write — the 100 TB co-located join path
    * (SURVEY §9): both sides of a recurring equi-join written with the same
    * `numBuckets`/`keys` are read pre-partitioned, so the join (and
    * aggregations on the keys) runs with NO exchange at all. This is the
    * Spark-native analog of the reference's stable Kafka partitioning-by-key
    * contract (repartition.h routes records so downstream joins are
    * co-partitioned); PlanSpec pins the exchange-free plan.
    */
  /** DROP TABLE plus its warehouse location. A crashed run can leave the
    * location directory with no catalog entry (a metastore-less session's
    * catalog dies with the JVM; the warehouse directory survives), and the
    * orphan then blocks the next CREATE with LOCATION_ALREADY_EXISTS —
    * so the drop always removes both. The location delete swallows
    * filesystem errors: the catalog drop is the semantic operation, the
    * file cleanup is best-effort hygiene.
    */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    // resolve the REAL location from the catalog BEFORE the drop — a table
    // in a non-default database or created with a custom LOCATION lives
    // nowhere near <warehouse>/<table>, so a path guess would delete the
    // wrong directory (or none). The warehouse-convention fallback remains
    // for the orphan case: a crashed metastore-less JVM leaves the location
    // directory with no catalog entry to resolve.
    val resolved =
      try {
        if (spark.catalog.tableExists(table))
          Some(new org.apache.hadoop.fs.Path(
            spark.sessionState.catalog.getTableMetadata(
              spark.sessionState.sqlParser.parseTableIdentifier(table)).location))
        else None
      } catch { case _: Exception => None }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      // scheme/authority-preserving base (the StateLease.leaseDirFor fix):
      // URI.getPath re-rooted an s3a/hdfs warehouse's orphan fallback onto
      // the DEFAULT filesystem — deleting the wrong path (or none)
      val loc = resolved.getOrElse(new org.apache.hadoop.fs.Path(
        graft.ext.StateLease.warehouseBase(spark.conf.get("spark.sql.warehouse.dir")),
        table))
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    } catch { case _: Exception => () }
    // dropping the table supersedes any maintenance lease on it — a lease
    // stranded by a crashed compaction must not block the rebuilt state
    graft.ext.StateLease.releaseQuiet(spark, table)
  }

  def bucketedTable(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketedTable needs at least one bucket/sort key")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Writes a curated corpus (the output of
    * [[graft.ext.CurationPipeline.run]] or [[graft.ext.Sharding.packByTokens]])
    * into training-shard layout: `path/split=<s>/shard=<n>/` directories, one
    * data file per shard. The repartition on (split, shard) routes each
    * shard's rows to ONE task — without it, every write task holds files for
    * every shard it happens to see (a small-files explosion at 100 TB: tasks
    * × shards part-files instead of one per shard); with it, a shard is one
    * sequential write and downstream training readers stream one file per
    * shard. One shuffle, one job, any shard count.
    *
    * REPLACES `path` (`mode("overwrite")`): a curation rerun supersedes the
    * previous corpus wholesale — deterministic splits/shards mean partial
    * appends could only duplicate rows. Point it at a run-scoped path, not
    * a shared root.
    */
  def writeTrainingShards(df: DataFrame, path: String, format: String = "parquet"): Unit = {
    Seq("split", "shard").foreach(c => require(df.columns.contains(c),
      s"writeTrainingShards needs a '$c' column (run packByTokens/hashSplit first)"))
    df.repartition(col("split"), col("shard"))
      .write.format(format).mode("overwrite")
      .partitionBy("split", "shard")
      .save(path)
  }
}
