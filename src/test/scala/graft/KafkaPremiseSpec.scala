package graft

import org.scalatest.funsuite.AnyFunSuite

/** COMMITTED failed-premise evidence for the Kafka source/sink wrappers
  * (the [[CodecPremiseSpec]] pattern): the round-8 finding that no Kafka
  * client artifact exists in this container — which is why
  * [[graft.sources.KafkaSource]] / the Kafka sink wrapper carry option
  * mappings and murmur2 partitioning unit tests but no embedded-broker
  * end-to-end spec — becomes a test that FAILS the day the environment
  * gains the artifact, flagging that the e2e work is now possible and owed.
  *
  * Claim: neither kafka-clients, an embeddable broker, nor Spark's
  * spark-sql-kafka connector can be loaded here —
  *
  *  1. `/opt/spark/jars` (the unmanaged classpath) ships no kafka jar;
  *  2. the pre-warmed coursier cache contains no kafka artifact, and
  *     build.sbt pins COURSIER_MODE=offline so resolution of one fails
  *     not-found (machine-verified in round 8 with an explicit
  *     `org.apache.kafka:kafka-clients:3.7.0` resolution attempt);
  *  3. consequently Spark's `format("kafka")` cannot bind a provider.
  *
  * If ANY assertion below fails, the premise has changed: write the
  * embedded-broker end-to-end spec (produce → stream → transform → sink →
  * consume, murmur2-routed) and drop the "partial" qualifier from the
  * Kafka rows in SURVEY §2.
  */
class KafkaPremiseSpec extends AnyFunSuite {

  test("no Kafka client, broker, or Spark connector class is loadable") {
    val knownEntryPoints = Seq(
      "org.apache.kafka.clients.producer.KafkaProducer", // kafka-clients
      "org.apache.kafka.clients.consumer.KafkaConsumer",
      "kafka.server.KafkaServer", // broker (embedded-broker tests)
      "kafka.testkit.KafkaClusterTestKit",
      "org.apache.kafka.common.test.KafkaClusterTestKit", // post-3.8 testkit home
      "io.github.embeddedkafka.EmbeddedKafka", // test-scope embedded brokers
      "org.springframework.kafka.test.EmbeddedKafkaBroker",
      "org.apache.spark.sql.kafka010.KafkaSourceProvider") // spark-sql-kafka
    val present = knownEntryPoints.filter { cls =>
      try { Class.forName(cls); true }
      catch { case _: Throwable => false }
    }
    assert(present.isEmpty,
      s"Kafka classes appeared on the classpath: $present — the round-8 " +
        "failed-premise note no longer holds; write the embedded-broker " +
        "e2e spec for KafkaSource/KafkaSink")
  }

  test("no DataSourceRegister claims the 'kafka' short name") {
    import scala.jdk.CollectionConverters._
    val claimants = java.util.ServiceLoader
      .load(classOf[org.apache.spark.sql.sources.DataSourceRegister])
      .asScala
      .flatMap(r => try Some(r.shortName()) catch { case _: Throwable => None })
      .filter(_.equalsIgnoreCase("kafka"))
      .toSeq
    assert(claimants.isEmpty,
      "a 'kafka' DataSource provider registered — format(\"kafka\") is now " +
        "live; the wrappers' untested-e2e caveat must be replaced by a real " +
        "streaming round-trip spec")
  }

  test("no kafka artifact exists on the classpath path entries or in the dependency cache") {
    val classpathHits = sys.props.getOrElse("java.class.path", "")
      .split(java.io.File.pathSeparator)
      .filter(_.toLowerCase.contains("kafka"))
      .toSeq
    assert(classpathHits.isEmpty, s"kafka jars on java.class.path: $classpathHits")

    // the pre-warmed offline coursier cache — the only place a new
    // dependency could legally come from (build.sbt: COURSIER_MODE=offline)
    val cache = new java.io.File(
      sys.props.getOrElse("user.home", "/root") + "/.cache/coursier")
    def scan(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).iterator.flatten.flatMap(scan)
      else Iterator.single(f)
    val cacheHits =
      if (!cache.exists()) Seq.empty
      else scan(cache).filter(_.getName.toLowerCase.contains("kafka")).take(5).toSeq
    assert(cacheHits.isEmpty,
      s"kafka artifacts appeared in the coursier cache: $cacheHits — " +
        "resolution is now possible; add the e2e spec")
  }
}
