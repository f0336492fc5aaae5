package graft.connect

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Kinesis as a DataSource V2 micro-batch stream — the Spark-native shape
  * of the reference's per-shard consumer (libraries/kspp-kinesis/
  * kinesis_source.h:14-87): offsets are per-shard sequence numbers in the
  * checkpointed offset log, and each micro-batch reads ALL shards in
  * parallel, one input partition per shard (the reference binds one
  * consumer per partition index; here every executor takes a shard).
  *
  * {{{
  * spark.readStream.format("graft.connect.KinesisV2Provider")
  *   .option("stream", "events").option("startingPosition", "TRIM_HORIZON")
  *   .load()  // → (key, value, event_time_ms, shard, sequence_number)
  * }}}
  *
  * Kinesis exposes no cheap per-shard tip, so `latestOffset` probes one
  * bounded GetRecords page per shard from the driver to pick the batch end
  * (the reference's single consumer thread reads every record once on one
  * thread anyway — the probe is the price of fanning the real read out to
  * executors). The transport is the same pluggable `(target, body) → json`
  * as [[KinesisClient]], selected by factory class name so tests inject a
  * scripted ledger.
  */
trait KinesisTransportFactory extends Serializable {
  def create(options: Map[String, String]): (String, String) => String
}

/** Production factory: SigV4-signed HTTP with env credentials. */
final class HttpKinesisTransportFactory extends KinesisTransportFactory {
  override def create(options: Map[String, String]): (String, String) => String =
    KinesisClient.httpTransport(
      region = options.getOrElse("region", sys.env.getOrElse("AWS_REGION", "us-east-1")),
      endpointOverride = options.get("endpoint").orElse(sys.env.get("AWS_CUSTOM_ENDPOINT")))
}

final class KinesisV2Provider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-kinesis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KinesisV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new KinesisV2.KinesisTable(KinesisV2.Conf(properties.asScala.toMap))
  override def supportsExternalMetadata(): Boolean = false
}

object KinesisV2 {

  /** Record columns, matching the reference mapping
    * (kinesis_consumer.cpp:188-196) plus shard/sequence lineage.
    */
  val schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType),
    StructField("event_time_ms", LongType), StructField("shard", StringType),
    StructField("sequence_number", StringType)))

  final case class Conf(options: Map[String, String]) {
    private def opt(name: String): Option[String] =
      options.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    val stream: String = opt("stream").getOrElse(sys.error("graft-kinesis: missing option stream"))
    val startingPosition: String = opt("startingPosition").getOrElse("TRIM_HORIZON")
    val maxRecordsPerShardBatch: Int = opt("maxRecordsPerShardBatch").map(_.toInt).getOrElse(10000)
    val factoryClass: String =
      opt("transportFactory").getOrElse(classOf[HttpKinesisTransportFactory].getName)
    def transport(): (String, String) => String =
      Class.forName(factoryClass).getDeclaredConstructor().newInstance()
        .asInstanceOf[KinesisTransportFactory].create(options)
  }

  /** shardId → last consumed sequence number (absent = not started). */
  final case class KinesisOffset(shards: Map[String, String]) extends Offset {
    override def json(): String = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.createObjectNode()
      shards.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
      node.toString
    }
  }

  object KinesisOffset {
    def fromJson(json: String): KinesisOffset = {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      val b = Map.newBuilder[String, String]
      n.properties().asScala.foreach(e => b += e.getKey -> e.getValue.asText())
      KinesisOffset(b.result())
    }
  }

  final class KinesisTable(conf: Conf) extends Table with SupportsRead {
    override def name(): String = s"graft-kinesis(${conf.stream})"
    override def schema(): StructType = KinesisV2.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder with Scan {
        override def build(): Scan = this
        override def readSchema(): StructType = KinesisV2.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KinesisMicroBatchStream(conf)
      }
  }

  final class KinesisMicroBatchStream(conf: Conf)
      extends MicroBatchStream with SupportsAdmissionControl {
    @transient private lazy val transport = conf.transport()

    // First sequence the probe saw for a shard not yet in the offset map —
    // the partition reader must start AT this sequence, not re-resolve
    // LATEST (a later LATEST iterator would skip the probed records).
    // Driver-local hint: on the rare recovery path where a batch replans
    // without a prior probe, the reader falls back to TRIM_HORIZON plus the
    // sequence-range filter (at-least-once from an earlier position).
    @volatile private var firstSeqHints: Map[String, String] = Map.empty

    override def initialOffset(): Offset = KinesisOffset(Map.empty)
    override def deserializeOffset(json: String): Offset = KinesisOffset.fromJson(json)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
    override def latestOffset(): Offset =
      throw new UnsupportedOperationException("paced via SupportsAdmissionControl")
    // NOTE: the maxRows limit this source emits (and therefore receives
    // back in latestOffset) is interpreted PER SHARD, matching the option
    // name `maxRecordsPerShardBatch` — shards are Kinesis's unit of
    // ordered, rate-limited consumption (GetRecords caps are per shard), so
    // per-shard pacing is the semantics a Kinesis user configures. Spark's
    // ReadLimit plumbing conventionally bounds the whole batch, but the
    // only producer of a maxRows limit here is this very source's
    // getDefaultReadLimit (admission control echoes it back, possibly
    // wrapped in a composite by Trigger.AvailableNow), so no whole-batch
    // contract is violated; a batch admits at most
    // numShards × maxRecordsPerShardBatch rows.
    override def getDefaultReadLimit: ReadLimit =
      ReadLimit.maxRows(conf.maxRecordsPerShardBatch.toLong)

    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val s = start.asInstanceOf[KinesisOffset]
      // per-shard cap — see the getDefaultReadLimit note
      def rowCap(l: ReadLimit): Int = l match {
        case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
          r.maxRows().min(Int.MaxValue.toLong).toInt
        case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
          c.getReadLimits.map(rowCap(_)).min
        case _ => conf.maxRecordsPerShardBatch
      }
      val cap = rowCap(limit)
      val shards = KinesisClient.listShards(transport, conf.stream)
      val hints = new java.util.concurrent.ConcurrentHashMap[String, String]()
      // shard probes are independent blocking HTTP loops: run them
      // concurrently (bounded pool) — serialized, a 100-shard stream pays
      // 100 × the per-shard round-trip latency on EVERY trigger
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(math.max(shards.size, 1), 16))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      def probeShard(shard: String): (String, Option[String]) = {
        var it: Option[String] = Some(KinesisClient.shardIteratorOrHorizon(transport, conf.stream, shard,
          iteratorType = s.shards.get(shard).map(_ => "AFTER_SEQUENCE_NUMBER")
            .getOrElse(conf.startingPosition),
          startingSequenceNumber = s.shards.get(shard)))
        // follow the iterator through empty mid-shard pages (idle/aged
        // segments legitimately return zero records with a next iterator)
        // until records arrive, the shard reports caught-up, or a bounded
        // number of hops — a single-page probe would stall such a shard
        // forever at the same offset
        var endSeq = s.shards.get(shard)
        var firstSeq: Option[String] = None
        var remaining = cap
        var hops = 0
        var caughtUp = false
        while (it.isDefined && !caughtUp && remaining > 0 && hops < 100) {
          val page = KinesisClient.getRecords(transport, it.get, limit = remaining)
          page.records.foreach { r =>
            require(r.sequenceNumber.nonEmpty,
              s"GetRecords response missing SequenceNumber (shard $shard)")
          }
          if (firstSeq.isEmpty) firstSeq = page.records.headOption.map(_.sequenceNumber)
          endSeq = page.records.lastOption.map(_.sequenceNumber).orElse(endSeq)
          remaining -= page.records.size
          caughtUp = page.records.isEmpty && page.millisBehindLatest.forall(_ == 0L)
          it = page.nextIterator
          hops += 1
        }
        if (s.shards.get(shard).isEmpty) firstSeq.foreach(hints.put(shard, _))
        shard -> endSeq
      }
      val ends =
        try {
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration.Duration
          Await.result(Future.traverse(shards)(sh => Future(probeShard(sh))), Duration.Inf)
        } finally pool.shutdown()
      import scala.jdk.CollectionConverters._
      firstSeqHints = firstSeqHints ++ hints.asScala
      KinesisOffset(ends.collect { case (sh, Some(seq)) => sh -> seq }.toMap)
    }

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val (s, e) = (start.asInstanceOf[KinesisOffset], end.asInstanceOf[KinesisOffset])
      e.shards.toSeq.sortBy(_._1).flatMap { case (shard, toSeq) =>
        val fromSeq = s.shards.get(shard)
        if (fromSeq.contains(toSeq)) None // no progress on this shard
        else Some(KinesisInputPartition(shard, fromSeq, firstSeqHints.get(shard), toSeq))
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new KinesisReaderFactory(conf)
  }

  final case class KinesisInputPartition(shard: String, fromSeq: Option[String],
                                         firstSeq: Option[String],
                                         toSeq: String) extends InputPartition

  final class KinesisReaderFactory(conf: Conf) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[KinesisInputPartition]
      new KinesisPartitionReader(conf, p)
    }
  }

  /** Executor-side shard range read: (fromSeq, toSeq] via AFTER_SEQUENCE
    * iterators. Sequence numbers within one shard are increasing decimal
    * strings, compared numerically.
    */
  final class KinesisPartitionReader(conf: Conf, p: KinesisInputPartition)
      extends PartitionReader[InternalRow] {
    private val transport = conf.transport()
    private val target = BigInt(p.toSeq)
    // never re-resolve LATEST here: the batch end was fixed by the driver
    // probe, and a fresh LATEST iterator would start after those records.
    // Start AFTER fromSeq, or AT the probe's first-seen sequence; with
    // neither (recovery replan), replay from TRIM_HORIZON — the range
    // filter below still upper-bounds at the committed batch end.
    private val (itType, itSeq) = (p.fromSeq, p.firstSeq) match {
      case (Some(from), _) => ("AFTER_SEQUENCE_NUMBER", Some(from))
      case (None, Some(first)) => ("AT_SEQUENCE_NUMBER", Some(first))
      case (None, None) => ("TRIM_HORIZON", None)
    }
    private var iterator: Option[String] = Some(
      KinesisClient.shardIteratorOrHorizon(transport, conf.stream, p.shard,
        iteratorType = itType, startingSequenceNumber = itSeq))
    private var buffer: Iterator[KinesisClient.KRecord] = Iterator.empty
    private var reachedEnd = false
    private var current: KinesisClient.KRecord = _

    override def next(): Boolean = {
      while (!buffer.hasNext && !reachedEnd && iterator.isDefined) {
        val page = KinesisClient.getRecords(transport, iterator.get)
        page.records.foreach { r =>
          require(r.sequenceNumber.nonEmpty,
            s"GetRecords response missing SequenceNumber (shard ${p.shard})")
        }
        val inRange = page.records.takeWhile(r => BigInt(r.sequenceNumber) <= target)
        reachedEnd = inRange.size < page.records.size ||
          inRange.lastOption.exists(r => BigInt(r.sequenceNumber) == target) ||
          (page.records.isEmpty && page.millisBehindLatest.forall(_ == 0L))
        buffer = inRange.iterator
        iterator = page.nextIterator
      }
      if (buffer.hasNext) { current = buffer.next(); true } else false
    }

    override def get(): InternalRow = new GenericInternalRow(Array[Any](
      UTF8String.fromString(current.key),
      UTF8String.fromString(new String(current.value, UTF_8)),
      current.eventTimeMs,
      UTF8String.fromString(p.shard),
      UTF8String.fromString(current.sequenceNumber)))

    override def close(): Unit = ()
  }
}
