package graft.connect

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** MQTT 3.1.1 connector (reference: libraries/kspp-mqtt/mqtt_sink.h:12-103,
  * mqtt_producer.cpp:9-127, mqtt_source.h:11-85). The reference delegates
  * the wire protocol to Paho; here the control-packet codec is written
  * against the public MQTT 3.1.1 spec (OASIS) so the connector is
  * self-contained and unit-testable against an in-process broker — the
  * container has no MQTT runtime.
  *
  * Record contract matches the reference exactly: records are
  * `(key: String, value: String)` where the key is the MQTT topic and the
  * value the payload (mqtt_producer.cpp:117 `make_message(key, *value)`);
  * tombstones (null value) are skipped, not published
  * (mqtt_producer.cpp:110-114 "skipping delete").
  */
object MqttCodec {
  val CONNECT = 1; val CONNACK = 2; val PUBLISH = 3; val PUBACK = 4
  val SUBSCRIBE = 8; val SUBACK = 9; val PINGREQ = 12; val PINGRESP = 13
  val DISCONNECT = 14

  /** One decoded control packet: type, fixed-header flags, variable body. */
  final case class Packet(ptype: Int, flags: Int, body: Array[Byte])

  /** Remaining-length varint: 7 bits per byte, MSB = continuation (spec
    * §2.2.3); at most 4 bytes.
    */
  private[graft] def remainingLength(n: Int): Array[Byte] = {
    require(n >= 0 && n <= 268435455, s"remaining length out of range: $n")
    val out = collection.mutable.ArrayBuffer.empty[Byte]
    var x = n
    while ({
      val digit = x % 128
      x /= 128
      out += (if (x > 0) digit | 0x80 else digit).toByte
      x > 0
    }) ()
    out.toArray
  }

  private def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length <= 0xffff, "MQTT string too long")
    Array((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }

  private def u16(n: Int): Array[Byte] = Array((n >> 8).toByte, (n & 0xff).toByte)

  private def frame(ptype: Int, flags: Int, body: Array[Byte]): Array[Byte] =
    Array(((ptype << 4) | flags).toByte) ++ remainingLength(body.length) ++ body

  def connect(clientId: String, cleanSession: Boolean = true,
              keepAliveSecs: Int = 60,
              user: Option[String] = None, password: Option[String] = None): Array[Byte] = {
    var flags = 0
    if (cleanSession) flags |= 0x02
    if (user.isDefined) flags |= 0x80
    if (password.isDefined) flags |= 0x40
    val body = utf8("MQTT") ++ Array(4.toByte, flags.toByte) ++ u16(keepAliveSecs) ++
      utf8(clientId) ++ user.map(utf8).getOrElse(Array.empty[Byte]) ++
      password.map(utf8).getOrElse(Array.empty[Byte])
    frame(CONNECT, 0, body)
  }

  def connack(sessionPresent: Boolean, returnCode: Int): Array[Byte] =
    frame(CONNACK, 0, Array((if (sessionPresent) 1 else 0).toByte, returnCode.toByte))

  def publish(topic: String, payload: Array[Byte], qos: Int, packetId: Int = 0): Array[Byte] = {
    require(qos == 0 || qos == 1, "only QoS 0/1 supported")
    val body = utf8(topic) ++ (if (qos > 0) u16(packetId) else Array.empty[Byte]) ++ payload
    frame(PUBLISH, qos << 1, body)
  }

  def puback(packetId: Int): Array[Byte] = frame(PUBACK, 0, u16(packetId))

  def subscribe(packetId: Int, topicFilter: String, qos: Int): Array[Byte] =
    frame(SUBSCRIBE, 0x02, u16(packetId) ++ utf8(topicFilter) ++ Array(qos.toByte))

  def suback(packetId: Int, grantedQos: Int): Array[Byte] =
    frame(SUBACK, 0, u16(packetId) ++ Array(grantedQos.toByte))

  def pingreq: Array[Byte] = frame(PINGREQ, 0, Array.empty)
  def pingresp: Array[Byte] = frame(PINGRESP, 0, Array.empty)
  def disconnect: Array[Byte] = frame(DISCONNECT, 0, Array.empty)

  /** Blocking read of one control packet; throws EOFException at EOF. */
  def readPacket(in: DataInputStream): Packet =
    readRest(in, in.readUnsignedByte())

  /** Read a packet, returning None if the wire is IDLE (socket timeout
    * before the first header byte — zero bytes consumed, stream still in
    * sync). A timeout AFTER the header byte means a half-delivered packet:
    * the stream is desynchronized and resuming would parse from its
    * middle, so that surfaces as an IOException instead of a silent None.
    */
  def readPacketOrIdle(in: DataInputStream): Option[Packet] = {
    val h =
      try in.readUnsignedByte()
      catch { case _: java.net.SocketTimeoutException => return None }
    try Some(readRest(in, h))
    catch {
      case e: java.net.SocketTimeoutException =>
        throw new java.io.IOException(
          "socket timeout mid-packet: MQTT stream desynchronized — close the connection", e)
    }
  }

  private def readRest(in: DataInputStream, h: Int): Packet = {
    var len = 0; var mult = 1; var i = 0
    var more = true
    while (more) {
      require(i < 4, "malformed remaining length")
      val d = in.readUnsignedByte()
      len += (d & 0x7f) * mult
      mult *= 128
      more = (d & 0x80) != 0
      i += 1
    }
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(h >> 4, h & 0x0f, body)
  }

  /** Split a PUBLISH body into (topic, packetId-if-qos>0, payload). */
  def decodePublish(p: Packet): (String, Option[Int], Array[Byte]) = {
    require(p.ptype == PUBLISH, s"not a PUBLISH: ${p.ptype}")
    val qos = (p.flags >> 1) & 0x03
    val tlen = ((p.body(0) & 0xff) << 8) | (p.body(1) & 0xff)
    val topic = new String(p.body, 2, tlen, UTF_8)
    var off = 2 + tlen
    val pid = if (qos > 0) {
      off += 2
      Some(((p.body(off - 2) & 0xff) << 8) | (p.body(off - 1) & 0xff))
    } else None
    (topic, pid, p.body.drop(off))
  }

  def decodePacketId(p: Packet): Int = ((p.body(0) & 0xff) << 8) | (p.body(1) & 0xff)
}

/** Minimal blocking MQTT 3.1.1 client over a TCP socket. QoS 1 publishes
  * run with an in-flight window of 1 (publish, then block for PUBACK) —
  * simpler than the reference's 100-deep pending queue
  * (mqtt_producer.cpp:4) and sufficient for per-partition batch writes.
  */
final class MqttClient(host: String, port: Int, clientId: String,
                       connectTimeoutMs: Int = 5000,
                       readTimeoutMs: Int = 30000) extends AutoCloseable {
  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  // acks must arrive within readTimeoutMs — a stalled broker fails the
  // task instead of wedging it on an infinite blocking read
  socket.setSoTimeout(readTimeoutMs)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  private var nextPacketId = 1

  locally {
    // keepAliveSecs = 0 DISABLES the keep-alive contract (MQTT 3.1.1
    // §3.1.2.10): this blocking client never sends PINGREQ, so any
    // nonzero value is a promise it cannot keep — a receive-only drain
    // quieter than 1.5× the advertised interval would be disconnected by
    // the broker mid-batch ([MQTT-3.1.2-24]).
    out.write(MqttCodec.connect(clientId, keepAliveSecs = 0)); out.flush()
    val ack = MqttCodec.readPacket(in)
    require(ack.ptype == MqttCodec.CONNACK && ack.body(1) == 0,
      s"MQTT connect refused: type=${ack.ptype} code=${if (ack.body.length > 1) ack.body(1) else -1}")
  }

  private def freshId(): Int = {
    val id = nextPacketId
    nextPacketId = if (nextPacketId == 0xffff) 1 else nextPacketId + 1
    id
  }

  /** Publish; with qos=1 blocks until the broker PUBACKs. Returns payload
    * bytes written (for the reference's `bytes_sent` metric).
    */
  def publish(topic: String, payload: Array[Byte], qos: Int = 1): Int = {
    val pid = if (qos > 0) freshId() else 0
    out.write(MqttCodec.publish(topic, payload, qos, pid)); out.flush()
    if (qos > 0) {
      socket.setSoTimeout(readTimeoutMs) // receive() may have lowered it
      var acked = false
      while (!acked) {
        val p = MqttCodec.readPacket(in)
        if (p.ptype == MqttCodec.PUBACK && MqttCodec.decodePacketId(p) == pid) acked = true
        else if (p.ptype == MqttCodec.PINGRESP) () // ignore
        else if (p.ptype == MqttCodec.PUBLISH) () // sink-only client: drop
        else throw new IllegalStateException(s"unexpected packet ${p.ptype} while awaiting PUBACK")
      }
    }
    payload.length
  }

  def subscribe(topicFilter: String, qos: Int = 0): Unit = {
    val pid = freshId()
    out.write(MqttCodec.subscribe(pid, topicFilter, qos)); out.flush()
    val ack = MqttCodec.readPacket(in)
    require(ack.ptype == MqttCodec.SUBACK && MqttCodec.decodePacketId(ack) == pid,
      s"subscribe not acked: type=${ack.ptype}")
  }

  /** Receive the next PUBLISH (PUBACK-ing QoS 1), or None when the wire
    * is idle for `timeoutMs`. Idle means zero bytes consumed — the stream
    * stays in sync and the client is reusable; a timeout MID-packet
    * (broker stalled after partial delivery) raises IOException instead
    * of returning None, because resuming would parse from the middle of
    * the half-delivered packet (readPacketOrIdle). PINGRESP and other
    * non-PUBLISH control packets are skipped. (Brokers never send
    * PINGREQ — that packet is client→server only, and this client runs
    * with keep-alive disabled.)
    */
  def receive(timeoutMs: Int): Option[(String, Array[Byte])] = {
    socket.setSoTimeout(timeoutMs)
    var res: Option[(String, Array[Byte])] = None
    var idle = false
    while (res.isEmpty && !idle) {
      MqttCodec.readPacketOrIdle(in) match {
        case None => idle = true
        case Some(p) => p.ptype match {
          case MqttCodec.PUBLISH =>
            val (topic, pid, payload) = MqttCodec.decodePublish(p)
            pid.foreach { id => out.write(MqttCodec.puback(id)); out.flush() }
            res = Some((topic, payload))
          case _ => // PINGRESP / unexpected control packets: skip
        }
      }
    }
    res
  }

  override def close(): Unit = {
    try { out.write(MqttCodec.disconnect); out.flush() } catch { case _: Exception => }
    socket.close()
  }
}

/** Batch/foreachBatch sink with the reference's mqtt_sink record semantics. */
object MqttSink {
  final case class Stats(inserted: Long, bytesSent: Long, skippedDeletes: Long)

  /** Publish `key`/`value` columns (selected by name): key = topic, value
    * = payload; null value = tombstone, skipped (mqtt_producer.cpp:110-114).
    * One connection per partition; counters mirror the reference's
    * `inserted` / `bytes_sent` metrics (mqtt_producer.h via
    * register_metrics). Client ids carry the task attempt id so task
    * retries / speculative copies never collide (MQTT 3.1.1 §3.1.4 makes
    * the broker disconnect an existing session on a duplicate ClientId).
    */
  def write(batch: DataFrame, host: String, port: Int, qos: Int = 1,
            clientIdPrefix: String = "graft",
            keyCol: String = "key", valueCol: String = "value"): Stats = {
    val sc = batch.sparkSession.sparkContext
    val inserted = sc.longAccumulator("mqtt_inserted")
    val bytes = sc.longAccumulator("mqtt_bytes_sent")
    val skipped = sc.longAccumulator("mqtt_skipped_deletes")
    val kv = batch.select(org.apache.spark.sql.functions.col(keyCol),
      org.apache.spark.sql.functions.col(valueCol))
    kv.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val client = new MqttClient(host, port,
          s"$clientIdPrefix-${tc.partitionId()}-${tc.taskAttemptId()}")
        try {
          it.foreach { r =>
            if (r.isNullAt(1)) skipped.add(1)
            else if (r.isNullAt(0))
              // the key IS the topic: silently skipping would lose data, and
              // publishing to "null" would misroute it
              throw new IllegalArgumentException(
                s"MqttSink: null key in column '$keyCol' — the key is the MQTT topic " +
                  "and cannot be null; filter or default keys upstream")
            else {
              val n = client.publish(r.get(0).toString, r.get(1).toString.getBytes(UTF_8), qos)
              inserted.add(1); bytes.add(n)
            }
          }
        } finally client.close()
      }
    }
    Stats(inserted.value, bytes.value, skipped.value)
  }
}

/** Poll-style source mirroring mqtt_source.h:11-85: subscribe, buffer
  * arriving messages, hand them to the engine as `(key, value, event_time)`
  * rows. MQTT has no replayable offsets (the reference's commit() is a
  * no-op, mqtt_source.h:45-47), so this drains the live feed from the
  * driver into a DataFrame per call — the same shape as the CDC drain loop.
  */
object MqttSource {
  /** Drain up to `maxMessages` (or until `idleTimeoutMs` with nothing new).
    * Event time = driver receive time, matching the reference's
    * arrival-stamped records. Values decode as UTF-8 text (the reference's
    * `<string, string>` record type); use [[drainBytes]] when payloads are
    * binary.
    */
  def drain(spark: SparkSession, host: String, port: Int, topicFilter: String,
            maxMessages: Int, idleTimeoutMs: Int = 1000,
            clientId: String = "graft-source"): DataFrame = {
    import spark.implicits._
    drainRaw(host, port, topicFilter, maxMessages, idleTimeoutMs, clientId)
      .map { case (t, p, ts) => (t, new String(p, UTF_8), ts) }
      .toDF("key", "value", "event_time_ms")
  }

  /** [[drain]] with the payload kept as raw bytes — lossless for binary
    * payloads (a UTF-8 string hop would substitute U+FFFD for invalid
    * sequences).
    */
  def drainBytes(spark: SparkSession, host: String, port: Int, topicFilter: String,
                 maxMessages: Int, idleTimeoutMs: Int = 1000,
                 clientId: String = "graft-source"): DataFrame = {
    import spark.implicits._
    drainRaw(host, port, topicFilter, maxMessages, idleTimeoutMs, clientId)
      .toDF("key", "value", "event_time_ms")
  }

  private def drainRaw(host: String, port: Int, topicFilter: String, maxMessages: Int,
                       idleTimeoutMs: Int, clientId: String): Seq[(String, Array[Byte], Long)] = {
    val client = new MqttClient(host, port, clientId)
    val buf = collection.mutable.ArrayBuffer.empty[(String, Array[Byte], Long)]
    try {
      client.subscribe(topicFilter)
      var idle = false
      while (!idle && buf.size < maxMessages) {
        client.receive(idleTimeoutMs) match {
          case Some((topic, payload)) =>
            buf += ((topic, payload, System.currentTimeMillis()))
          case None => idle = true
        }
      }
    } finally client.close()
    buf.toSeq
  }
}
