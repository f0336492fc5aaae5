package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import graft.connect.{MqttClient, MqttCodec, MqttSink, MqttSource}

/** MQTT connector tests against an in-process broker speaking real MQTT
  * 3.1.1 over loopback TCP — the codec, the client handshake, the sink's
  * tombstone-skip semantics (reference mqtt_producer.cpp:110-114) and the
  * source drain all exercise genuine socket round trips.
  */
class MqttSpec extends SparkSpec {

  test("remaining-length varint round-trips at the spec boundaries") {
    // Spec §2.2.3 table: 0, 127 are 1 byte; 128, 16383 are 2; 16384 is 3.
    assert(MqttCodec.remainingLength(0).toSeq == Seq(0x00.toByte))
    assert(MqttCodec.remainingLength(127).toSeq == Seq(0x7f.toByte))
    assert(MqttCodec.remainingLength(128).toSeq == Seq(0x80.toByte, 0x01.toByte))
    assert(MqttCodec.remainingLength(16383).toSeq == Seq(0xff.toByte, 0x7f.toByte))
    assert(MqttCodec.remainingLength(16384).toSeq == Seq(0x80.toByte, 0x80.toByte, 0x01.toByte))
    // decode side: a >127-byte PUBLISH body survives framing
    val big = MqttCodec.publish("t", Array.fill(300)('x'.toByte), qos = 0)
    val in = new DataInputStream(new java.io.ByteArrayInputStream(big))
    val p = MqttCodec.readPacket(in)
    val (topic, pid, payload) = MqttCodec.decodePublish(p)
    assert(topic == "t" && pid.isEmpty && payload.length == 300)
  }

  /** Minimal in-process broker: CONNACKs, records publishes (PUBACK-ing
    * QoS 1), answers SUBSCRIBE with SUBACK followed by a scripted message
    * list. One thread per connection, so concurrent sink partitions work.
    */
  private final class FakeBroker(scripted: Seq[(String, Array[Byte])] = Nil) extends AutoCloseable {
    val server = new ServerSocket(0)
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Int)]()
    @volatile private var running = true
    private val acceptor = new Thread(() => {
      try {
        while (running) {
          val s = server.accept()
          new Thread(() => serve(s)).start()
        }
      } catch { case _: Exception => } // server closed
    })
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(s: Socket): Unit = {
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      try {
        val c = MqttCodec.readPacket(in)
        assert(c.ptype == MqttCodec.CONNECT)
        out.write(MqttCodec.connack(sessionPresent = false, returnCode = 0)); out.flush()
        while (true) {
          val p = MqttCodec.readPacket(in)
          p.ptype match {
            case MqttCodec.PUBLISH =>
              val (topic, pid, payload) = MqttCodec.decodePublish(p)
              received.add((topic, new String(payload, UTF_8), (p.flags >> 1) & 3))
              pid.foreach { id => out.write(MqttCodec.puback(id)); out.flush() }
            case MqttCodec.SUBSCRIBE =>
              out.write(MqttCodec.suback(MqttCodec.decodePacketId(p), 0)); out.flush()
              scripted.foreach { case (t, v) =>
                out.write(MqttCodec.publish(t, v, qos = 0)); out.flush()
              }
            case MqttCodec.PINGREQ => out.write(MqttCodec.pingresp); out.flush()
            case MqttCodec.DISCONNECT => s.close(); return
            case _ =>
          }
        }
      } catch { case _: Exception => } // client gone
    }

    def port: Int = server.getLocalPort
    override def close(): Unit = { running = false; server.close() }
  }

  test("client handshake + QoS1 publish round-trips through a real socket") {
    val broker = new FakeBroker()
    try {
      val client = new MqttClient("127.0.0.1", broker.port, "t1")
      val n = client.publish("sensors/a", "42".getBytes(UTF_8), qos = 1)
      client.close()
      assert(n == 2)
      val got = broker.received.poll()
      assert(got == (("sensors/a", "42", 1)))
    } finally broker.close()
  }

  test("sink publishes key→topic, skips tombstones, counts inserted/bytes") {
    val broker = new FakeBroker()
    try {
      import spark.implicits._
      val batch = Seq(
        ("sensors/a", "1"), ("sensors/b", "22"), ("sensors/a", null: String)
      ).toDF("key", "value")
      val stats = MqttSink.write(batch, "127.0.0.1", broker.port, qos = 1)
      assert(stats.inserted == 2)
      assert(stats.bytesSent == 3) // "1" + "22"
      assert(stats.skippedDeletes == 1) // reference: null value never published
      val got = Iterator.continually(broker.received.poll()).takeWhile(_ != null).toSet
      assert(got == Set(("sensors/a", "1", 1), ("sensors/b", "22", 1)))
    } finally broker.close()
  }

  test("drainBytes preserves non-UTF-8 binary payloads losslessly") {
    // 0x80 0x81 is invalid UTF-8; a string hop would turn it into U+FFFD
    val payload = Array[Byte](0x80.toByte, 0x81.toByte, 0x00, 0x7f)
    val broker = new FakeBroker(scripted = Seq(("bin/1", payload)))
    try {
      val df = MqttSource.drainBytes(spark, "127.0.0.1", broker.port, "bin/#",
        maxMessages = 1, idleTimeoutMs = 2000)
      val row = df.collect().head
      assert(row.getString(0) == "bin/1")
      assert(row.getAs[Array[Byte]](1).toSeq == payload.toSeq)
    } finally broker.close()
  }

  test("source subscribes and drains scripted messages into (key,value,ts) rows") {
    val broker = new FakeBroker(scripted = Seq(
      ("t/1", "hello".getBytes(UTF_8)), ("t/2", "world".getBytes(UTF_8))))
    try {
      val df = MqttSource.drain(spark, "127.0.0.1", broker.port, "t/#",
        maxMessages = 2, idleTimeoutMs = 2000)
      val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(rows == Seq(("t/1", "hello"), ("t/2", "world")))
      assert(df.columns.toSeq == Seq("key", "value", "event_time_ms"))
    } finally broker.close()
  }
}
