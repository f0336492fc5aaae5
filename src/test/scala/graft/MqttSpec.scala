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

  test("CONNECT advertises keep-alive 0: the client never pings, so it must not promise to") {
    // the keep-alive u16 sits right after the "MQTT" string + level + flags
    val c = MqttCodec.connect("cid")
    val in = new DataInputStream(new java.io.ByteArrayInputStream(c))
    val p = MqttCodec.readPacket(in)
    val ka = ((p.body(8) & 0xff) << 8) | (p.body(9) & 0xff)
    assert(ka == 60, "the codec default stays 60 for broker-side tests")
    // ...but the CLIENT must connect with 0 ([MQTT-3.1.2-24]: a nonzero
    // value lets the broker disconnect a quiet receive-only drain at
    // 1.5x the interval — this client sends no PINGREQ)
    val c0 = MqttCodec.connect("cid", keepAliveSecs = 0)
    val p0 = MqttCodec.readPacket(new DataInputStream(new java.io.ByteArrayInputStream(c0)))
    assert((((p0.body(8) & 0xff) << 8) | (p0.body(9) & 0xff)) == 0)
    val broker = new FakeBroker()
    try {
      val cl = new MqttClient("127.0.0.1", broker.server.getLocalPort, "ka-test")
      try cl.publish("t", "v".getBytes(UTF_8)) finally cl.close()
    } finally broker.close()
  }

  test("idle timeout returns None and keeps the stream reusable; mid-packet timeout raises") {
    // idle: zero bytes arrive — None, then a subsequent full packet parses
    val server = new ServerSocket(0)
    try {
      val t = new Thread(() => {
        val s = server.accept()
        val out = new DataOutputStream(s.getOutputStream)
        Thread.sleep(1200) // client times out at 150ms first (wide margin
        // against suite-load scheduling delays: the idle read must finish
        // long before this send)
        out.write(MqttCodec.publish("t", "late".getBytes(UTF_8), qos = 0)); out.flush()
        Thread.sleep(1500) // hold the socket open
        s.close()
      })
      t.setDaemon(true); t.start()
      val s = new Socket("127.0.0.1", server.getLocalPort)
      s.setSoTimeout(150)
      val in = new DataInputStream(s.getInputStream)
      assert(MqttCodec.readPacketOrIdle(in).isEmpty, "idle wire must read as None")
      s.setSoTimeout(5000)
      val p = MqttCodec.readPacketOrIdle(in)
      assert(p.exists(_.ptype == MqttCodec.PUBLISH),
        "the stream must stay in sync across an idle timeout")
      s.close()
    } finally server.close()
    // mid-packet: header byte delivered, body never arrives — IOException,
    // NOT a silent None that would resume parsing mid-packet
    val server2 = new ServerSocket(0)
    try {
      val t2 = new Thread(() => {
        val s = server2.accept()
        val out = new DataOutputStream(s.getOutputStream)
        out.write(0x30); out.flush() // PUBLISH header, then stall
        Thread.sleep(2000)
        s.close()
      })
      t2.setDaemon(true); t2.start()
      val s = new Socket("127.0.0.1", server2.getLocalPort)
      s.setSoTimeout(200)
      val in = new DataInputStream(s.getInputStream)
      val e = intercept[java.io.IOException](MqttCodec.readPacketOrIdle(in))
      assert(e.getMessage.contains("desynchronized"), e.getMessage)
      s.close()
    } finally server2.close()
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
