package graft.serde

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Confluent wire-format avro serde (reference:
  * include/kspp/serdes/avro_serdes.h:80-104): payload = magic byte 0x00 +
  * 4-byte big-endian schema id + avro binary body. The registry is
  * abstracted so tests run against an in-memory one; a production
  * implementation would back [[SchemaRegistry]] with the HTTP registry the
  * reference talks to.
  */
object ConfluentAvro {

  val MagicByte: Byte = 0x00

  trait SchemaRegistry extends Serializable {
    def register(subject: String, schema: Schema): Int
    def get(id: Int): Schema

    /** Per-INSTANCE reader cache for the hot decode path: readers are pure
      * per schema, and the schema id repeats for millions of rows within a
      * partition. Deliberately NOT a JVM-global map — every Spark task
      * deserializes a fresh registry from the UDF closure, so a global map
      * keyed by registry identity would miss on every task AND pin one
      * never-evicted entry per task for the executor's lifetime.
      * `@transient lazy`: rebuilt empty on each deserialization.
      */
    @transient private lazy val readers =
      new TrieMap[Int, GenericDatumReader[GenericRecord]]()
    private[serde] def readerFor(id: Int): GenericDatumReader[GenericRecord] =
      readers.getOrElseUpdate(id, new GenericDatumReader[GenericRecord](get(id)))
  }

  /** Offline/test registry with stable content-addressed ids. */
  final class InMemorySchemaRegistry extends SchemaRegistry {
    private val byId = new TrieMap[Int, String]()
    private val byFp = new TrieMap[String, Int]()
    private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)
    def register(subject: String, schema: Schema): Int = {
      val key = subject + "|" + schema.toString
      byFp.getOrElseUpdate(key, {
        val id = nextId.getAndIncrement()
        byId.put(id, schema.toString)
        id
      })
    }
    def get(id: Int): Schema =
      new Schema.Parser().parse(byId.getOrElse(id, sys.error(s"unknown schema id $id")))
  }

  /** Registry from the reference's comma-separated url-list config string
    * (split_url_list with the default http scheme, as
    * schema_registry_client parses its `urls` setting).
    */
  def httpRegistry(urlList: String, timeoutMs: Int = 10000): HttpSchemaRegistry =
    new HttpSchemaRegistry(
      graft.connect.ClusterUri.splitUrlList(urlList, defaultScheme = "http").map(_.str),
      timeoutMs)

  /** HTTP-backed registry speaking the Confluent subjects API the reference
    * uses (src/schema_registry/confluent_http_proxy.cpp:140-176 register,
    * :260-290 fetch): POST `/subjects/<subject>/versions` with a
    * `{"schema": "..."}` body → `{"id": N}`, GET `/schemas/ids/<id>` →
    * `{"schema": "..."}`. Multiple base URLs are tried in order,
    * first-success (the reference's SEQUENTIAL/FIRST_SUCCESS work policy);
    * both directions cache, so decode hot paths never re-fetch.
    */
  final class HttpSchemaRegistry(baseUrls: Seq[String],
                                 timeoutMs: Int = 10000) extends SchemaRegistry {
    require(baseUrls.nonEmpty, "at least one registry url")
    // explicit connect/request timeouts: a black-holed url must fail over
    // to the next base url, not hang the decode path forever
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong)).build()
    private def withTimeout(b: java.net.http.HttpRequest.Builder) =
      b.timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
    @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    @transient private lazy val idCache = new TrieMap[Int, Schema]()
    @transient private lazy val regCache = new TrieMap[String, Int]()

    private def firstSuccess[T](f: String => T): T = {
      var lastErr: Throwable = null
      baseUrls.foreach { base =>
        try return f(base.stripSuffix("/"))
        catch { case e: Exception => lastErr = e }
      }
      throw new IllegalStateException(s"all registry urls failed", lastErr)
    }

    override def register(subject: String, schema: Schema): Int = {
      val key = subject + "|" + schema.toString
      regCache.getOrElseUpdate(key, firstSuccess { base =>
        val body = mapper.createObjectNode().put("schema", schema.toString).toString
        val req = withTimeout(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"$base/subjects/$subject/versions"))
          .header("Content-Type", "application/vnd.schemaregistry.v1+json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))).build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() / 100 == 2, s"register failed: ${resp.statusCode()} ${resp.body()}")
        mapper.readTree(resp.body()).get("id").asInt()
      })
    }

    // the PARSED schema is cached (Schema is immutable): the per-record
    // decode path must not re-run the avro schema parser each call
    override def get(id: Int): Schema =
      idCache.getOrElseUpdate(id, firstSuccess { base =>
        val req = withTimeout(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"$base/schemas/ids/$id"))
          .header("Accept", "application/vnd.schemaregistry.v1+json")
          .GET()).build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() / 100 == 2, s"schema $id fetch failed: ${resp.statusCode()}")
        new Schema.Parser().parse(mapper.readTree(resp.body()).get("schema").asText())
      })
  }

  /** magic + schema id + binary-encoded record. */
  def encode(record: GenericRecord, schemaId: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(MagicByte.toInt)
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](record.getSchema).write(record, enc)
    enc.flush()
    out.toByteArray
  }

  final case class Framed(schemaId: Int, body: Array[Byte])

  def deframe(bytes: Array[Byte]): Framed = {
    require(bytes.length >= 5 && bytes(0) == MagicByte, "not Confluent-framed avro")
    Framed(ByteBuffer.wrap(bytes, 1, 4).getInt, bytes.drop(5))
  }

  def decode(bytes: Array[Byte], registry: SchemaRegistry): GenericRecord = {
    require(bytes.length >= 5 && bytes(0) == MagicByte, "not Confluent-framed avro")
    val schemaId = ByteBuffer.wrap(bytes, 1, 4).getInt
    // per-record decode is the hot path: the registry instance caches one
    // reader per schema id (SchemaRegistry.readerFor), and the decoder
    // reads straight from the framed buffer at offset 5 — no per-record
    // reader allocation, no payload copy
    val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    registry.readerFor(schemaId).read(null, dec)
  }

  /** Column-level decoder: framed binary → JSON string, which `from_json`
    * with the matching StructType turns into typed columns. The JSON hop
    * keeps the UDF schema-agnostic (the reference's `generic_avro` dynamic
    * path); pin a StructType downstream for the static path.
    */
  def decodeToJsonUdf(registry: SchemaRegistry): Column => Column = {
    val f = udf { bytes: Array[Byte] =>
      if (bytes == null) null
      else {
        val rec = decode(bytes, registry)
        rec.toString // Avro GenericRecord#toString is its JSON encoding
      }
    }
    (c: Column) => f(c)
  }
}
