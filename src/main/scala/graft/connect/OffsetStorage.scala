package graft.connect

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** The reference's durable source-offset storage
  * (utils/offset_storage_provider.h:9-98, offset_storage_provider.cpp:16-98):
  * an int64 offset persisted out-of-band of the data, behind pluggable
  * backends selected by URI scheme — `file:`, `s3:`, `null:`
  * (`get_offset_provider`). Commits are buffered: `commit(offset, flush)`
  * only persists when `flush` is set or more than `maxPendingOffsets`
  * offsets have accumulated since the last flush, the reference's exact
  * gating (offset_storage.h:20-27).
  *
  * Offsets are stored as 8 little-endian bytes, byte-compatible with the
  * reference's x86 native-endian `write((char*)&offset, 8)` files/objects,
  * so a graft job can resume from a cursor the reference wrote and vice
  * versa.
  *
  * A `kafka:` (topic-backed) provider is deliberately absent: this
  * container has no Kafka client or broker to implement or verify one
  * against. In Spark deployments the idiomatic equivalent is the streaming
  * checkpoint location, which already works on any Hadoop filesystem.
  */
object OffsetStorage {

  /** librdkafka's logical offsets, transcribed in typedefs.h:5. */
  val OffsetBeginning: Long = -2L
  val OffsetEnd: Long = -1L
  val OffsetStored: Long = -1000L

  /** offset_storage.h:11 — "no offset has been committed yet". */
  val UnknownOffset: Long = -4242L

  def toBytes(offset: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(offset).array()

  def fromBytes(b: Array[Byte]): Long =
    ByteBuffer.wrap(b, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong

  /** offset_storage's contract: `start` resolves the configured position,
    * `commit` buffers, the backend persists. Close persists any pending
    * commit (both reference backends flush from their destructors).
    */
  abstract class Store extends AutoCloseable {
    private[connect] var lastCommitted: Long = UnknownOffset
    private[connect] var lastFlushed: Long = UnknownOffset - 1
    private var maxPending: Long = 3600000L // offset_storage.h:44 default

    def setMaxPendingOffsets(n: Long): Unit = maxPending = n

    /** Backend read; [[OffsetBeginning]] when nothing usable is stored. */
    protected def loadOffset(): Long

    /** Backend write; false on failure — the flushed watermark then stays
      * behind and the next commit retries, the s3 backend's error stance
      * (s3_offset_storage_provider.cpp:124-131).
      */
    protected def persistOffset(offset: Long): Boolean

    /** offset_storage::start (offset_storage_provider.cpp:16-28): STORED
      * resolves through the backend; BEGINNING/END/fixed offsets override
      * storage. A successful load marks the offset already-flushed
      * (s3_offset_storage_provider.cpp:93-105).
      */
    final def start(offset: Long): Long = offset match {
      case OffsetStored =>
        val stored = loadOffset()
        if (stored != OffsetBeginning) { lastCommitted = stored; lastFlushed = stored }
        stored
      case other => other
    }

    /** offset_storage::commit (offset_storage.h:20-27): record, and persist
      * only on `flush` or when the un-flushed span exceeds
      * `maxPendingOffsets` — offset commits are far cheaper than offset
      * writes, so a caller can commit per record and still write rarely.
      */
    final def commit(offset: Long, flush: Boolean): Unit = {
      lastCommitted = offset
      if (flush || (lastCommitted - lastFlushed) > maxPending)
        if (lastCommitted > lastFlushed && persistOffset(lastCommitted))
          lastFlushed = lastCommitted
    }

    override def close(): Unit =
      if (lastCommitted > lastFlushed && persistOffset(lastCommitted))
        lastFlushed = lastCommitted
  }

  /** fs_offset_storage (offset_storage_provider.cpp:30-67): one 8-byte
    * binary file; a missing or short file starts from the beginning.
    */
  final class FsStore(path: java.nio.file.Path) extends Store {
    if (path.getParent != null) Files.createDirectories(path.getParent)

    override protected def loadOffset(): Long =
      if (!Files.exists(path)) OffsetBeginning
      else {
        val b = Files.readAllBytes(path)
        if (b.length < 8) OffsetBeginning else fromBytes(b)
      }

    override protected def persistOffset(offset: Long): Boolean =
      // contract: false on failure (watermark stays behind, next commit
      // retries) — a full disk must not crash commit()/close().
      // write-temp-then-ATOMIC_MOVE (the CdcCursor.FileOffsetStore commit):
      // a plain truncate-then-write crashing mid-write leaves a short file,
      // which loadOffset reads as OffsetBeginning — silently rewinding the
      // stream to the start
      try {
        val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
        Files.write(tmp, toBytes(offset))
        try
          Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch {
          // filesystems without atomic rename (some NFS/FUSE mounts) throw
          // this on EVERY move — mapping it to false would fail every commit
          // and rewind to OffsetBeginning on restart, the exact failure the
          // rename protects against. Fall back to a plain rename: still
          // write-then-move, just not atomic.
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            Files.move(tmp, path,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        true
      } catch { case _: java.io.IOException => false }
  }

  /** null_offset_storage (offset_storage_provider.h:62-71): start(STORED)
    * means "live end of the stream", persistence is a no-op.
    */
  final class NullStore extends Store {
    override protected def loadOffset(): Long = OffsetEnd
    override protected def persistOffset(offset: Long): Boolean = true
  }

  /** Minimal SigV4-signed S3 object client (GET-with-range / PUT, path
    * style) — the two calls the offset store needs. The reference links the
    * AWS C++ SDK for the same two requests
    * (s3_offset_storage_provider.cpp:87-137); the container has no AWS
    * runtime, so this speaks the public S3 REST API over `java.net.http`,
    * signed with the same [[SigV4]] chain the Kinesis connector uses.
    */
  final class S3ObjectClient(endpoint: String, bucket: String, key: String,
                             accessKey: String, secretKey: String,
                             region: String = "us-east-1") {
    private val endpointUri = java.net.URI.create(endpoint)
    private val hostHeader = endpointUri.getHost +
      (if (endpointUri.getPort > 0) ":" + endpointUri.getPort else "")
    private val objectPath = s"/$bucket/$key"

    private def send(method: String, body: Array[Byte], range: Option[String]) = {
      val amzDate = SigV4.amzDateNow()
      val payloadHash = SigV4.sha256HexBytes(body)
      val headers = Seq("host" -> hostHeader) ++ range.map("range" -> _) ++
        Seq("x-amz-content-sha256" -> payloadHash, "x-amz-date" -> amzDate)
      val auth = SigV4.authorizationFor(method, objectPath, headers, payloadHash,
        amzDate, region, "s3", accessKey, secretKey)
      var rb = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint + objectPath))
        .header("x-amz-content-sha256", payloadHash)
        .header("x-amz-date", amzDate)
        .header("Authorization", auth)
      range.foreach(r => rb = rb.header("Range", r))
      rb = if (method == "PUT")
        rb.PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      else rb.GET()
      S3ObjectClient.http.send(rb.build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    }

    /** GET (optionally ranged): Some on 2xx, None ONLY on 404 ("no offset
      * stored yet"). A transport failure or any other status THROWS — a
      * transient network blip must not masquerade as a missing object, or
      * a restarting job would silently rewind to the beginning of the
      * stream and mass-reprocess.
      */
    def get(range: Option[String]): Option[Array[Byte]] = {
      val resp =
        try send("GET", Array.emptyByteArray, range)
        catch { case e: InterruptedException => Thread.currentThread().interrupt(); throw e }
      resp.statusCode() match {
        case s if s / 100 == 2 => Some(resp.body())
        case 404               => None
        case s                 => sys.error(s"s3 GET $objectPath failed with status $s")
      }
    }

    /** PUT; false on any non-2xx or IO failure (the store's commit
      * watermark then stays behind and the next commit retries).
      */
    def put(body: Array[Byte]): Boolean =
      try send("PUT", body, None).statusCode() / 100 == 2
      catch {
        case _: java.io.IOException => false
        case e: InterruptedException => Thread.currentThread().interrupt(); throw e
      }
  }

  private object S3ObjectClient {
    private val http = java.net.http.HttpClient.newHttpClient()
  }

  /** s3_offset_storage (s3_offset_storage_provider.cpp:87-137): the offset
    * is an 8-byte object at `bucket/key`; load GETs `Range: bytes=0-7`, a
    * missing (404) object starts from the beginning, persist PUTs and
    * leaves the flushed watermark behind on failure (retried by the next
    * commit). Deliberate divergence: the reference also maps transport
    * errors to OFFSET_BEGINNING (cpp:93-107); here they fail the load
    * instead, because silently rewinding a 100 TB pipeline to the start on
    * a network blip is worse than failing fast.
    */
  final class S3Store(client: S3ObjectClient) extends Store {
    override protected def loadOffset(): Long =
      client.get(Some("bytes=0-7")) match {
        case Some(b) if b.length >= 8 => fromBytes(b)
        case _                        => OffsetBeginning
      }

    override protected def persistOffset(offset: Long): Boolean =
      client.put(toBytes(offset))
  }

  /** get_offset_provider (offset_storage_provider.cpp:68-98): URI-scheme
    * dispatch. Empty / `null:` → [[NullStore]]; no scheme defaults to
    * `file` (kspp::url's default-scheme rule); `s3://host[:port]/bucket/key`
    * takes credentials from `S3_ACCESS_KEY_ID` / `S3_SECRET_ACCESS_KEY`
    * (the reference's env names, s3_offset_storage_provider.cpp:33-46) and
    * disables TLS when the host is an IPv4 literal
    * (s3_offset_storage_provider.cpp:56-64). `kafka:` is documented-absent
    * (no Kafka client in this container).
    */
  def provider(uri: String, env: String => Option[String] = sys.env.get): Store = {
    // `null:` alone is not a legal java.net.URI (no scheme-specific part) —
    // match it before parsing, like the reference's scheme check
    if (uri.isEmpty || uri == "null:" || uri.startsWith("null://")) return new NullStore
    val u = java.net.URI.create(uri)
    u.getScheme match {
      case "null" => new NullStore
      case "s3" =>
        val parts = Option(u.getPath).getOrElse("").stripPrefix("/").split("/", 2)
        require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
          s"bad s3 offset uri (want s3://host/bucket/key): $uri")
        val accessKey = env("S3_ACCESS_KEY_ID").getOrElse(
          sys.error("S3_ACCESS_KEY_ID not defined"))
        val secretKey = env("S3_SECRET_ACCESS_KEY").getOrElse(
          sys.error("S3_SECRET_ACCESS_KEY not defined"))
        val hostIsIp = Option(u.getHost).exists(_.matches("""\d{1,3}(\.\d{1,3}){3}"""))
        val scheme = if (hostIsIp) "http" else "https"
        val port = if (u.getPort > 0) ":" + u.getPort else ""
        new S3Store(new S3ObjectClient(s"$scheme://${u.getHost}$port",
          parts(0), parts(1), accessKey, secretKey))
      case "file" | null => new FsStore(Paths.get(Option(u.getPath).getOrElse(uri)))
      case "kafka" => sys.error(
        "kafka: offset storage is deliberately not implemented (no Kafka " +
          "client available in this environment); a topic-backed Store can " +
          "implement the same trait — use file:, s3:, or null: meanwhile")
      case other => sys.error(s"unknown offset storage scheme: $other in uri: $uri")
    }
  }
}
