package graft.serde

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Confluent wire-format protobuf serde (reference:
  * include/kspp/serdes/proto_serdes.h:50-100): payload = magic 0x00 +
  * 4-byte big-endian schema id + zigzag-varint message-index array +
  * protobuf binary body. The reference delegates the body to
  * protoc-generated classes; the container has no protobuf runtime, so the
  * body codec here is a dynamic implementation of the public protobuf wire
  * format (varint / zigzag / fixed32 / fixed64 / length-delimited) driven
  * by a field-descriptor list — the proto analog of the avro side's
  * `generic_avro` dynamic path.
  */
object ConfluentProto {

  val MagicByte: Byte = 0x00

  // ---- descriptor model ------------------------------------------------

  sealed trait PType
  case object PInt32 extends PType // varint
  case object PInt64 extends PType // varint
  case object PSInt32 extends PType // zigzag varint
  case object PSInt64 extends PType // zigzag varint
  case object PBool extends PType // varint 0/1
  case object PDouble extends PType // fixed64
  case object PFloat extends PType // fixed32
  case object PString extends PType // length-delimited
  case object PBytes extends PType // length-delimited
  final case class PMessage(schema: ProtoSchema) extends PType // length-delimited

  /** One field: proto field number, name (becomes the Spark column name),
    * scalar/message type, repeated flag.
    */
  final case class Field(number: Int, name: String, ptype: PType, repeated: Boolean = false)

  final case class ProtoSchema(fields: Seq[Field]) extends Serializable {
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    @transient private[serde] lazy val byNumber: Map[Int, Field] =
      fields.map(f => f.number -> f).toMap
    /** Spark schema with columns in descriptor order; scalars nullable
      * (proto3 absent = default, surfaced as null), repeated = ArrayType.
      */
    def sparkSchema: StructType = StructType(fields.map { f =>
      val base: DataType = f.ptype match {
        case PInt32 | PSInt32 => IntegerType
        case PInt64 | PSInt64 => LongType
        case PBool => BooleanType
        case PDouble => DoubleType
        case PFloat => FloatType
        case PString => StringType
        case PBytes => BinaryType
        case PMessage(s) => s.sparkSchema
      }
      StructField(f.name, if (f.repeated) ArrayType(base) else base, nullable = true)
    })
  }

  // ---- wire primitives (public protobuf encoding spec) -----------------

  private[graft] def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private[graft] def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[graft] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var res = 0L
      var done = false
      while (!done) {
        require(pos < end && shift < 64, "malformed varint")
        val b = bytes(pos); pos += 1
        res |= (b & 0x7fL) << shift
        shift += 7
        done = (b & 0x80) == 0
      }
      res
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = ByteBuffer.wrap(bytes, pos, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def fixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      val v = ByteBuffer.wrap(bytes, pos, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8; v
    }
    def lengthDelimited(): (Int, Int) = { // (offset, length)
      val len = varint().toInt
      // a varint whose low 32 bits are negative would move pos BACKWARDS
      // (pos + len <= end still holds), re-reading the same bytes forever
      // via skip() — a corrupt payload must fail the record, not hang the
      // task
      require(len >= 0, s"negative length-delimited field length $len")
      require(pos + len <= end, "length-delimited field overruns buffer")
      val off = pos; pos += len; (off, len)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => lengthDelimited()
      case 5 => require(pos + 4 <= end, "truncated fixed32"); pos += 4
      case t => sys.error(s"unsupported wire type $t")
    }
  }

  private def wireType(t: PType): Int = t match {
    case PInt32 | PInt64 | PSInt32 | PSInt64 | PBool => 0
    case PDouble => 1
    case PFloat => 5
    case PString | PBytes | _: PMessage => 2
  }

  // ---- message codec ---------------------------------------------------

  /** Encode a value row (fields in descriptor order; null/empty = omitted,
    * the proto3 default-value rule).
    */
  def encodeMessage(values: Seq[Any], schema: ProtoSchema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    schema.fields.zip(values).foreach { case (f, v) =>
      if (v != null) {
        val items: Seq[Any] = if (f.repeated) v.asInstanceOf[Seq[Any]] else Seq(v)
        items.foreach { item =>
          writeVarint(out, (f.number.toLong << 3) | wireType(f.ptype))
          f.ptype match {
            case PInt32 => writeVarint(out, item.asInstanceOf[Int].toLong)
            case PInt64 => writeVarint(out, item.asInstanceOf[Long])
            case PSInt32 => writeVarint(out, zigzag(item.asInstanceOf[Int].toLong))
            case PSInt64 => writeVarint(out, zigzag(item.asInstanceOf[Long]))
            case PBool => writeVarint(out, if (item.asInstanceOf[Boolean]) 1 else 0)
            case PDouble =>
              val b = ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
              out.write(b.putDouble(item.asInstanceOf[Double]).array())
            case PFloat =>
              val b = ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
              out.write(b.putFloat(item.asInstanceOf[Float]).array())
            case PString =>
              val bs = item.asInstanceOf[String].getBytes(UTF_8)
              writeVarint(out, bs.length.toLong); out.write(bs)
            case PBytes =>
              val bs = item.asInstanceOf[Array[Byte]]
              writeVarint(out, bs.length.toLong); out.write(bs)
            case PMessage(nested) =>
              val bs = encodeMessage(item.asInstanceOf[Seq[Any]], nested)
              writeVarint(out, bs.length.toLong); out.write(bs)
          }
        }
      }
    }
    out.toByteArray
  }

  /** Decode to a value seq in descriptor order. Unknown fields are skipped
    * by wire type (standard proto compatibility rule); absent scalars are
    * null; repeated fields accept both unpacked and packed encodings;
    * last-value-wins for duplicate non-repeated fields.
    */
  def decodeMessage(bytes: Array[Byte], schema: ProtoSchema): Seq[Any] =
    decodeRange(bytes, 0, bytes.length, schema)

  private def decodeRange(bytes: Array[Byte], from: Int, until: Int,
                          schema: ProtoSchema): Seq[Any] = {
    val byNumber = schema.byNumber
    val slots = collection.mutable.Map.empty[Int, Any]
    val repeats = collection.mutable.Map.empty[Int, collection.mutable.ArrayBuffer[Any]]
    val r = new Reader(bytes, from, until)
    while (r.hasMore) {
      val tag = r.varint()
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(num) match {
        case None => r.skip(wt)
        case Some(f) =>
          def put(v: Any): Unit =
            if (f.repeated) repeats.getOrElseUpdate(num, collection.mutable.ArrayBuffer.empty) += v
            else slots(num) = v
          if (f.repeated && wt == 2 && wireType(f.ptype) != 2) {
            // packed repeated scalars: one length-delimited run of values
            val (off, len) = r.lengthDelimited()
            val pr = new Reader(bytes, off, off + len)
            while (pr.hasMore) put(readScalar(pr, f.ptype, bytes))
          } else {
            require(wt == wireType(f.ptype), s"field ${f.name}: wire type $wt != expected")
            f.ptype match {
              case PMessage(nested) =>
                val (off, len) = r.lengthDelimited()
                put(org.apache.spark.sql.Row.fromSeq(decodeRange(bytes, off, off + len, nested)))
              case PString =>
                val (off, len) = r.lengthDelimited()
                put(new String(bytes, off, len, UTF_8))
              case PBytes =>
                val (off, len) = r.lengthDelimited()
                put(java.util.Arrays.copyOfRange(bytes, off, off + len))
              case t => put(readScalar(r, t, bytes))
            }
          }
      }
    }
    schema.fields.map { f =>
      if (f.repeated) repeats.get(f.number).map(_.toSeq).orNull
      else slots.get(f.number).orNull
    }
  }

  private def readScalar(r: Reader, t: PType, bytes: Array[Byte]): Any = t match {
    case PInt32 => r.varint().toInt
    case PInt64 => r.varint()
    case PSInt32 => unzigzag(r.varint()).toInt
    case PSInt64 => unzigzag(r.varint())
    case PBool => r.varint() != 0
    case PDouble => java.lang.Double.longBitsToDouble(r.fixed64())
    case PFloat => java.lang.Float.intBitsToFloat(r.fixed32())
    case other => sys.error(s"not a scalar: $other")
  }

  // ---- Confluent framing (proto variant) -------------------------------

  /** Message-index array (proto_serdes.h:52-56): zigzag varints — count
    * then each index. The common first-message case `[0]` is the single
    * byte 0x00.
    */
  private[graft] def writeIndexes(out: ByteArrayOutputStream, indexes: Seq[Int]): Unit =
    if (indexes == Seq(0)) out.write(0)
    else {
      writeVarint(out, zigzag(indexes.size.toLong))
      indexes.foreach(i => writeVarint(out, zigzag(i.toLong)))
    }

  final case class Framed(schemaId: Int, indexes: Seq[Int], body: Array[Byte])

  /** magic + big-endian schema id + index array + proto body
    * (proto_serdes.h:58-67).
    */
  def encode(values: Seq[Any], schema: ProtoSchema, schemaId: Int,
             indexes: Seq[Int] = Seq(0)): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(MagicByte.toInt)
    out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
    writeIndexes(out, indexes)
    out.write(encodeMessage(values, schema))
    out.toByteArray
  }

  def deframe(bytes: Array[Byte]): Framed = {
    require(bytes.length >= 6 && bytes(0) == MagicByte, "not Confluent-framed protobuf")
    val schemaId = ByteBuffer.wrap(bytes, 1, 4).getInt
    val r = new Reader(bytes, 5, bytes.length)
    val n = unzigzag(r.varint()).toInt
    val indexes = if (n == 0) Seq(0) else Seq.fill(n)(unzigzag(r.varint()).toInt)
    Framed(schemaId, indexes, java.util.Arrays.copyOfRange(bytes, r.pos, bytes.length))
  }

  def decode(bytes: Array[Byte], schema: ProtoSchema): Seq[Any] =
    decodeMessage(deframe(bytes).body, schema)

  // ---- column-level decode (dynamic path, mirrors ConfluentAvro) -------

  /** Framed binary column → JSON string for `from_json` with
    * [[ProtoSchema.sparkSchema]] — the same schema-agnostic hop the avro
    * serde uses for its dynamic path.
    */
  def decodeToJsonUdf(schema: ProtoSchema): Column => Column = {
    val f = udf { bytes: Array[Byte] =>
      if (bytes == null) null else toNode(decode(bytes, schema), schema).toString
    }
    (c: Column) => f(c)
  }

  // ObjectMapper is thread-safe and heavy; share one per JVM
  @transient private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def toNode(values: Seq[Any], schema: ProtoSchema)
  : com.fasterxml.jackson.databind.node.ObjectNode = {
    val node = jsonMapper.createObjectNode()
    def render(v: Any, t: PType): com.fasterxml.jackson.databind.JsonNode = (v, t) match {
      case (null, _) => com.fasterxml.jackson.databind.node.NullNode.getInstance()
      case (row: org.apache.spark.sql.Row, PMessage(nested)) => toNode(row.toSeq, nested)
      case (b: Array[Byte], PBytes) =>
        new com.fasterxml.jackson.databind.node.TextNode(
          java.util.Base64.getEncoder.encodeToString(b))
      case (x: Int, _) => new com.fasterxml.jackson.databind.node.IntNode(x)
      case (x: Long, _) => new com.fasterxml.jackson.databind.node.LongNode(x)
      case (x: Boolean, _) => com.fasterxml.jackson.databind.node.BooleanNode.valueOf(x)
      case (x: Double, _) => new com.fasterxml.jackson.databind.node.DoubleNode(x)
      case (x: Float, _) => new com.fasterxml.jackson.databind.node.FloatNode(x)
      case (s: String, _) => new com.fasterxml.jackson.databind.node.TextNode(s)
      case (other, tt) => sys.error(s"cannot render $other as $tt")
    }
    schema.fields.zip(values).foreach { case (f, v) =>
      if (f.repeated && v != null) {
        val arr = node.putArray(f.name)
        v.asInstanceOf[Seq[Any]].foreach(item => arr.add(render(item, f.ptype)))
      } else node.set[com.fasterxml.jackson.databind.JsonNode](f.name, render(v, f.ptype))
    }
    node
  }
}
