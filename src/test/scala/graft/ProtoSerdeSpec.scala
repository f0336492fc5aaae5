package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.serde.ConfluentProto
import graft.serde.ConfluentProto.{encode => pEncode, decode => pDecode, _}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, from_json}

/** Protobuf serde tests pinned to the byte vectors published in the
  * protobuf encoding documentation, plus the Confluent proto framing from
  * proto_serdes.h:50-100 and the Spark column-level decode path.
  */
class ProtoSerdeSpec extends SparkSpec {

  private def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString(" ")

  test("spec vectors: varint field, string field, nested message") {
    // protobuf docs: Test1{a:int32=1}=150 encodes as `08 96 01`
    val test1 = ProtoSchema(Seq(Field(1, "a", PInt32)))
    assert(hex(encodeMessage(Seq(150), test1)) == "08 96 01")
    assert(decodeMessage(Array(0x08, 0x96.toByte, 0x01), test1) == Seq(150))

    // Test2{b:string=2}="testing" encodes as `12 07 74 65 73 74 69 6e 67`
    val test2 = ProtoSchema(Seq(Field(2, "b", PString)))
    assert(hex(encodeMessage(Seq("testing"), test2)) == "12 07 74 65 73 74 69 6e 67")

    // Test3{c:Test1=3} with c.a=150 encodes as `1a 03 08 96 01`
    val test3 = ProtoSchema(Seq(Field(3, "c", PMessage(test1))))
    val enc3 = encodeMessage(Seq(Seq(150)), test3)
    assert(hex(enc3) == "1a 03 08 96 01")
    assert(decodeMessage(enc3, test3) == Seq(Row(150)))
  }

  test("zigzag matches the published table") {
    assert(ConfluentProto.zigzag(0L) == 0L)
    assert(ConfluentProto.zigzag(-1L) == 1L)
    assert(ConfluentProto.zigzag(1L) == 2L)
    assert(ConfluentProto.zigzag(-2L) == 3L)
    assert(ConfluentProto.zigzag(2147483647L) == 4294967294L)
    assert(ConfluentProto.zigzag(-2147483648L) == 4294967295L)
    Seq(0L, -1L, 1L, -2L, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(ConfluentProto.unzigzag(ConfluentProto.zigzag(v)) == v)
    }
  }

  test("a negative length-delimited varint fails the record instead of hanging") {
    // varint 0xFFFFFFF0 = F0 FF FF FF 0F: its low 32 bits are negative, so
    // an unchecked `pos += len` would move the cursor BACKWARDS and skip()
    // on the unknown field would re-read the same bytes forever — the task
    // hang failure mode, not a crash. Field 15 wire type 2 = tag 0x7A.
    val schema = ProtoSchema(Seq(Field(1, "a", PInt32)))
    val malformed = Array[Byte](0x7A, 0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x0F)
    val e = intercept[IllegalArgumentException](decodeMessage(malformed, schema))
    assert(e.getMessage.contains("negative length"), e.getMessage)
    // same guard on a DECLARED string field (tag 0x12 = field 2, wire 2)
    val sSchema = ProtoSchema(Seq(Field(2, "b", PString)))
    val malformed2 = Array[Byte](0x12, 0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x0F)
    intercept[IllegalArgumentException](decodeMessage(malformed2, sSchema))
  }

  test("packed repeated decode matches the spec example; unpacked encode round-trips") {
    // docs: repeated int32 f=4, [3,270,86942] packed → `22 06 03 8e 02 9e a7 05`
    val schema = ProtoSchema(Seq(Field(4, "f", PInt32, repeated = true)))
    val packed = Array(0x22, 0x06, 0x03, 0x8e.toByte, 0x02, 0x9e.toByte, 0xa7.toByte, 0x05)
      .map(_.toByte)
    assert(decodeMessage(packed, schema) == Seq(Seq(3, 270, 86942)))
    // our encoder writes unpacked; decode accepts it back
    val enc = encodeMessage(Seq(Seq(3, 270, 86942)), schema)
    assert(decodeMessage(enc, schema) == Seq(Seq(3, 270, 86942)))
  }

  test("all scalar types + bytes round-trip; unknown fields are skipped") {
    val schema = ProtoSchema(Seq(
      Field(1, "i32", PInt32), Field(2, "i64", PInt64), Field(3, "s32", PSInt32),
      Field(4, "s64", PSInt64), Field(5, "flag", PBool), Field(6, "d", PDouble),
      Field(7, "f", PFloat), Field(8, "s", PString), Field(9, "raw", PBytes)))
    val values = Seq(-42, 1L << 40, -7, -99L, true, 3.5d, 2.25f, "héllo",
      Array[Byte](0, 1, 2))
    val dec = decodeMessage(encodeMessage(values, schema), schema)
    assert(dec.take(8) == values.take(8))
    assert(dec(8).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](0, 1, 2))

    // a decoder with a narrower schema skips the unknown fields by wire type
    val narrow = ProtoSchema(Seq(Field(8, "s", PString)))
    assert(decodeMessage(encodeMessage(values, schema), narrow) == Seq("héllo"))

    // absent scalars decode to null (proto3 default rule)
    assert(decodeMessage(Array.empty[Byte], narrow) == Seq(null))

    // a fixed64 truncated mid-value must error, not read past the bound
    val dSchema = ProtoSchema(Seq(Field(6, "d", PDouble)))
    val truncated = Array(0x31, 0x00, 0x00, 0x00, 0x00).map(_.toByte) // tag + 4 of 8 bytes
    intercept[IllegalArgumentException](decodeMessage(truncated, dSchema))
  }

  test("Confluent framing: magic + schema id + message-index array") {
    val schema = ProtoSchema(Seq(Field(1, "a", PInt32)))
    // first-message case: index array [0] is the single byte 0x00
    val framed = pEncode(Seq(150), schema, schemaId = 7)
    assert(hex(framed.take(6)) == "00 00 00 00 07 00")
    val f = deframe(framed)
    assert(f.schemaId == 7 && f.indexes == Seq(0))
    assert(pDecode(framed, schema) == Seq(150))
    // nested-message index path: zigzag count + indexes
    val framed2 = pEncode(Seq(150), schema, schemaId = 7, indexes = Seq(1, 2))
    val f2 = deframe(framed2)
    assert(f2.indexes == Seq(1, 2))
    assert(decodeMessage(f2.body, schema) == Seq(150))
  }

  test("column-level decode: framed bytes → from_json(sparkSchema) typed columns") {
    val nested = ProtoSchema(Seq(Field(1, "qty", PInt32)))
    val schema = ProtoSchema(Seq(
      Field(1, "user", PString), Field(2, "n", PInt64),
      Field(3, "tags", PString, repeated = true), Field(4, "item", PMessage(nested))))
    val a = pEncode(Seq("alice", 3L, Seq("x", "y"), Seq(5)), schema, schemaId = 1)
    val b = pEncode(Seq("bob", null, null, null), schema, schemaId = 1)
    import spark.implicits._
    val df = Seq(a, b).toDF("payload")
    val json = ConfluentProto.decodeToJsonUdf(schema)(col("payload"))
    val typed = df.select(from_json(json, schema.sparkSchema).as("m")).select("m.*")
    assert(typed.schema.fieldNames.toSeq == Seq("user", "n", "tags", "item"))
    val rows = typed.orderBy("user").collect()
    assert(rows(0).getString(0) == "alice" && rows(0).getLong(1) == 3L)
    assert(rows(0).getSeq[String](2) == Seq("x", "y"))
    assert(rows(0).getStruct(3).getInt(0) == 5)
    assert(rows(1).getString(0) == "bob" && rows(1).isNullAt(1) && rows(1).isNullAt(3))
  }
}

/** Seeded randomized round-trips over a nested/repeated schema — the
  * property-style companion to the fixed spec vectors.
  */
class ProtoSerdePropertySpec extends org.scalatest.funsuite.AnyFunSuite {
  import scala.util.Random
  import graft.serde.ConfluentProto
  import graft.serde.ConfluentProto._

  private val inner = ProtoSchema(Seq(
    Field(1, "n", PSInt64), Field(2, "tag", PString)))
  private val schema = ProtoSchema(Seq(
    Field(1, "i32", PInt32), Field(2, "i64", PInt64), Field(3, "s32", PSInt32),
    Field(4, "flag", PBool), Field(5, "d", PDouble), Field(6, "f", PFloat),
    Field(7, "s", PString), Field(9, "reps", PInt64, repeated = true),
    Field(10, "msg", PMessage(inner))))

  private def randomValues(rnd: Random): Seq[Any] = Seq(
    if (rnd.nextBoolean()) rnd.nextInt() else null,
    rnd.nextLong(),
    rnd.nextInt(),
    rnd.nextBoolean(),
    rnd.nextDouble() * math.pow(10, rnd.nextInt(18) - 9),
    rnd.nextFloat(),
    if (rnd.nextBoolean()) rnd.alphanumeric.take(rnd.nextInt(50)).mkString + "é'\"\\" else null,
    if (rnd.nextBoolean()) Seq.fill(rnd.nextInt(6))(rnd.nextLong()) else null,
    if (rnd.nextBoolean()) Seq[Any](rnd.nextLong(), rnd.alphanumeric.take(5).mkString) else null)

  test("encode/decode round-trips randomized messages (50 seeds)") {
    (1 to 50).foreach { seed =>
      val rnd = new Random(seed)
      val values = randomValues(rnd)
      val decoded = decodeMessage(encodeMessage(values, schema), schema)
      // proto3 wire rules: an empty repeated field writes no bytes, so it
      // decodes as absent (null); nested messages come back as Rows
      val expected = values
        .updated(7, values(7) match { case s: Seq[_] if s.isEmpty => null; case v => v })
        .updated(8, Option(values(8))
          .map(v => org.apache.spark.sql.Row.fromSeq(v.asInstanceOf[Seq[Any]])).orNull)
      assert(decoded == expected, s"seed $seed")
      // framed variant round-trips too, with a multi-index path
      val framed = ConfluentProto.encode(values, schema, schemaId = seed, indexes = Seq(0, seed % 3))
      val f = deframe(framed)
      assert(f.schemaId == seed && f.indexes == Seq(0, seed % 3))
      assert(decodeMessage(f.body, schema) == expected, s"framed seed $seed")
    }
  }
}
