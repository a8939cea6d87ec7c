package graft

import org.apache.spark.sql.functions._
import graft.operators.{ProtoFormat, ProtoOps}
import org.apache.spark.unsafe.types.UTF8String

/** Proto3 wire encoding (hand-rolled per the public Protocol Buffers
  * encoding spec — golden vectors straight from its docs, plus full
  * message roundtrips through the shared decoder).
  */
class ProtoFormatSpec extends SparkSpec {
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("wire-format golden vectors (protobuf encoding docs)") {
    // varints
    assert(hex(ProtoOps.encVarint(1L)) === "01")
    assert(hex(ProtoOps.encVarint(150L)) === "9601")
    assert(hex(ProtoOps.encVarint(300L)) === "ac02")
    // negative int64 = two's-complement, always 10 bytes
    assert(hex(ProtoOps.encVarint(-1L)) === "ffffffffffffffffff01")
    // `message Test1 { int32 a = 1; }` with a=150 → 08 96 01 (the
    // canonical example from the encoding guide)
    assert(hex(ProtoOps.encLongField(1, 150L)) === "089601")
    // `message Test2 { string b = 2; }` with b="testing" → 12 07 + utf8
    assert(hex(ProtoOps.encStringField(2, UTF8String.fromString("testing")))
      === "120774657374696e67")
    // doubles: wire type 1, little-endian; 1.0 = 3ff0000000000000 BE
    assert(hex(ProtoOps.encDoubleField(3, 1.0)) === "19" + "000000000000f03f")
    // varint roundtrip across the range shape
    Seq(0L, 1L, 127L, 128L, 150L, 300L, -1L, Long.MaxValue, Long.MinValue).foreach { v =>
      val r = new ProtoOps.Reader(ProtoOps.encVarint(v))
      assert(r.readVarint() === v, s"varint $v")
    }
  }

  test("change-event messages roundtrip through the codegen'd encoders (proto3 presence)") {
    val rows = Seq(
      ("r1", "a.txt", "c01", "en", "hello world", "c", 0, 1L, 1000L),
      ("r1", "b.txt", "c02", null, null, "d", 1, 2L, 2000L),
      ("r2", "ü€.txt", "c03", "de", "unicode ≤ content", "u", 2, 3L, 3000L)
    ).toDF("repo", "path", "commit", "lang", "content", "op", "part", "lsn", "ts_ms")
    val enc = rows.select(col("path"), ProtoFormat.changeEventProto().as("proto")).collect()
    val orig = rows.collect().map(r => r.getString(1) -> r).toMap
    enc.foreach { r =>
      val o = orig(r.getString(0))
      val rd = new ProtoOps.Reader(r.getAs[Array[Byte]]("proto"))
      var fields = Map.empty[Int, Any]
      while (rd.hasNext) {
        val (fn, wt) = rd.readKey()
        fields += fn -> (wt match {
          case 0 => rd.readVarint()
          case 2 => rd.readString()
        })
      }
      assert(fields(1) === o.getString(0))
      assert(fields(2) === o.getString(1))
      assert(fields(3) === o.getString(2))
      // proto3 presence: null lang/content emit NO field at all
      assert(fields.get(4) === Option(o.getString(3)))
      assert(fields.get(5) === Option(o.getString(4)))
      assert(fields(6) === o.getString(5))
      assert(fields(7) === o.getInt(6).toLong)
      assert(fields(8) === o.getLong(7))
      assert(fields(9) === o.getLong(8))
    }
  }

  test("decoder skips unknown fields (forward compatibility)") {
    // a message with an extra field 99 (string) injected mid-stream
    val extra = ProtoOps.encStringField(99, UTF8String.fromString("future"))
    val known = ProtoOps.encLongField(8, 42L)
    val bytes = extra ++ known
    val rd = new ProtoOps.Reader(bytes)
    var lsn = -1L
    while (rd.hasNext) {
      val (fn, wt) = rd.readKey()
      if (fn == 8 && wt == 0) lsn = rd.readVarint() else rd.skip(wt)
    }
    assert(lsn === 42L)
  }

  test("schema document matches the field numbers") {
    val s = ProtoFormat.ChangeEventProtoSchema
    assert(s.contains("syntax = \"proto3\""))
    assert(s.contains("optional string lang = 4;"))
    assert(s.contains("int64 ts_ms = 9;"))
  }
}
