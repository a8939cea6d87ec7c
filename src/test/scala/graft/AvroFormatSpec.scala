package graft

import org.apache.spark.sql.functions._
import graft.operators.{AvroFormat, AvroOps}

/** Avro binary encoding (hand-rolled per the public Avro 1.11 spec —
  * golden vectors straight from its Binary Encoding section, plus full
  * record roundtrips through the shared decoder).
  */
class AvroFormatSpec extends SparkSpec {
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("zigzag varint golden vectors (Avro spec table)") {
    assert(hex(AvroOps.encLong(0L)) === "00")
    assert(hex(AvroOps.encLong(-1L)) === "01")
    assert(hex(AvroOps.encLong(1L)) === "02")
    assert(hex(AvroOps.encLong(-2L)) === "03")
    assert(hex(AvroOps.encLong(2L)) === "04")
    assert(hex(AvroOps.encLong(-64L)) === "7f")
    assert(hex(AvroOps.encLong(64L)) === "8001")
    assert(hex(AvroOps.encLong(Long.MaxValue)) === "feffffffffffffffff01")
    assert(hex(AvroOps.encLong(Long.MinValue)) === "ffffffffffffffffff01")
    // string "foo" = len 3 (zigzag 06) + utf8
    assert(hex(AvroOps.encString(org.apache.spark.unsafe.types.UTF8String.fromString("foo")))
      === "06666f6f")
    // roundtrip across the whole long range shape
    Seq(0L, 1L, -1L, 63L, -63L, 64L, 12345678901L, Long.MaxValue, Long.MinValue).foreach { v =>
      val r = new AvroOps.Reader(AvroOps.encLong(v))
      assert(r.readLong() === v)
    }
    val d = new AvroOps.Reader(AvroOps.encDouble(3.5e-3))
    assert(d.readDouble() === 3.5e-3)
  }

  test("change-event records roundtrip through the codegen'd encoders (incl. null unions)") {
    val rows = Seq(
      ("r1", "a.txt", "c01", "en", "hello world", "c", 0, 1L, 1000L),
      ("r1", "b.txt", "c02", null, null, "d", 1, 2L, 2000L),
      ("r2", "ü€.txt", "c03", "de", "unicode ≤ content", "u", 2, 3L, 3000L)
    ).toDF("repo", "path", "commit", "lang", "content", "op", "part", "lsn", "ts_ms")
    val enc = rows.select(col("path"), AvroFormat.changeEventAvro().as("avro"),
      AvroFormat.confluentFrame(42, AvroFormat.changeEventAvro()).as("framed"))
      .collect()
    val orig = rows.collect().map(r => r.getString(1) -> r).toMap
    enc.foreach { r =>
      val o = orig(r.getString(0))
      val rd = new AvroOps.Reader(r.getAs[Array[Byte]]("avro"))
      assert(rd.readString() === o.getString(0))
      assert(rd.readString() === o.getString(1))
      assert(rd.readString() === o.getString(2))
      val lang = if (rd.readOptional()) rd.readString() else null
      assert(lang === o.getString(3))
      val content = if (rd.readOptional()) rd.readString() else null
      assert(content === o.getString(4))
      assert(rd.readString() === o.getString(5))
      assert(rd.readLong() === o.getInt(6).toLong)
      assert(rd.readLong() === o.getLong(7))
      assert(rd.readLong() === o.getLong(8))
      assert(rd.pos === r.getAs[Array[Byte]]("avro").length, "no trailing bytes")
      // Confluent framing: magic 0 + big-endian id + identical payload
      val f = r.getAs[Array[Byte]]("framed")
      assert(f(0) === 0x00.toByte && f.slice(1, 5).toSeq === Seq(0, 0, 0, 42).map(_.toByte))
      assert(f.drop(5).toSeq === r.getAs[Array[Byte]]("avro").toSeq)
    }
  }

  test("schema document renders unions and stays valid JSON") {
    val s = AvroFormat.ChangeEventSchemaJson
    assert(s.contains(""""name":"lang","type":["null","string"]"""))
    assert(s.contains(""""name":"lsn","type":"long""""))
    // parseable by a JSON reader (Jackson ships with Spark)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
    assert(node.get("fields").size() === 9)
    assert(node.get("name").asText() === "ChangeEvent")
  }
}
