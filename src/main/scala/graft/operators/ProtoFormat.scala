package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.GraftSqlShim.AbstractType
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf (proto3) wire encoding of change events — the `debezium-api`
  * `engine/format/Protobuf` converter surface, hand-rolled from the
  * public Protocol Buffers encoding spec (developers.google.com/
  * protocol-buffers/docs/encoding) because the sandbox has no protobuf
  * runtime: a field = varint key `(fieldNumber << 3) | wireType` then the
  * payload; wire type 0 = base-128 varint (int64; two's-complement, so a
  * negative int64 is always 10 bytes), 1 = 64-bit little-endian (double),
  * 2 = length-delimited (string/bytes: varint byte length ++ bytes).
  * proto3 presence: an absent optional field is simply NOT emitted
  * (zero bytes), which is how the `["null",T]` analog works here.
  *
  * Spark-first, same shape as [[AvroFormat]]: per-primitive codegen'd
  * Catalyst expressions, a message = `concat(binary, ...)` of its encoded
  * fields, so the whole event encodes inside one generated projection.
  * Decoder ([[ProtoOps.Reader]]) is shared by consumers and the specs'
  * golden-vector/roundtrip checks.
  */
object ProtoOps {

  /** Unsigned base-128 varint (proto wire type 0). Negative longs take
    * the full 10 bytes (two's-complement), per the spec.
    */
  def encVarint(v: Long): Array[Byte] = {
    var z = v
    val out = new Array[Byte](10)
    var i = 0
    while ((z & ~0x7FL) != 0L) { out(i) = ((z & 0x7F) | 0x80).toByte; z >>>= 7; i += 1 }
    out(i) = z.toByte
    java.util.Arrays.copyOf(out, i + 1)
  }

  private def key(fieldNumber: Int, wireType: Int): Array[Byte] =
    encVarint(((fieldNumber.toLong) << 3) | wireType.toLong)

  /** `int64 fieldNumber = v` (wire type 0). */
  def encLongField(fieldNumber: Int, v: Long): Array[Byte] =
    cat(key(fieldNumber, 0), encVarint(v))

  /** `string fieldNumber = s` (wire type 2). */
  def encStringField(fieldNumber: Int, s: UTF8String): Array[Byte] =
    encBytesField(fieldNumber, s.getBytes)

  /** `bytes fieldNumber = b` (wire type 2). */
  def encBytesField(fieldNumber: Int, b: Array[Byte]): Array[Byte] =
    cat(key(fieldNumber, 2), encVarint(b.length.toLong), b)

  /** `double fieldNumber = v` (wire type 1, 8 bytes little-endian). */
  def encDoubleField(fieldNumber: Int, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((bits >>> (8 * i)) & 0xFF).toByte; i += 1 }
    cat(key(fieldNumber, 1), out)
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
    out
  }

  // ------------------------------------------------------------- decoding

  /** Streaming decoder for flat messages: `next()` yields
    * (fieldNumber, wireType) until exhausted; then read the matching
    * payload. Unknown fields can be skipped (proto forward-compat rule).
    */
  final class Reader(val bytes: Array[Byte], var pos: Int = 0) {
    def hasNext: Boolean = pos < bytes.length
    def readVarint(): Long = {
      var b = bytes(pos); pos += 1
      var z = (b & 0x7F).toLong
      var shift = 7
      while ((b & 0x80) != 0) {
        b = bytes(pos); pos += 1
        z |= (b & 0x7F).toLong << shift
        shift += 7
      }
      z
    }
    /** (fieldNumber, wireType) of the next field. */
    def readKey(): (Int, Int) = {
      val k = readVarint()
      ((k >>> 3).toInt, (k & 0x7).toInt)
    }
    def readString(): String = new String(readBytes(), "UTF-8")
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def readDouble(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 =>
        // two steps: `pos += readVarint()` would capture pos BEFORE the
        // varint read advances it, losing the length prefix's own width
        val n = readVarint().toInt
        pos += n
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }
}

object ProtoFormat {

  private abstract class ProtoUnary(fieldNumber: Int, fn: String, in: AbstractType)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BinaryType
    override def inputTypes: Seq[AbstractType] = Seq(in)
    override def nullIntolerant: Boolean = true
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.ProtoOps.$fn($fieldNumber, $c)")
  }

  private case class ProtoLongField(fieldNumber: Int, child: Expression)
      extends ProtoUnary(fieldNumber, "encLongField", LongType) {
    override protected def nullSafeEval(v: Any): Any =
      ProtoOps.encLongField(fieldNumber, v.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private case class ProtoStringField(fieldNumber: Int, child: Expression)
      extends ProtoUnary(fieldNumber, "encStringField", StringType) {
    override protected def nullSafeEval(v: Any): Any =
      ProtoOps.encStringField(fieldNumber, v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private case class ProtoBytesField(fieldNumber: Int, child: Expression)
      extends ProtoUnary(fieldNumber, "encBytesField", BinaryType) {
    override protected def nullSafeEval(v: Any): Any =
      ProtoOps.encBytesField(fieldNumber, v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private case class ProtoDoubleField(fieldNumber: Int, child: Expression)
      extends ProtoUnary(fieldNumber, "encDoubleField", DoubleType) {
    override protected def nullSafeEval(v: Any): Any =
      ProtoOps.encDoubleField(fieldNumber, v.asInstanceOf[Double])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `int64 n = c` field (absent when the column is null — proto3
    * presence; the empty binary is the identity of `concat`).
    */
  def long(n: Int, c: Column): Column = presence(c,
    GraftSqlShim.column(ProtoLongField(n, GraftSqlShim.expression(c.cast("long")))))

  /** `string n = c` field (absent when null). */
  def string(n: Int, c: Column): Column = presence(c,
    GraftSqlShim.column(ProtoStringField(n, GraftSqlShim.expression(c))))

  /** `bytes n = c` field (absent when null). */
  def bytes(n: Int, c: Column): Column = presence(c,
    GraftSqlShim.column(ProtoBytesField(n, GraftSqlShim.expression(c))))

  /** `double n = c` field (absent when null). */
  def double(n: Int, c: Column): Column = presence(c,
    GraftSqlShim.column(ProtoDoubleField(n, GraftSqlShim.expression(c.cast("double")))))

  private val Empty = Array.empty[Byte]
  private def presence(v: Column, enc: Column): Column =
    when(v.isNull, lit(Empty)).otherwise(enc)

  /** A message = its present fields' encodings concatenated in field
    * order (canonical serialization orders by field number).
    */
  def message(fields: Column*): Column = concat(fields: _*)

  /** The flat change event as one proto3 message per row — the
    * `format.Protobuf` embedded-engine output analog. Field numbers are
    * part of the public contract; see [[ChangeEventProtoSchema]].
    */
  def changeEventProto(): Column = message(
    string(1, col("repo")), string(2, col("path")), string(3, col("commit")),
    string(4, col("lang")), string(5, col("content")),
    string(6, col("op")), long(7, col("part")), long(8, col("lsn")), long(9, col("ts_ms")))

  /** The .proto document matching [[changeEventProto]] (proto3). */
  val ChangeEventProtoSchema: String =
    """syntax = "proto3";
      |package io.graft.repolog;
      |message ChangeEvent {
      |  string repo = 1;
      |  string path = 2;
      |  string commit = 3;
      |  optional string lang = 4;
      |  optional string content = 5;
      |  string op = 6;
      |  int64 part = 7;
      |  int64 lsn = 8;
      |  int64 ts_ms = 9;
      |}
      |""".stripMargin
}
