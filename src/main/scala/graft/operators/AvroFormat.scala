package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.GraftSqlShim.AbstractType
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Avro BINARY encoding of change events — the `debezium-api`
  * `engine/format/Avro` converter surface, hand-rolled from the public
  * Avro 1.11 specification (§ Binary Encoding) because the sandbox has no
  * spark-avro jar: long/int = zigzag varint, string/bytes =
  * varint(byteLen) ++ bytes, double = 8 bytes little-endian, a
  * `["null", T]` union = varint branch index (0 null / 1 value) ++ value,
  * a record = the concatenation of its fields in schema order.
  *
  * Spark-first: each primitive encoder is a tiny codegen'd Catalyst
  * expression (whole-stage-compatible, no UDF), and a RECORD is just
  * `concat(binary, ...)` of its encoded fields — Catalyst's binary concat
  * — so the whole event encodes inside one generated projection.
  * [[AvroFormat.record]]/[[AvroFormat.confluentFrame]] assemble the
  * per-record wire forms; [[AvroFormat.recordSchemaJson]] renders the
  * matching Avro schema document. Decoders live here too so consumers
  * (and the specs' roundtrip/golden-vector checks) share one codec.
  */
object AvroOps {

  /** Zigzag varint of a long (Avro spec: `(n << 1) ^ (n >> 63)`, then
    * base-128 little-endian with continuation bits).
    */
  def encLong(v: Long): Array[Byte] = {
    var z = (v << 1) ^ (v >> 63)
    val out = new Array[Byte](10)
    var i = 0
    while ((z & ~0x7FL) != 0L) { out(i) = ((z & 0x7F) | 0x80).toByte; z >>>= 7; i += 1 }
    out(i) = z.toByte
    java.util.Arrays.copyOf(out, i + 1)
  }

  def encString(s: UTF8String): Array[Byte] = encBytes(s.getBytes)

  def encBytes(b: Array[Byte]): Array[Byte] = {
    val len = encLong(b.length.toLong)
    val out = new Array[Byte](len.length + b.length)
    System.arraycopy(len, 0, out, 0, len.length)
    System.arraycopy(b, 0, out, len.length, b.length)
    out
  }

  def encDouble(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((bits >>> (8 * i)) & 0xFF).toByte; i += 1 } // little-endian
    out
  }

  // ------------------------------------------------------------- decoding
  // (consumer side + spec roundtrips; mutable cursor kept local)

  final class Reader(val bytes: Array[Byte], var pos: Int = 0) {
    def readLong(): Long = {
      var b = bytes(pos); pos += 1
      var z = (b & 0x7F).toLong
      var shift = 7
      while ((b & 0x80) != 0) {
        b = bytes(pos); pos += 1
        z |= (b & 0x7F).toLong << shift
        shift += 7
      }
      (z >>> 1) ^ -(z & 1) // un-zigzag
    }
    def readString(): String = new String(readBytes(), "UTF-8")
    def readBytes(): Array[Byte] = {
      val n = readLong().toInt
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
    /** `["null", T]` union: Some(()) when the value branch follows. */
    def readOptional(): Boolean = readLong() == 1L
  }
}

object AvroFormat {

  private abstract class AvroUnary(fn: String, in: AbstractType) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BinaryType
    override def inputTypes: Seq[AbstractType] = Seq(in)
    override def nullIntolerant: Boolean = true
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.AvroOps.$fn($c)")
  }

  private case class AvroLongEnc(child: Expression) extends AvroUnary("encLong", LongType) {
    override protected def nullSafeEval(v: Any): Any = AvroOps.encLong(v.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private case class AvroStringEnc(child: Expression) extends AvroUnary("encString", StringType) {
    override protected def nullSafeEval(v: Any): Any = AvroOps.encString(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private case class AvroBytesEnc(child: Expression) extends AvroUnary("encBytes", BinaryType) {
    override protected def nullSafeEval(v: Any): Any = AvroOps.encBytes(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private case class AvroDoubleEnc(child: Expression) extends AvroUnary("encDouble", DoubleType) {
    override protected def nullSafeEval(v: Any): Any = AvroOps.encDouble(v.asInstanceOf[Double])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Avro binary of a non-null long/int column. */
  def long(c: Column): Column =
    GraftSqlShim.column(AvroLongEnc(GraftSqlShim.expression(c.cast("long"))))

  /** Avro binary of a non-null string column. */
  def string(c: Column): Column =
    GraftSqlShim.column(AvroStringEnc(GraftSqlShim.expression(c)))

  /** Avro binary of a non-null bytes column. */
  def bytes(c: Column): Column =
    GraftSqlShim.column(AvroBytesEnc(GraftSqlShim.expression(c)))

  /** Avro binary of a non-null double column. */
  def double(c: Column): Column =
    GraftSqlShim.column(AvroDoubleEnc(GraftSqlShim.expression(c.cast("double"))))

  /** `["null", T]` union wrapper: branch index then the encoded value. */
  def optional(value: Column, enc: Column => Column): Column =
    when(value.isNull, lit(Array[Byte](0x00)))
      .otherwise(concat(lit(Array[Byte](0x02)), enc(value)))

  /** A record = its fields' encodings concatenated in schema order. */
  def record(fields: Column*): Column = concat(fields: _*)

  /** Confluent-registry wire framing: magic 0x00 + big-endian 4-byte
    * schema id + the record payload (the shape the reference's Avro
    * converter emits to Kafka).
    */
  def confluentFrame(schemaId: Int, payload: Column): Column = {
    val id = Array[Byte](0x00,
      ((schemaId >>> 24) & 0xFF).toByte, ((schemaId >>> 16) & 0xFF).toByte,
      ((schemaId >>> 8) & 0xFF).toByte, (schemaId & 0xFF).toByte)
    concat(lit(id), payload)
  }

  /** Avro schema document for a flat record; `fields` = (name, type)
    * where type ∈ {string, long, int, double, bytes} optionally prefixed
    * `?` for the `["null", T]` union.
    */
  def recordSchemaJson(name: String, namespace: String, fields: Seq[(String, String)]): String = {
    val fs = fields.map { case (n, t) =>
      val tj =
        if (t.startsWith("?")) s"""["null","${t.drop(1)}"]"""
        else s""""$t""""
      s"""{"name":"$n","type":$tj}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","namespace":"$namespace","fields":[$fs]}"""
  }

  /** The flat change event (repo, path, commit, lang?, content?, op,
    * part, lsn, ts_ms) as one Avro record per row — the `format.Avro`
    * embedded-engine output analog.
    */
  def changeEventAvro(): Column = record(
    string(col("repo")), string(col("path")), string(col("commit")),
    optional(col("lang"), string), optional(col("content"), string),
    string(col("op")), long(col("part")), long(col("lsn")), long(col("ts_ms")))

  val ChangeEventSchemaJson: String = recordSchemaJson(
    "ChangeEvent", "io.graft.repolog", Seq(
      "repo" -> "string", "path" -> "string", "commit" -> "string",
      "lang" -> "?string", "content" -> "?string",
      "op" -> "string", "part" -> "long", "lsn" -> "long", "ts_ms" -> "long"))
}
