package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SemanticTypes._

/** Semantic type layer: raw Debezium-shaped encodings (epoch days/micros,
  * ISO-8601-with-offset strings, decimal strings) tagged via field
  * metadata convert to Spark-native types (§1.4 / JdbcValueConverters
  * analog).
  */
class SemanticTypesSpec extends SparkSpec {
  import spark.implicits._

  test("tagged raw encodings convert to Spark-native types; untagged pass through") {
    val raw = Seq((0, 1704067798778549L)).toDF("days", "us").select(
      tagged(col("days"), "d", Date),
      tagged(col("us"), "ts", MicroTimestamp),
      tagged(col("us") * 1000L, "tsn", NanoTimestamp),
      tagged(lit("2024-01-01T02:09:58.778549+02:00"), "zts", ZonedTimestamp),
      tagged(lit("ABC-DEF"), "u", Uuid),
      tagged(lit("12.5"), "dec", decimal(10, 2)),
      tagged(lit(2024), "y", Year),
      col("us").as("plain"))
    val out = convert(raw)
    assert(out.schema("d").dataType === DateType)
    assert(out.schema("ts").dataType === TimestampNTZType)
    assert(out.schema("zts").dataType === TimestampNTZType)
    assert(out.schema("dec").dataType === DecimalType(10, 2))
    assert(out.schema("y").dataType === IntegerType)
    val r = out.collect()(0)
    assert(r.getAs[java.sql.Date]("d").toString === "1970-01-01")
    assert(r.getAs[java.time.LocalDateTime]("ts").toString === "2024-01-01T00:09:58.778549")
    assert(r.getAs[java.time.LocalDateTime]("tsn") === r.getAs[java.time.LocalDateTime]("ts"),
      "nanos truncate to the same micros")
    assert(r.getAs[java.time.LocalDateTime]("zts") === r.getAs[java.time.LocalDateTime]("ts"),
      "the +02:00 offset is applied, wall clock normalized to UTC")
    assert(r.getAs[String]("u") === "abc-def")
    assert(r.getAs[java.math.BigDecimal]("dec").toPlainString === "12.50")
    assert(r.getAs[Long]("plain") === 1704067798778549L, "untagged column untouched")
  }

  test("semantic tags survive schema round trips (metadata on StructField)") {
    val f = tag(StructField("c", LongType), MicroTimestamp)
    val json = StructType(Seq(f)).json
    val back = DataType.fromJson(json).asInstanceOf[StructType]
    assert(semanticOf(back("c")) === Some(MicroTimestamp))
  }

  test("Bits(n): BitSet.toByteArray little-endian bytes decode to the bit pattern") {
    def enc(v: Long): Array[Byte] = {
      val bs = java.util.BitSet.valueOf(Array(v))
      bs.toByteArray // little-endian, trailing zero bytes TRIMMED
    }
    val raw = Seq((5L, enc(5L)), (0L, enc(0L)), (0x1234L, enc(0x1234L)),
      (0x80L, enc(0x80L))).toDF("expect", "bin")
      .select(col("expect"), tagged(col("bin"), "b", bits(16)))
    val out = convert(raw).select("expect", "b").as[(Long, Long)].collect()
    out.foreach { case (e, got) => assert(got === e, s"bits decode of $e") }
  }

  test("Enum/EnumSet: allowed-values validation and set split") {
    val raw = Seq(("blue", "blue,green,teal"), ("mauve", "")).toDF("e", "es").select(
      tagged(col("e"), "e", enumType(Seq("red", "blue", "green"))),
      tagged(col("es"), "es", enumSetType(Seq("red", "blue", "green"))))
    val out = convert(raw).as[(Option[String], Seq[String])].collect()
    assert(out(0) === ((Some("blue"), Seq("blue", "green")))) // teal dropped
    assert(out(1) === ((None, Seq())))                        // invalid enum → null
  }

  test("VariableScaleDecimal: big-endian two's-complement unscaled / 10^scale") {
    def enc(bd: BigDecimal): (Array[Byte], Int) =
      (bd.underlying.unscaledValue.toByteArray, bd.scale)
    val cases = Seq(BigDecimal("123.45"), BigDecimal("-0.002"), BigDecimal("0"),
      BigDecimal("-98765.4321"), BigDecimal("170.00"))
    val raw = cases.map { bd => val (v, s) = enc(bd); (bd.toString, v, s) }
      .toDF("expect", "value", "scale")
      .select(col("expect"),
        tagged(struct(col("scale"), col("value")), "d", VariableScale))
    val out = convert(raw).select("expect", "d").as[(String, Double)].collect()
    out.foreach { case (e, got) =>
      assert(math.abs(got - e.toDouble) < 1e-9, s"vscale decode of $e got $got") }

    // 7/8-byte encodings (zero-padded negative longs — the wire form a
    // fixed-width encoder emits): the sign-extension width must be the
    // EXACT 2^56 / 2^64, not a double-rounded one (regression: -0.487
    // decoded as -0.871 through the 384-off 2^64).
    val longCases = Seq(-487L, -1L, 13L, -98765432101L)
    val rawL = longCases.map(v => (v, v)).toDF("expect", "v")
      .select(col("expect"),
        tagged(struct(lit(3).as("scale"),
          unhex(lpad(hex(col("v")), 16, "0")).as("value")), "d", VariableScale),
        tagged(struct(lit(0).as("scale"),
          unhex(substring(lpad(hex(col("v")), 16, "0"), 3, 14)).as("value")), "d7", VariableScale))
    convert(rawL).select("expect", "d", "d7").as[(Long, Double, Double)].collect()
      .foreach { case (e, d8, d7) =>
        assert(math.abs(d8 - e / 1000.0) < 1e-6, s"8-byte decode of $e got $d8")
        // 7-byte form only holds values that fit 56 bits
        if (math.abs(e) < (1L << 55)) assert(d7 === e.toDouble, s"7-byte decode of $e got $d7")
      }
  }

  test("time-of-day µs normalization, ZonedTime offset, durations, Interval parse") {
    val raw = Seq((37230123, "10:15:30.123456+02:00", "P1Y2M3DT4H5M6.25S"))
      .toDF("ms", "zt", "iso").select(
        tagged(col("ms"), "t", Time),
        tagged(col("ms").cast("long") * 1000000L, "nt", NanoTime),
        tagged(col("zt"), "ztv", ZonedTime),
        tagged(lit(1500L), "du", MicroDuration),
        tagged(lit(1500999L), "dn", NanoDuration),
        tagged(col("iso"), "iv", Interval))
    val r = convert(raw).head()
    assert(r.getLong(0) === 37230123000L) // ms → µs
    assert(r.getLong(1) === 37230123000L) // ns → µs (same instant)
    assert(r.getLong(2) === (8 * 3600 + 15 * 60 + 30) * 1000000L + 123456) // UTC
    assert(r.getLong(3) === 1500L)
    assert(r.getLong(4) === 1500L) // ns duration floors to µs
    val iv = r.getStruct(5)
    assert(iv.getInt(0) === 14 && iv.getInt(1) === 3)
    assert(iv.getLong(2) === (4 * 3600 + 5 * 60) * 1000000L + 6250000L)

    // ISO offset strings (IsoDate keeps the NAMED local date; IsoTime and
    // IsoTimestamp resolve their offsets to UTC)
    val isoRaw = Seq(("2024-01-15+09:00", "23:30:00.000000+02:00",
      "2024-01-15T01:30:00.000000+02:00")).toDF("d", "t", "ts").select(
      tagged(col("d"), "d", IsoDate),
      tagged(col("t"), "t", IsoTime),
      tagged(col("ts"), "ts", IsoTimestamp))
    val ir = convert(isoRaw).head()
    assert(ir.getDate(0).toString === "2024-01-15")
    assert(ir.getLong(1) === (21 * 3600 + 30 * 60) * 1000000L) // 23:30+02 → 21:30Z
    assert(ir.getAs[java.time.LocalDateTime](2).toString === "2024-01-14T23:30")

    // partial periods: absent components are zero, minutes-only after T
    val parts = Seq("PT30M", "P5D", "P2M", "PT0.5S").toDF("iso")
      .select(tagged(col("iso"), "iv", Interval))
    val out = convert(parts).select("iv.*").as[(Int, Int, Long)].collect()
    assert(out(0) === ((0, 0, 1800000000L)))
    assert(out(1) === ((0, 5, 0L)))
    assert(out(2) === ((2, 0, 0L)))
    assert(out(3) === ((0, 0, 500000L)))
  }

  test("SparseDoubleVector densifies; Float/DoubleVector and Xml pass through") {
    val raw = Seq((5, Map(1 -> 1.5, 4 -> -2.0))).toDF("dims", "vec").select(
      tagged(struct(col("dims").as("dimensions"), col("vec").as("vector")), "sv",
        SparseDoubleVector),
      tagged(typedLit(Seq(1.0f, 2.0f)), "fv", FloatVector),
      tagged(lit("<a/>"), "x", Xml))
    val out = convert(raw).as[(Seq[Double], Seq[Float], String)].head()
    assert(out === ((Seq(1.5, 0.0, 0.0, -2.0, 0.0), Seq(1.0f, 2.0f), "<a/>")))
  }
}
