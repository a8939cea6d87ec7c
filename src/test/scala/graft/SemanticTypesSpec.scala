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
}
