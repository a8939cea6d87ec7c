package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantic (logical) type layer — the Spark re-expression of Debezium's
  * named semantic types over 8 physical Connect types (SURVEY.md §1.4):
  * `io.debezium.time.{Date,Timestamp,MicroTimestamp,NanoTimestamp,
  * ZonedTimestamp,MicroTime,Year}` (`time/Date.java:38`,
  * `time/MicroTimestamp.java:40`, `time/ZonedTimestamp.java:103`),
  * `io.debezium.data.{Json,Uuid}` (`data/Json.java:20`, `data/Uuid.java:21`)
  * and decimal handling (`jdbc/JdbcValueConverters.java`, 1,452 LoC).
  *
  * Design: the semantic type is carried as `StructField` METADATA
  * (`graft.semanticType`), never as a wrapper object — the physical column
  * stays a plain int/long/string so the envelope pipeline (LWW, merge,
  * evolution) is oblivious to it, exactly like Connect schemas carrying a
  * `name()`. [[convert]] materializes the Spark-native representation with
  * codegen'd built-ins only (no UDFs): epoch-days → `DateType`,
  * epoch-millis/micros/nanos → `TimestampNTZType` (UTC wall clock),
  * ISO-8601-with-offset strings → UTC-normalized `TimestampNTZType`,
  * `Decimal(p,s)` strings → `DecimalType(p,s)`.
  */
object SemanticTypes {

  /** Metadata key on StructField carrying the semantic type name. */
  val MetaKey = "graft.semanticType"

  val Date = "Date"                     // int32: epoch days
  val Timestamp = "Timestamp"           // int64: epoch millis
  val MicroTimestamp = "MicroTimestamp" // int64: epoch micros
  val NanoTimestamp = "NanoTimestamp"   // int64: epoch nanos (truncates to micros)
  val ZonedTimestamp = "ZonedTimestamp" // string: ISO-8601 with offset
  val MicroTime = "MicroTime"           // int64: micros since midnight
  val Year = "Year"                     // int32
  val Json = "Json"                     // string (query via from_json/get_json_object)
  val Uuid = "Uuid"                     // string (normalized lower-case)
  private val DecimalRe = """Decimal\((\d+),(\d+)\)""".r

  /** `Decimal(p,s)` semantic name (decimal.handling.mode=string analog). */
  def decimal(precision: Int, scale: Int): String = s"Decimal($precision,$scale)"

  /** Alias a column with its semantic-type metadata attached. */
  def tagged(c: Column, name: String, semantic: String): Column =
    c.as(name, new MetadataBuilder().putString(MetaKey, semantic).build())

  def tag(f: StructField, semantic: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(MetaKey, semantic).build())

  def semanticOf(f: StructField): Option[String] =
    if (f.metadata.contains(MetaKey)) Some(f.metadata.getString(MetaKey)) else None

  /** Spark-native column for a raw physical column of the given semantic
    * type. Timestamps land on `TimestampNTZType` normalized to UTC wall
    * clock — deterministic across sessions, no hidden zone (the engine
    * runs with session tz UTC; ZonedTimestamp's offset is applied, then
    * dropped, like the reference's UTC-normalizing converters).
    */
  def toSpark(c: Column, semantic: String): Column = semantic match {
    case Date           => date_add(to_date(lit("1970-01-01")), c.cast(IntegerType))
    case Timestamp      => timestamp_millis(c.cast(LongType)).cast(TimestampNTZType)
    case MicroTimestamp => timestamp_micros(c.cast(LongType)).cast(TimestampNTZType)
    case NanoTimestamp  => timestamp_micros((c.cast(LongType) / 1000L).cast(LongType)).cast(TimestampNTZType)
    case ZonedTimestamp => to_timestamp(c).cast(TimestampNTZType)
    case MicroTime      => c.cast(LongType)
    case Year           => c.cast(IntegerType)
    case Json           => c
    case Uuid           => lower(c)
    case DecimalRe(p, s) => c.cast(DecimalType(p.toInt, s.toInt))
    case _              => c
  }

  /** Convert every metadata-tagged column of `df` to its Spark-native
    * representation; untagged columns pass through. One narrow projection
    * — stays inside whole-stage codegen.
    */
  def convert(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      semanticOf(f).map(s => toSpark(col(f.name), s).as(f.name)).getOrElse(col(f.name))
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
