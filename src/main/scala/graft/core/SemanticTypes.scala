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
  val Time = "Time"                     // int32: MILLIS since midnight (time/Time.java:40)
  val NanoTime = "NanoTime"             // int64: nanos since midnight (time/NanoTime.java:46)
  val ZonedTime = "ZonedTime"           // string: time-of-day with offset (time/ZonedTime.java)
  val MicroDuration = "MicroDuration"   // int64: duration micros (time/MicroDuration.java)
  val NanoDuration = "NanoDuration"     // int64: duration nanos (time/NanoDuration.java)
  // ISO-8601 period string "PnYnMnDTnHnMn.nS" (time/Interval.toIsoString,
  // Interval.java:70-76) → struct(months, days, micros): the parquet-safe
  // shape of CalendarInterval (Spark's interval type cannot be written)
  val Interval = "Interval"
  val Year = "Year"                     // int32
  // MongoDB-style ISO offset strings (time/{IsoDate,IsoTime,IsoTimestamp}
  // .java: ISO_OFFSET_DATE / ISO_OFFSET_TIME / ISO_OFFSET_DATE_TIME)
  val IsoDate = "IsoDate"               // "2024-01-15Z" → DateType (named local date)
  val IsoTime = "IsoTime"               // offset time → UTC µs since midnight
  val IsoTimestamp = "IsoTimestamp"     // offset datetime → UTC TimestampNTZ
  val Json = "Json"                     // string (query via from_json/get_json_object)
  val Uuid = "Uuid"                     // string (normalized lower-case)
  val Xml = "Xml"                       // string (data/Xml.java — passthrough)
  val FloatVector = "FloatVector"       // array<float> (data/vector/FloatVector.java)
  val DoubleVector = "DoubleVector"     // array<double> (data/vector/DoubleVector.java)
  // struct(dimensions int, vector map<int,double>) — pg `sparsevec`
  // (data/vector/SparseDoubleVector.java:28-30: DIMENSIONS_FIELD/VECTOR_FIELD)
  val SparseDoubleVector = "SparseDoubleVector"
  // struct(scale int32, value bytes = BigInteger.toByteArray() big-endian
  // two's complement) — data/VariableScaleDecimal.java:27-28,84-102
  val VariableScale = "VariableScaleDecimal"
  private val DecimalRe = """Decimal\((\d+),(\d+)\)""".r
  private val BitsRe = """Bits\((\d+)\)""".r         // data/Bits.java: BitSet.toByteArray LE bytes
  private val EnumRe = """Enum\(([^)]*)\)""".r       // data/Enum.java: string + `allowed` param
  private val EnumSetRe = """EnumSet\(([^)]*)\)""".r // data/EnumSet.java: comma-separated string

  /** `Bits(n)` semantic name (MySQL BIT(n); n ≤ 63 decodes to long). */
  def bits(n: Int): String = s"Bits($n)"

  /** `Enum(a|b|c)` / `EnumSet(a|b|c)` semantic names (the schema's
    * `allowed` parameter, pipe-separated to keep the name comma-free).
    */
  def enumType(allowed: Seq[String]): String = s"Enum(${allowed.mkString("|")})"
  def enumSetType(allowed: Seq[String]): String = s"EnumSet(${allowed.mkString("|")})"

  /** Unsigned big-endian integer value of a short binary column (built-in
    * chain: hex → base-16 conv → decimal). Exact for ≤ 8 bytes.
    */
  private def beUnsigned(c: Column): Column =
    conv(hex(c), 16, 10).cast(DecimalType(20, 0))

  /** Signed two's-complement big-endian integer of a variable-length
    * binary column (BigInteger.toByteArray layout), as decimal(21,0):
    * sign-extend by the actual byte length when the first byte's high bit
    * is set. Exact for ≤ 8 bytes — the practical range of variable-scale
    * NUMERIC values a sink materializes as double.
    */
  private def beSigned(c: Column): Column = {
    val firstByte = conv(hex(substring(c, 1, 1)), 16, 10).cast(IntegerType)
    // 2^(8·len) as EXACT decimal literals — a double pow() cast to decimal
    // goes through Double.toString, which rounds 2^56 and 2^64 to 17
    // significant digits (observed: 2^64 → …552000, off by 384, corrupting
    // every 7/8-byte negative decode by the rounding residue).
    val width = (1 to 8).foldLeft(lit(0).cast(DecimalType(21, 0))) { (acc, n) =>
      when(length(c) === n,
        lit(BigDecimal(2).pow(8 * n).underlying).cast(DecimalType(21, 0))).otherwise(acc)
    }
    when(firstByte >= 128, beUnsigned(c) - width).otherwise(beUnsigned(c))
  }

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
    // all time-of-day encodings normalize to µs-since-midnight longs so
    // Time/MicroTime/NanoTime columns compare directly (the reference
    // keeps three distinct widths; a lake wants ONE comparable unit)
    case Time           => c.cast(LongType) * 1000L
    case NanoTime       => (c.cast(LongType) / 1000L).cast(LongType)
    case ZonedTime      =>
      // offset applied, UTC time-of-day kept; pmod absorbs offsets that
      // cross midnight in either direction
      pmod(unix_micros(to_timestamp(concat(lit("1970-01-01T"), c))), lit(86400000000L))
    case MicroDuration  => c.cast(LongType)
    case NanoDuration   => (c.cast(LongType) / 1000L).cast(LongType)
    case Interval =>
      def comp(re: String): Column =
        coalesce(nullif(regexp_extract(c, re, 1), lit("")).cast(LongType), lit(0L))
      val secs = coalesce(
        nullif(regexp_extract(c, "([\\d.]+)S", 1), lit("")).cast(DecimalType(20, 9)),
        lit(0).cast(DecimalType(20, 9)))
      // M is months only before T, minutes only after it — anchor both
      val months = comp("^P(?:\\d+Y)?(\\d+)M") + comp("(\\d+)Y") * 12L
      val micros = comp("(\\d+)H") * 3600000000L + comp("T(?:\\d+H)?(\\d+)M") * 60000000L +
        (secs * 1000000L).cast(LongType)
      struct(months.cast(IntegerType).as("months"),
        comp("(\\d+)D").cast(IntegerType).as("days"), micros.as("micros"))
    case Year           => c.cast(IntegerType)
    case IsoDate        => to_date(regexp_replace(c, "(Z|[+-]\\d{2}:?\\d{2})$", ""))
    case IsoTime        =>
      pmod(unix_micros(to_timestamp(concat(lit("1970-01-01T"), c))), lit(86400000000L))
    case IsoTimestamp   => to_timestamp(c).cast(TimestampNTZType)
    case Json           => c
    case Uuid           => lower(c)
    case Xml            => c
    case FloatVector | DoubleVector => c // already array<float>/array<double>
    case DecimalRe(p, s) => c.cast(DecimalType(p.toInt, s.toInt))
    case BitsRe(n) =>
      // BitSet.toByteArray is LITTLE-endian bytes at a FIXED width
      // ceil(n/8) (Bits.java:55-60); reverse the bytes statically, then
      // the unsigned big-endian chain yields the numeric bit pattern.
      val bytes = (n.toInt + 7) / 8
      require(n.toInt <= 63, s"Bits($n) exceeds long range; keep the raw binary")
      // BitSet.toByteArray TRIMS trailing zero bytes, so the column may be
      // shorter than the width: substring past the end is empty binary,
      // hex("") = "", and the concat degrades to the present low bytes.
      val beHex = concat((bytes to 1 by -1).map(i => hex(substring(c, i, 1))): _*)
      coalesce(conv(beHex, 16, 10).cast(LongType), lit(0L))
    case EnumRe(allowed) =>
      // invalid values → null (the reference's converters emit null/empty
      // for values outside the `allowed` schema parameter)
      when(c.isin(allowed.split("\\|").toIndexedSeq: _*), c)
    case EnumSetRe(allowed) =>
      // comma-separated string → array<string>, unknown members dropped
      val ok = typedLit(allowed.split("\\|").toSeq)
      filter(split(c, ","), v => array_contains(ok, v))
    case VariableScale =>
      // struct(scale, value) → double: unscaled / 10^scale
      // (decimal.handling.mode=double analog for variable-scale NUMERIC)
      beSigned(c.getField("value")).cast(DoubleType) /
        pow(lit(10.0), c.getField("scale").cast(DoubleType))
    case SparseDoubleVector =>
      // densify: element i of 1..dimensions from the sparse map, else 0.0
      transform(sequence(lit(1), c.getField("dimensions").cast(IntegerType)),
        i => coalesce(try_element_at(c.getField("vector"), i), lit(0.0)))
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
