package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Custom column converters — the `CustomConverter` SPI re-expressed
  * (`debezium-api/src/main/java/io/debezium/spi/converter/CustomConverter.java:18-48`,
  * `RelationalColumn.java:19-80`, registry chain
  * `debezium-connector-common/src/main/java/io/debezium/relational/
  * CustomConverterRegistry.java:57-135`). Semantics studied, not copied:
  *
  *  - a user supplies an ORDERED chain of converters;
  *  - for each column, every converter sees the full relational column
  *    descriptor (name, data collection, declared source type facts,
  *    optionality) and may REGISTER a replacement — a new field schema
  *    plus a value-conversion function;
  *  - the FIRST converter to register wins (the registry loop breaks on
  *    the first non-empty registration); later converters never see the
  *    column;
  *  - unmatched columns pass through untouched;
  *  - re-application after a schema change recomputes registrations from
  *    scratch (the registry drops stale entries when a table was altered,
  *    `CustomConverterRegistry.java:131-133`).
  *
  * Spark-first: a "registration" is a Catalyst `Column => Column`
  * expression + the declared result `DataType`, so the conversion stays
  * inside whole-stage codegen — applying the chain is ONE narrow
  * projection, no UDF, no shuffle, and the converted value is written
  * once into the event (every downstream consumer sees it, exactly like
  * the reference where conversion happens at emit time, not per sink).
  * The declared source-type facts come from [[SourceMetadata]] field
  * metadata (the engine's column-catalog carrier), so converters can
  * match on `typeName`/`length`/`scale` just like `RelationalColumn`.
  */
object ColumnConverters {

  /** The `RelationalColumn` view a converter matches against. */
  final case class ConvertedColumn(
      name: String,
      dataCollection: String,
      field: StructField,
      source: Option[SourceMetadata.SourceColumn]) {
    /** Declared source type name (upper-cased), when catalogued. */
    def typeName: Option[String] = source.map(_.typeName)
    def length: Option[Int] = source.flatMap(_.lengthOpt)
    def scale: Option[Int] = source.flatMap(_.scaleOpt)
    def isOptional: Boolean = field.nullable
    def sparkType: DataType = field.dataType
  }

  /** A converter's registration for one column: the declared result
    * schema and the value conversion (`ConverterRegistration.register`
    * analog — schema AND converter together). `sourceType`, when given,
    * rewrites the propagated source-type fact so sink-side type
    * resolution ([[SourceMetadata.sinkType]]) follows the conversion.
    */
  final case class Registration(
      dataType: DataType,
      convert: Column => Column,
      sourceType: Option[String] = None)

  /** One user converter (the `CustomConverter` SPI): return Some to
    * claim the column, None to let the next converter in the chain see
    * it.
    */
  trait ColumnConverter {
    def converterFor(column: ConvertedColumn): Option[Registration]
  }

  /** Converter matching on the DECLARED source type name (the classic
    * CustomConverter example — e.g. every `DATE` column). Anchored,
    * case-insensitive regex like the reference's include-list matching.
    */
  def byDeclaredType(typePattern: String)(reg: ConvertedColumn => Registration): ColumnConverter = {
    val p = java.util.regex.Pattern.compile(typePattern, java.util.regex.Pattern.CASE_INSENSITIVE)
    c => c.typeName.filter(t => p.matcher(t).matches()).map(_ => reg(c))
  }

  /** Converter matching on the fully-qualified `collection.column` name. */
  def byName(namePattern: String)(reg: ConvertedColumn => Registration): ColumnConverter = {
    val p = java.util.regex.Pattern.compile(namePattern, java.util.regex.Pattern.CASE_INSENSITIVE)
    c => if (p.matcher(s"${c.dataCollection}.${c.name}").matches()) Some(reg(c)) else None
  }

  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** Apply the converter chain to every column of `df` — one narrow
    * projection (first-wins per column, pass-through otherwise). The
    * registered `dataType` is a CONTRACT: a conversion expression that
    * resolves to a different type is a loud config error (the reference
    * trusts the converter and fails downstream at serialization time;
    * failing at registration is strictly earlier and cheaper).
    */
  def convert(
      df: DataFrame,
      dataCollection: String,
      converters: Seq[ColumnConverter]): DataFrame = {
    val regs: Seq[(StructField, Option[Registration])] =
      df.schema.fields.toIndexedSeq.map { f =>
        val desc = ConvertedColumn(f.name, dataCollection, f, SourceMetadata.sourceOf(f))
        f -> converters.iterator.flatMap(_.converterFor(desc).iterator).nextOption()
      }
    val cols = regs.map {
      case (f, Some(r)) =>
        val md = r.sourceType.fold(f.metadata) { t =>
          new MetadataBuilder().withMetadata(f.metadata)
            .putString(SourceMetadata.TypeKey, t.toUpperCase(java.util.Locale.ENGLISH)).build()
        }
        r.convert(qcol(f.name)).as(f.name, md)
      case (f, None) => qcol(f.name)
    }
    val out = df.select(cols: _*)
    regs.foreach {
      case (f, Some(r)) =>
        val got = out.schema(f.name).dataType
        require(got == r.dataType,
          s"converter for ${dataCollection}.${f.name} registered ${r.dataType.simpleString} " +
            s"but its conversion produces ${got.simpleString}")
      case _ => ()
    }
    out
  }
}
