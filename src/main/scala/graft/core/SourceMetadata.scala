package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-column metadata propagation — the Spark re-expression of the
  * reference's `PropagateSourceMetadataToSchemaParameter` column mapper
  * (`debezium-connector-common/.../relational/mapping/
  * PropagateSourceMetadataToSchemaParameter.java:25-58`: schema parameters
  * `__debezium.source.column.{type,length,scale,comment,name}`, type names
  * upper-cased, length/scale/comment only when set) together with its two
  * config surfaces `column.propagate.source.type` (fully-qualified column
  * regex list) and `datatype.propagate.source.type` (type-name regex list)
  * from `RelationalDatabaseConnectorConfig`, and the SINK-side consumer
  * that resolves a target DDL type from those parameters
  * (`debezium-sink/.../util/SchemaUtils.java` + the length/scale-aware
  * branches of `GeneralDatabaseDialect.getTypeName`). Semantics studied,
  * not copied.
  *
  * Design mirrors [[SemanticTypes]]: the source facts ride as `StructField`
  * METADATA (`graft.source.column.*`), never as data columns — zero bytes
  * per row, survive projections and `Alias` renames for free (Spark
  * propagates child attribute metadata through an alias unless overridden),
  * and the envelope pipeline stays oblivious. [[describe]] is the consumer:
  * a schema-driven report of resolved sink types plus a DATA-dependent
  * declared-length audit (one map-side-combined aggregate pass over the
  * corpus — the only distributed work; the per-column assembly joins two
  * O(numColumns) frames).
  */
object SourceMetadata {

  val TypeKey = "graft.source.column.type"
  val LengthKey = "graft.source.column.length"
  val ScaleKey = "graft.source.column.scale"
  val CommentKey = "graft.source.column.comment"
  val NameKey = "graft.source.column.name"

  /** Declared source-column facts. `length`/`scale` use the reference's
    * "unset" convention (absent parameter) via negative sentinels.
    */
  case class SourceColumn(
      typeName: String,
      length: Int = -1,
      scale: Int = Int.MinValue,
      comment: String = null) {
    def lengthOpt: Option[Int] = if (length >= 0) Some(length) else None
    def scaleOpt: Option[Int] = if (scale != Int.MinValue) Some(scale) else None
  }

  /** Exact-name column reference: `col()` parses dots as struct access
    * and backticks as quoting, so schema-driven code must quote (with
    * doubled backticks) to address a field literally named `a.b`.
    */
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  private def metadataFor(base: Metadata, name: String, sc: SourceColumn): Metadata = {
    val b = new MetadataBuilder().withMetadata(base)
      .putString(TypeKey, sc.typeName.toUpperCase(java.util.Locale.ENGLISH))
      .putString(NameKey, name)
    sc.lengthOpt.foreach(l => b.putLong(LengthKey, l.toLong))
    sc.scaleOpt.foreach(s => b.putLong(ScaleKey, s.toLong))
    Option(sc.comment).filter(_.nonEmpty).foreach(c => b.putString(CommentKey, c))
    b.build()
  }

  /** Attach source metadata to every column that (a) appears in `catalog`
    * and (b) matches one of `columnMatch` (the `column.propagate.source.type`
    * regex-list analog; default: all catalogued columns). One narrow
    * projection — no shuffle, no data change.
    */
  def propagate(
      df: DataFrame,
      catalog: Map[String, SourceColumn],
      columnMatch: Seq[String] = Seq(".*")): DataFrame = {
    val res = columnMatch.map(_.r)
    val cols = df.schema.fields.map { f =>
      catalog.get(f.name) match {
        case Some(sc) if res.exists(_.pattern.matcher(f.name).matches()) =>
          qcol(f.name).as(f.name, metadataFor(f.metadata, f.name, sc))
        case _ => qcol(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** `datatype.propagate.source.type` analog: propagate only for columns
    * whose DECLARED source type name matches one of `typeMatch`.
    */
  def propagateByType(
      df: DataFrame,
      catalog: Map[String, SourceColumn],
      typeMatch: Seq[String]): DataFrame = {
    val res = typeMatch.map(_.r)
    val filtered = catalog.filter { case (_, sc) =>
      val t = sc.typeName.toUpperCase(java.util.Locale.ENGLISH)
      res.exists(_.pattern.matcher(t).matches())
    }
    propagate(df, filtered)
  }

  /** Read back the propagated facts, if any. */
  def sourceOf(f: StructField): Option[SourceColumn] =
    if (!f.metadata.contains(TypeKey)) None
    else Some(SourceColumn(
      f.metadata.getString(TypeKey),
      length = if (f.metadata.contains(LengthKey)) f.metadata.getLong(LengthKey).toInt else -1,
      scale = if (f.metadata.contains(ScaleKey)) f.metadata.getLong(ScaleKey).toInt else Int.MinValue,
      comment = if (f.metadata.contains(CommentKey)) f.metadata.getString(CommentKey) else null))

  /** The original source column name (survives sink-side renames). */
  def sourceNameOf(f: StructField): Option[String] =
    if (f.metadata.contains(NameKey)) Some(f.metadata.getString(NameKey)) else None

  private val CharTypes = Set("VARCHAR", "NVARCHAR", "CHAR", "NCHAR", "CHARACTER", "CHARACTER VARYING", "BPCHAR", "TEXT")
  private val DecimalTypes = Set("NUMERIC", "DECIMAL", "NUMBER")

  /** Resolve the sink DDL type for a field: propagated type/length/scale
    * first (character types keep their declared length, decimals their
    * declared precision/scale — the `GeneralDatabaseDialect` rule), Spark
    * type fallback otherwise.
    */
  def sinkType(f: StructField): String = {
    def fallback: String = f.dataType match {
      case LongType => "BIGINT"
      case IntegerType => "INT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case _: TimestampType | _: TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BLOB"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case _ => "TEXT"
    }
    sourceOf(f) match {
      case Some(sc) if CharTypes.contains(sc.typeName) =>
        sc.lengthOpt.map(l => s"VARCHAR($l)").getOrElse("TEXT")
      case Some(sc) if DecimalTypes.contains(sc.typeName) =>
        sc.lengthOpt.map(p => s"DECIMAL($p,${sc.scaleOpt.getOrElse(0)})").getOrElse(fallback)
      case _ => fallback
    }
  }

  /** Consumer report: one row per column of `df` —
    * `(col_name, source_name, source_type, source_length, source_scale,
    * sink_type, len_violations)` where `len_violations` counts rows whose
    * string value exceeds the DECLARED character length (0 for columns
    * with no declared length). The audit is ONE aggregate pass over the
    * data (map-side combined, shuffle = numChecked longs per task); the
    * assembly is a broadcast-sized join of two O(numColumns) frames.
    */
  def describe(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields

    val checked = fields.filter { f =>
      f.dataType == StringType &&
        sourceOf(f).exists(sc => CharTypes.contains(sc.typeName) && sc.lengthOpt.isDefined)
    }
    val vioRows: DataFrame =
      if (checked.isEmpty) spark.range(0).select(lit("").as("col_name"), lit(0L).as("len_violations"))
      else {
        val aggs = checked.map { f =>
          val lim = sourceOf(f).get.length
          sum(when(length(qcol(f.name)) > lim, 1L).otherwise(0L)).as(f.name)
        }
        val one = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
        val stackArgs = checked.flatMap(f => Seq(lit(f.name), qcol(f.name)))
        one.select(stack((Seq(lit(checked.length)) ++ stackArgs).toIndexedSeq: _*)
          .as(Seq("col_name", "len_violations")))
      }

    val metaRows = fields.toIndexedSeq.map { f =>
      val sc = sourceOf(f)
      (f.name,
        sourceNameOf(f).orNull,
        sc.map(_.typeName).orNull,
        sc.flatMap(_.lengthOpt).map(Integer.valueOf).orNull,
        sc.flatMap(_.scaleOpt).map(Integer.valueOf).orNull,
        sinkType(f))
    }
    import spark.implicits._
    val meta = metaRows.toDF("col_name", "source_name", "source_type", "source_length", "source_scale", "sink_type")

    meta.join(broadcast(vioRows), Seq("col_name"), "left")
      .select(col("col_name"), col("source_name"), col("source_type"),
        col("source_length").cast(IntegerType).as("source_length"),
        col("source_scale").cast(IntegerType).as("source_scale"),
        col("sink_type"),
        coalesce(col("len_violations"), lit(0L)).as("len_violations"))
  }
}
