package graft.core

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Debezium-shaped change-event envelope, re-expressed as a Spark
  * `StructType`.
  *
  * Reference semantics (studied, not copied):
  *  - ops r/c/u/d/t/m: `debezium-connector-common/src/main/java/io/debezium/data/Envelope.java:37-62`
  *  - field set before/after/source/op/ts_ms/ts_us/ts_ns/transaction:
  *    `Envelope.java:90-151`
  *  - update carries before+after (`Envelope.java:304-320`), delete carries
  *    only before (`Envelope.java:330-345`).
  *
  * The row schema inside before/after is dynamic (schema evolution), so the
  * engine works on `DataFrame` with an explicit `StructType`, not a fixed
  * case class.
  */
object Envelope {
  val OpRead = "r"
  val OpCreate = "c"
  val OpUpdate = "u"
  val OpDelete = "d"
  val OpTruncate = "t"
  val OpMessage = "m"

  /** Our flat-log encoding of a Kafka tombstone (same key, null value,
    * emitted after a delete when `emitTombstonesOnDelete` is on;
    * `EventDispatcher.java:546-559`). Dropped by the reducer before apply.
    */
  val OpTombstone = "tombstone"

  /** Upsert-like ops: the row exists after the event. */
  val UpsertOps: Seq[String] = Seq(OpRead, OpCreate, OpUpdate)

  /** The fixed base row schema of the repo-change payload
    * (BASELINE.json input_hint: repo, path, commit, lang, content).
    */
  val baseRowSchema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  /** Primary key of the repo-change payload. */
  val keyCols: Seq[String] = Seq("repo", "path")

  /** LWW total order: (commit, lsn) descending picks the winner.
    * Reference: BinlogHistoryRecordComparator.isPositionAtOrBefore
    * (`debezium-connector-binlog/.../history/BinlogHistoryRecordComparator.java:109-137`)
    * compares (file, pos, events-to-skip, row) lexicographically; our analog
    * is the sortable (commit, lsn) pair.
    */
  val orderCols: Seq[String] = Seq("commit", "lsn")

  /** source block: provenance + ordering position
    * (`AbstractSourceInfo.java:22-33` + binlog position fields
    * `BinlogSourceInfo.java:90-97`; we keep (part, lsn) as the position).
    */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("part", IntegerType, nullable = false),
    StructField("lsn", LongType, nullable = false)))

  val transactionSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("total_order", LongType),
    StructField("data_collection_order", LongType)))

  /** Full envelope schema over a given row schema. */
  def schema(row: StructType = baseRowSchema): StructType = StructType(Seq(
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true),
    StructField("source", sourceSchema, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType),
    StructField("ts_us", LongType),
    StructField("ts_ns", LongType),
    StructField("transaction", transactionSchema, nullable = true)))

  /** ExtractNewRecordState ("unwrap") semantics: take `after`, or `before`
    * for deletes, flattened; `__deleted` rewrite mode adds the flag column.
    * Reference: `debezium-connect-plugins/.../transforms/ExtractNewRecordState.java:105-147`.
    */
  def unwrap(env: DataFrame, rewriteDeleted: Boolean = true): DataFrame = {
    val row = coalesce(col("after"), col("before"))
    val base = env.select(
      row.as("row"),
      col("op"),
      col("source.part").as("part"),
      col("source.lsn").as("lsn"),
      col("ts_ms"))
    val flat = base.select(col("row.*"), col("op"), col("part"), col("lsn"), col("ts_ms"))
    if (rewriteDeleted) flat.withColumn("__deleted", (col("op") === OpDelete).cast("string"))
    else flat.filter(col("op") =!= OpDelete)
  }

  /** One `add.fields` / `add.headers` entry of ExtractNewRecordState
    * (`AbstractExtractNewRecordState.FieldReference`,
    * `debezium-connect-plugins/.../AbstractExtractNewRecordState.java:170-240`,
    * studied not copied): `spec` is `field`, `struct.field`, or either
    * followed by `:newName`. An unqualified field resolves to its hosting
    * struct — transaction columns to `transaction`, envelope-level
    * op/ts_ms/ts_us/ts_ns to the envelope itself, everything else to
    * `source`. The outgoing name is `prefix + struct_field` (or the
    * explicit rename).
    */
  private def fieldReference(spec: String, prefix: String): (String, Column) = {
    val parts = spec.trim.split(":", 2)
    val splits = parts(0).split("\\.", 2)
    val (struct0, field) =
      if (splits.length == 2) (splits(0), splits(1))
      else (determineStruct(splits(0)), splits(0))
    // explicit rename wins; a QUALIFIED spec names the output struct_field;
    // an unqualified one keeps the bare name (FieldReference ctor `:190-196`)
    val newName =
      if (parts.length == 2) prefix + parts(1)
      else if (splits.length == 2) prefix + struct0 + "_" + field
      else prefix + field
    val src = if (struct0 == null) col(field) else col(s"$struct0.$field")
    (newName, src)
  }

  /** `AbstractExtractNewRecordState.FieldReference.determineStruct`
    * (`:204-226`): which envelope block hosts an unqualified field name.
    */
  private def determineStruct(field: String): String = field match {
    case "id" | "total_order" | "data_collection_order" => "transaction"
    case "op" | "ts_ms" | "ts_us" | "ts_ns"             => null
    case _                                              => "source"
  }

  /** ExtractNewRecordState with the full config surface
    * (`ExtractNewRecordState.java:140-180` +
    * `ExtractNewRecordStateConfigDefinition.java:86-130`):
    *
    *  - `deleteMode` = `rewrite` (delete rows keep the `before` image and
    *    gain `__deleted=true`), `drop` (deletes removed), `none` (deletes
    *    kept, no flag) — `DeleteTombstoneHandlingMode`.
    *  - `addFields` / `addHeaders`: envelope metadata routed into the
    *    flattened value / the `headers` map, each entry a
    *    [[fieldReference]] spec with `addFieldsPrefix`/`addHeadersPrefix`
    *    (reference default `__`).
    *  - `routeByField`: emits a `__route` column from a payload field
    *    (the reference re-topics; a routing column is the Spark analog,
    *    same as [[graft.operators.Transforms.contentBasedRouter]]).
    *
    * One narrow projection — adds no shuffle at any scale.
    */
  def unwrapAdvanced(
      env: DataFrame,
      deleteMode: String = "rewrite",
      addFields: Seq[String] = Nil,
      addHeaders: Seq[String] = Nil,
      addFieldsPrefix: String = "__",
      addHeadersPrefix: String = "__",
      routeByField: Option[String] = None): DataFrame = {
    require(Seq("rewrite", "drop", "none").contains(deleteMode),
      s"unknown delete handling mode: $deleteMode")
    val row = coalesce(col("after"), col("before"))
    val fieldCols = addFields.map(fieldReference(_, addFieldsPrefix))
      .map { case (n, c) => c.cast("string").as(n) }
    val headerKvs = addHeaders.map(fieldReference(_, addHeadersPrefix))
      .flatMap { case (n, c) => Seq(lit(n), c.cast("string")) }
    val headerCol =
      if (headerKvs.isEmpty) Nil else Seq(map(headerKvs: _*).as("headers"))
    val routeCol = routeByField.map(f => row.getField(f).as("__route")).toSeq
    val deletedCol =
      if (deleteMode == "rewrite")
        Seq((col("op") === OpDelete).cast("string").as("__deleted"))
      else Nil
    val base = if (deleteMode == "drop") env.filter(col("op") =!= OpDelete) else env
    val nested = base.select(
      (Seq(row.as("row")) ++ fieldCols ++ headerCol ++ routeCol ++ deletedCol): _*)
    val rest = nested.columns.filter(_ != "row").map(col).toIndexedSeq
    nested.select(col("row.*") +: rest: _*)
  }

  /** Wrap a flat change log (row cols + op/part/lsn/ts_ms) into envelopes.
    * delete → before only; c/u/r → after only (we don't track prior images
    * in the synthetic log).
    */
  def wrap(flat: DataFrame, rowCols: Seq[String] = baseRowSchema.fieldNames.toSeq): DataFrame = {
    val rowStruct = struct(rowCols.map(col): _*)
    val isDelete = col("op") === OpDelete
    flat.select(
      when(isDelete, rowStruct).otherwise(lit(null)).as("before"),
      when(!isDelete, rowStruct).otherwise(lit(null)).as("after"),
      struct(
        lit("0.1.0").as("version"),
        lit("graft").as("connector"),
        lit("repolog").as("name"),
        col("ts_ms").as("ts_ms"),
        lit("false").as("snapshot"),
        lit("repos").as("db"),
        lit("repo_files").as("table"),
        col("part").as("part"),
        col("lsn").as("lsn")).as("source"),
      col("op"),
      col("ts_ms"),
      (col("ts_ms") * 1000L).as("ts_us"),
      (col("ts_ms") * 1000000L).as("ts_ns"),
      lit(null).cast(transactionSchema).as("transaction"))
  }
}
