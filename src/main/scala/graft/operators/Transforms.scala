package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Envelope

/** Single-message transforms (SMTs) re-expressed as Catalyst column
  * pipelines — Debezium's Kafka Connect `Transformation<R>` chain
  * (SURVEY.md §2.2) without the per-record interpreter: each transform is
  * a declarative `DataFrame => DataFrame` so Catalyst fuses the whole SMT
  * chain into one whole-stage-codegen projection. At 100 TB this matters:
  * the reference applies SMTs record-at-a-time on a poll thread
  * (`AsyncEmbeddedEngine.java:581-594`); here the chain is a single pass
  * over columnar batches with predicate pushdown through it.
  *
  * All transforms operate on either the flat change log
  * (repo/path/commit/lang/content/op/part/lsn/ts_ms) or the envelope form
  * (before/after/source/op/...); each Scaladoc cites the reference
  * behavior it mirrors.
  */
object Transforms {

  // ---------------------------------------------------------------- filters

  /** Table include/exclude regex filter over the source table name.
    * Reference: `RelationalTableFilters` / `Selectors`
    * (`debezium-connector-common/.../relational/RelationalTableFilters.java`,
    * `Selectors.java:335`): include wins over exclude; both optional.
    */
  def tableFilter(
      env: DataFrame,
      include: Option[String] = None,
      exclude: Option[String] = None,
      tableCol: Column = col("source.table")): DataFrame = {
    val inc = include.map(r => tableCol.rlike(r)).getOrElse(lit(true))
    val exc = exclude.map(r => !tableCol.rlike(r)).getOrElse(lit(true))
    env.where(if (include.isDefined) inc else inc && exc)
  }

  /** Drop operations listed in `skipped.operations` — never emit them.
    * Reference: `EventDispatcher.java:91-92,278-340`
    * (`shouldEmitNoEventsForSkippedCreateOperations`, BinlogConnectorIT:2380).
    */
  def skipOperations(df: DataFrame, skipped: Seq[String]): DataFrame =
    if (skipped.isEmpty) df else df.where(!col("op").isin(skipped: _*))

  /** Record-size guardrail: drop (or fail on) rows whose payload exceeds
    * `maxBytes`. Reference: `transforms/EnforceRecordSize.java`.
    */
  def enforceRecordSize(df: DataFrame, payload: Column, maxBytes: Int, fail: Boolean = false): DataFrame = {
    val size = octet_length(payload)
    if (fail) {
      // raise_error inside a filter keeps the check distributed.
      df.withColumn("__sz", size)
        .withColumn("__chk",
          when(col("__sz") > maxBytes,
            raise_error(concat(lit(s"record exceeds $maxBytes bytes: "), col("__sz"))))
            .otherwise(lit(null)))
        .drop("__sz", "__chk")
    } else df.where(size.isNull || size <= maxBytes)
  }

  /** Scripting-filter analog: arbitrary SQL predicate replaces the
    * JSR-223/Graal expression. Reference: `debezium-scripting/.../Filter.java`.
    */
  def filterExpr(df: DataFrame, predicate: String): DataFrame =
    df.where(expr(predicate))

  // ----------------------------------------------- column-level projections

  /** Column masking: replace a payload column with a constant mask.
    * Reference: `relational/mapping/MaskStrings.java` wired through
    * `ColumnMappers.java:56-74`
    * (`shouldConsumeEventsWithMaskedAndExcludedColumns`, BinlogConnectorIT:1314).
    */
  def maskColumn(df: DataFrame, column: String, mask: String = "***"): DataFrame =
    df.withColumn(column, when(col(column).isNotNull, lit(mask)).otherwise(lit(null).cast("string")))

  /** Column hash-masking: salted SHA-256 of the value, hex-encoded.
    * Reference: `MaskStrings.HashValueConverter`
    * (`shouldConsumeEventsWithMaskedHashedColumns`, BinlogConnectorIT:1370).
    */
  def hashColumn(df: DataFrame, column: String, salt: String): DataFrame =
    df.withColumn(column, sha2(concat(lit(salt), col(column)), 256))

  /** Column truncation to n characters.
    * Reference: `relational/mapping/TruncateColumn.java`.
    */
  def truncateColumn(df: DataFrame, column: String, n: Int): DataFrame =
    df.withColumn(column, substring(col(column), 1, n))

  /** Column include/exclude projection on the payload columns of a flat
    * log (meta columns op/part/lsn/ts_ms always survive). Reference:
    * column filters in `TableSchemaBuilder.create` (`TableSchemaBuilder.java:155-203`).
    */
  val MetaCols: Seq[String] = Seq("op", "part", "lsn", "ts_ms")

  def projectColumns(
      df: DataFrame,
      include: Option[Seq[String]] = None,
      exclude: Seq[String] = Nil): DataFrame = {
    val payload = df.columns.filterNot(MetaCols.contains)
    val kept = payload
      .filter(c => include.forall(_.contains(c)))
      .filterNot(exclude.contains)
    df.select((kept ++ MetaCols.filter(df.columns.contains)).map(col).toIndexedSeq: _*)
  }

  // ------------------------------------------------------- record reshaping

  /** ExtractChangedRecordState: list the payload fields whose value changed
    * between `before` and `after` (null-safe), as a sorted comma-joined
    * string (stable across engines). Reference:
    * `transforms/ExtractChangedRecordState.java` — emits changed/unchanged
    * field-name headers for updates.
    */
  def changedFields(env: DataFrame, fields: Seq[String] = Envelope.baseRowSchema.fieldNames.toSeq): Column = {
    val changed = fields.sorted.map { f =>
      when(!(col(s"before.$f") <=> col(s"after.$f")), lit(f))
    }
    array_join(filter(array(changed: _*), c => c.isNotNull), ",")
  }

  /** Rewrite snapshot reads as inserts (`op: r -> c`) for consumers that
    * do not understand 'r'. Reference:
    * `debezium-connector-mysql/.../transforms/ReadToInsertEvent.java`.
    */
  def readToInsert(df: DataFrame): DataFrame =
    df.withColumn("op", when(col("op") === Envelope.OpRead, Envelope.OpCreate).otherwise(col("op")))

  /** Content-based router: compute the sink route from an SQL expression
    * over the record. Reference: `debezium-scripting/.../ContentBasedRouter.java`
    * (expression language → Spark SQL).
    */
  def contentBasedRouter(df: DataFrame, routeExpr: String, routeCol: String = "__route"): DataFrame =
    df.withColumn(routeCol, expr(routeExpr))

  /** ByLogicalTableRouter: collapse physical shard names onto one logical
    * name by regex, keeping the original as a key discriminator column so
    * merged keys stay unique. Reference: `transforms/ByLogicalTableRouter.java:462`.
    */
  def byLogicalTableRouter(
      df: DataFrame,
      nameCol: Column,
      pattern: String,
      replacement: String,
      logicalCol: String = "__logical_table",
      discriminatorCol: String = "__shard"): DataFrame =
    df.withColumn(logicalCol, regexp_replace(nameCol, pattern, replacement))
      .withColumn(discriminatorCol, nameCol)

  /** PartitionRouting / ComputePartition: stable partition from the hash of
    * chosen payload fields. Reference semantics `abs(hash(fields)) % n`
    * (`transforms/partitions/PartitionRouting.java:243-251`); we use
    * Murmur3 (Spark's `hash`) — same contract: deterministic key→partition.
    */
  def partitionRouting(df: DataFrame, fields: Seq[String], numPartitions: Int, out: String = "__partition"): DataFrame =
    df.withColumn(out, pmod(hash(fields.map(col): _*), lit(numPartitions)))

  /** Outbox EventRouter: unpack outbox-table rows — route by aggregate
    * type, key by aggregate id, payload expansion, passthrough extras.
    * Reference: `transforms/outbox/EventRouter.java` + `EventRouterDelegate`.
    * Input: flat log whose payload has (aggregatetype, aggregateid,
    * event_type, payload) columns.
    *
    * `additionalFields` mirrors `table.fields.additional.placement`
    * (`EventRouterDelegate.java:80-81,192-196`): (outbox column, placement)
    * pairs routed into the event —
    *  - "value": a top-level column of the routed event;
    *  - "header": an entry of a `headers` map column (the Kafka-header
    *    analog; string-rendered like the reference's header converter);
    *  - "envelope": a field of an `additional` struct column (the
    *    reference nests envelope-placed fields beside the payload).
    */
  def outboxRouter(
      df: DataFrame,
      additionalFields: Seq[(String, String)] = Nil): DataFrame = {
    val base = Seq(
      col("aggregatetype").as("route"),
      col("aggregateid").as("key"),
      col("event_type"),
      col("payload"),
      col("lsn"),
      col("ts_ms"))
    val valueCols = additionalFields.collect { case (c, "value") => col(c) }
    val headerKvs = additionalFields.collect { case (c, "header") => Seq(lit(c), col(c).cast("string")) }
    val headerCol = if (headerKvs.isEmpty) Nil else Seq(map(headerKvs.flatten: _*).as("headers"))
    val envFields = additionalFields.collect { case (c, "envelope") => col(c).as(c) }
    val envCol = if (envFields.isEmpty) Nil else Seq(struct(envFields: _*).as("additional"))
    val unknown = additionalFields.collect {
      case (c, p) if !Set("value", "header", "envelope")(p) => s"$c:$p"
    }
    require(unknown.isEmpty, s"unknown placement(s): ${unknown.mkString(", ")}")
    df.where(col("op").isin(Envelope.OpCreate, Envelope.OpRead)) // outbox rows are INSERT-only
      .select(base ++ valueCols ++ headerCol ++ envCol: _*)
  }

  /** TimezoneConverter: re-render an epoch-millis column as a timestamp in
    * a target zone. Reference: `transforms/TimezoneConverter.java:582`.
    */
  def convertTimezone(df: DataFrame, column: String, tz: String, out: String): DataFrame =
    df.withColumn(out, from_utc_timestamp(timestamp_millis(col(column)), tz))

  /** TimezoneConverter with the reference's per-field include/exclude
    * lists (`converted.timezone` + `include.list`/`exclude.list`,
    * `transforms/TimezoneConverter.java` — the reference's is configurable
    * per field; include wins over the default field set, exclude always
    * subtracts). Selected epoch-millis columns are converted IN PLACE to
    * timestamps in `tz`; the default field set is every `ts_*` column.
    */
  def convertTimezones(
      df: DataFrame,
      tz: String,
      include: Option[Seq[String]] = None,
      exclude: Seq[String] = Nil): DataFrame = {
    val fields = include.getOrElse(df.columns.toSeq.filter(_.startsWith("ts_")))
      .filter(df.columns.contains).filterNot(exclude.contains)
    fields.foldLeft(df)((d, f) =>
      d.withColumn(f, from_utc_timestamp(timestamp_millis(col(f)), tz)))
  }

  /** Tombstone emission: after every delete, a marker record with the same
    * key, position, and a null payload — so log-compacted downstream stores
    * drop the key. Reference: `EventDispatcher.java:546-559`
    * (`emitTombstonesOnDelete`; `shouldEmitTombstoneOnDeleteByDefault`,
    * BinlogConnectorIT:1474). The reducer drops tombstones before apply.
    */
  def emitTombstones(df: DataFrame, keyCols: Seq[String] = Envelope.keyCols): DataFrame = {
    val keep = (keyCols ++ MetaCols ++ Seq("commit")).toSet
    val tombs = df.where(col("op") === Envelope.OpDelete)
      .select(df.columns.map { c =>
        if (keep.contains(c)) col(c) else lit(null).cast(df.schema(c).dataType).as(c)
      }.toIndexedSeq: _*)
      .withColumn("op", lit(Envelope.OpTombstone))
    df.unionByName(tombs)
  }

  /** ReselectColumnsPostProcessor: events carrying an "unavailable value
    * placeholder" (e.g. Postgres TOAST columns not present in the WAL) get
    * those columns patched from the current sink state by a key lookup
    * join. Reference: `processors/reselect/ReselectColumnsPostProcessor.java:55,263-303`
    * (re-queries the SOURCE row; our sink state is the converged analog).
    * The join is a plain equi-join on the key — broadcastable when the
    * affected-event set is small, AQE-planned otherwise.
    */
  def reselectColumns(
      events: DataFrame,
      state: DataFrame,
      columns: Seq[String],
      placeholder: String,
      keyCols: Seq[String] = Envelope.keyCols): DataFrame = {
    val st = state.select((keyCols ++ columns).map(col).toIndexedSeq: _*)
      .toDF(keyCols ++ columns.map(c => s"__st_$c"): _*)
    val joined = events.join(st, keyCols, "left")
    columns.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(col(c) === placeholder, col(s"__st_$c")).otherwise(col(c)))
    }.drop(columns.map(c => s"__st_$c"): _*)
  }

  /** HeaderToValue: copy/move entries of a map-typed headers column into
    * value columns. Reference: `transforms/HeaderToValue.java:216` (headers
    * are first-class columns in Spark, so this is a projection).
    */
  def headerToValue(
      df: DataFrame,
      headers: Seq[String],
      headersCol: String = "headers",
      prefix: String = "",
      drop: Boolean = false): DataFrame = {
    val out = headers.foldLeft(df)((d, h) => d.withColumn(prefix + h, element_at(col(headersCol), h)))
    if (drop) out.drop(headersCol) else out
  }

  /** ExtractSchemaToNewRecord: copy schema metadata into the payload
    * (`__debezium.source.column.type` analog). Reference:
    * `transforms/ExtractSchemaToNewRecord.java`.
    */
  def extractSchemaToNewRecord(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.foldLeft(df)((d, c) => d.withColumn(s"__${c}_type", lit(df.schema(c).dataType.sql)))

  /** VectorToJsonConverter: render a numeric vector column as a JSON array
    * string. Reference: `transforms/VectorToJsonConverter.java`. The values
    * are fixed-point-scaled to integers first (portable formatting: float
    * JSON rendering differs between engines; integer rendering does not).
    */
  def vectorToJson(vec: Column, scale: Int = 3): Column =
    to_json(transform(vec, x => round(x.cast("double") * math.pow(10, scale)).cast("long")))

  /** Transaction metadata aggregation: per-transaction event counts and
    * boundaries — the BEGIN/END + `event_count` summary stream produced by
    * `TransactionMonitor.dataEvent/transactionStartedEvent`
    * (`pipeline/txmetadata/TransactionMonitor.java:75-121`), expressed as
    * one groupBy. `total_order`/`data_collection_order` analogs fall out
    * of the min/max positions.
    */
  def transactionSummary(df: DataFrame, txCol: Column, collectionCol: Column): DataFrame =
    df.groupBy(txCol.as("tx_id"))
      .agg(
        count(lit(1)).as("event_count"),
        min(col("lsn")).as("begin_lsn"),
        max(col("lsn")).as("end_lsn"),
        countDistinct(collectionCol).as("data_collections"))

  /** CloudEvents 1.0 envelope serialization of a change event, as a JSON
    * string column. Reference: `debezium-api/.../engine/format/CloudEvents`
    * + `converters/CloudEventsConverter` — id, source, specversion, type,
    * and the row image under `data`. Kept to JSON-safe scalar fields so
    * the representation is engine-portable (our sink is Parquet-native;
    * this is the export surface).
    */
  def toCloudEvent(
      dataFields: Seq[String],
      source: String = "/graft/repolog"): Column =
    to_json(struct(
      concat(lit("graft-"), col("lsn").cast("string")).as("id"),
      lit(source).as("source"),
      lit("1.0").as("specversion"),
      concat(lit("io.graft.repolog.DataChangeEvent."), col("op")).as("type"),
      col("ts_ms").as("time_ms"),
      struct(dataFields.map(col): _*).as("data")))

  /** Transaction-metadata EVENT STREAM — BEGIN/END marker records
    * interleaved with data events, each data event carrying the
    * `transaction{id, total_order, data_collection_order}` block
    * (`TransactionMonitor.dataEvent/transactionStartedEvent/
    * transactionEndedEvent`, `pipeline/txmetadata/TransactionMonitor.java:75-121`
    * — round 1 shipped only the batch summary; this is the interleaved
    * stream shape). Consumers order by (lsn, ord): `ord` ranks BEGIN(0) <
    * event(1) < END(2), so at a shared lsn the BEGIN precedes the
    * transaction's first event and the END follows its last — sorting by
    * the kind STRING would malform the interleave ('end' < 'event'). The
    * END carries `event_count` as in the reference.
    */
  def transactionEvents(df: DataFrame, txCol: Column, collectionCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(txCol.as("tx_id"), collectionCol.as("__coll"), col("lsn"))
    val wTx = Window.partitionBy(col("tx_id")).orderBy(col("lsn"))
    val wColl = Window.partitionBy(col("tx_id"), col("__coll")).orderBy(col("lsn"))
    val nulls = lit(null).cast("long")
    val data = base.select(
      lit("event").as("kind"), lit(1).as("ord"), col("tx_id"), col("lsn"),
      row_number().over(wTx).cast("long").as("total_order"),
      row_number().over(wColl).cast("long").as("data_collection_order"),
      nulls.as("event_count"))
    val bounds = base.groupBy(col("tx_id"))
      .agg(min(col("lsn")).as("b"), max(col("lsn")).as("e"), count(lit(1)).as("n"))
    val begins = bounds.select(lit("begin").as("kind"), lit(0).as("ord"), col("tx_id"), col("b").as("lsn"),
      nulls.as("total_order"), nulls.as("data_collection_order"), nulls.as("event_count"))
    val ends = bounds.select(lit("end").as("kind"), lit(2).as("ord"), col("tx_id"), col("e").as("lsn"),
      nulls.as("total_order"), nulls.as("data_collection_order"), col("n").as("event_count"))
    data.unionByName(begins).unionByName(ends)
  }

  /** Engine-portable stable routing hash: sum of the ascii codes of the
    * md5 hex digest, mod n. Same contract as [[partitionRouting]]
    * (deterministic key→partition, `PartitionRouting.java:243-251`) but
    * reproducible in any engine that has md5 — used where a cross-engine
    * oracle must recompute the route. Production path stays Murmur3.
    */
  def stableRoute(key: Column, n: Int): Column = {
    val h = md5(key)
    pmod(
      aggregate(
        transform(sequence(lit(1), lit(32)), i => ascii(h.substr(i, lit(1))).cast("long")),
        lit(0L), (acc, c) => acc + c),
      lit(n.toLong))
  }

  // ------------------------------------------------------------- geometry

  /** Convert a `STRUCT<wkb BINARY, srid INT>` geometry column (§1.4's
    * `io.debezium.data.geometry.Geometry` mapping) between WKB and EWKB.
    * Reference: `GeometryFormatTransformer.java:172-199` — WKB→EWKB
    * splices the srid into the byte stream (failing when srid is null,
    * `:183-186`); EWKB→WKB strips it. Unlike the reference (which
    * toggles off the detected input format), `target` here is directed:
    * payloads already in the target format pass through unchanged.
    * Codegen'd byte-level expressions — no UDF, stays in whole-stage.
    */
  def geometryFormat(df: DataFrame, geomCol: String, target: String): DataFrame = {
    import GeometryExprs._
    val g = col(geomCol)
    val converted = target match {
      case "ewkb" =>
        when(g.isNull, g.getField("wkb"))
          .when(g.getField("srid").isNull && !wkb_is_extended(g.getField("wkb")),
            raise_error(lit("Cannot convert to EWKB when SRID is null")))
          .otherwise(wkb_to_ewkb(g.getField("wkb"), g.getField("srid")))
      case "wkb" => ewkb_to_wkb(g.getField("wkb"))
      case other => throw new IllegalArgumentException(s"target must be wkb|ewkb, got $other")
    }
    df.withColumn(geomCol, when(g.isNull, g)
      .otherwise(struct(converted.as("wkb"), g.getField("srid").as("srid"))))
  }

  /** Swap x/y coordinates of geometries whose srid is in `srids`
    * (EPSG↔GIS axis-order fix). Reference:
    * `SwapGeometryCoordinates.java:120-135` — null srid passes through
    * unchanged; default srid list 4326/3857/4269 (`:45`). The byte
    * stream is rewritten in place shape-preservingly (same schema).
    */
  def swapGeometryCoordinates(
      df: DataFrame,
      geomCol: String,
      srids: Seq[Int] = Seq(4326, 3857, 4269)): DataFrame = {
    import GeometryExprs._
    val g = col(geomCol)
    val swapped = when(g.getField("srid").isin(srids.map(Integer.valueOf): _*),
      wkb_swap_xy(g.getField("wkb"))).otherwise(g.getField("wkb"))
    df.withColumn(geomCol, when(g.isNull, g)
      .otherwise(struct(swapped.as("wkb"), g.getField("srid").as("srid"))))
  }

  // ----------------------------------------------------------- timescaledb

  /** TimescaleDb SMT: map physical chunk tables
    * (`_timescaledb_internal._hyper_<H>_<N>_chunk`) back to their logical
    * hypertable — or, for materialized continuous aggregates, to the
    * aggregate — rewriting `source.schema`/`source.table`, computing the
    * routed topic `prefix.schema.table`, and keeping the original chunk
    * identity as header columns. Reference:
    * `debezium-connector-postgres/.../transforms/timescaledb/TimescaleDb.java:68-136`
    * (catalog lookups `:93-106`, topic `:124-126`, headers `:128-136`).
    * The reference queries the information schema per record; here the
    * catalog is a small DataFrame broadcast-joined once per batch — the
    * Spark-shaped equivalent of its metadata cache.
    *
    * `catalog` schema: hypertable_id INT, hyper_schema, hyper_table,
    * agg_schema, agg_table (nullable strings).
    */
  def timescaleDb(
      df: DataFrame,
      catalog: DataFrame,
      topicPrefix: String,
      schemaCol: Column = col("source.schema"),
      tableCol: Column = col("source.table"),
      internalSchema: String = "_timescaledb_internal"): DataFrame = {
    val hyperId = regexp_extract(tableCol, "^_hyper_(\\d+)_\\d+_chunk$", 1)
    val keyed = df
      .withColumn("__ts_chunk_schema", schemaCol)
      .withColumn("__ts_chunk_table", tableCol)
      .withColumn("__hyper_id",
        when(schemaCol === internalSchema && hyperId =!= "", hyperId.cast("int")))
    val joined = keyed.join(broadcast(catalog), keyed("__hyper_id") === catalog("hypertable_id"), "left")
    val outSchema = coalesce(col("agg_schema"), col("hyper_schema"), col("__ts_chunk_schema"))
    val outTable = coalesce(col("agg_table"), col("hyper_table"), col("__ts_chunk_table"))
    joined
      .withColumn("__ts_hypertable_schema",
        when(col("agg_schema").isNotNull, col("hyper_schema")))
      .withColumn("__ts_hypertable_table",
        when(col("agg_table").isNotNull, col("hyper_table")))
      .withColumn("__topic",
        when(col("hyper_table").isNotNull,
          concat_ws(".", lit(topicPrefix), outSchema, outTable)))
      .withColumn("__ts_schema", outSchema)
      .withColumn("__ts_table", outTable)
      .drop("hypertable_id", "hyper_schema", "hyper_table", "agg_schema", "agg_table", "__hyper_id")
  }

  // ------------------------------------------------------ value handling

  /** `decimal.handling.mode` (reference:
    * `RelationalDatabaseConnectorConfig.DecimalHandlingMode` — precise /
    * double / string): how exact-numeric columns are rendered to
    * consumers. `precise` keeps the decimal; `double` trades precision
    * for a primitive; `string` keeps the exact rendering (scale
    * preserved, e.g. "2.00") portable. Narrow per-row casts — no shuffle.
    */
  def decimalHandling(df: DataFrame, columns: Seq[String], mode: String): DataFrame = mode match {
    case "precise" => df
    case "double"  => columns.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))
    case "string"  => columns.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("string")))
    case m         => throw new IllegalArgumentException(s"unknown decimal.handling.mode: $m")
  }

  /** `binary.handling.mode` (reference:
    * `CommonConnectorConfig.BinaryHandlingMode` — bytes / base64 /
    * base64-url-safe / hex): how binary columns are rendered. Hex is
    * lowercase like the reference's `HexConverter`.
    */
  def binaryHandling(df: DataFrame, columns: Seq[String], mode: String): DataFrame = {
    def render(c: Column): Column = mode match {
      case "bytes"           => c
      case "base64"          => base64(c)
      case "base64-url-safe" => translate(base64(c), "+/", "-_")
      case "hex"             => lower(hex(c))
      case m                 => throw new IllegalArgumentException(s"unknown binary.handling.mode: $m")
    }
    columns.foldLeft(df)((d, c) => d.withColumn(c, render(col(c))))
  }

  /** `time.precision.mode` (reference: `TemporalPrecisionMode` —
    * adaptive / adaptive_time_microseconds / connect): how timestamp
    * columns are rendered as epoch numbers. `adaptive` keeps source
    * precision (micros here — the envelope's native resolution);
    * `connect` forces Kafka Connect's millisecond Timestamp.
    */
  def temporalPrecision(df: DataFrame, columns: Seq[String], mode: String): DataFrame = {
    def render(c: Column): Column = mode match {
      case "adaptive" | "adaptive_time_microseconds" => unix_micros(c)
      case "connect"                                 => unix_millis(c)
      case m => throw new IllegalArgumentException(s"unknown time.precision.mode: $m")
    }
    columns.foldLeft(df)((d, c) => d.withColumn(c, render(col(c))))
  }

  // ----------------------------------------------- logical decoding messages

  /** DecodeLogicalDecodingMessageContent analog (postgres
    * `pg_logical_emit_message` events; `debezium-connector-postgres/.../
    * transforms/DecodeLogicalDecodingMessageContent.java:92-200`): a
    * message event carries `message = struct(prefix, content: binary)`
    * where content is a JSON document; the transform decodes content into
    * a structured `after`, drops the `message` field, rewrites `op` to
    * `'c'` (so the record looks like an INSERT — the documented usage is
    * piping the result into the outbox [[outboxRouter]]), and clears the
    * key (our flat model has no separate key column to clear).
    *
    * Spark-first deviation, documented: the reference infers a Connect
    * schema PER RECORD from the JSON (`JsonSchemaData`); a Catalyst plan
    * is statically typed, so the caller declares the content schema as a
    * DDL string — `from_json` then decodes inside whole-stage codegen
    * instead of per-record Jackson trees. `failOnError=true` mirrors the
    * reference's DebeziumException on unparseable content (FAILFAST);
    * false yields a null `after` instead (PERMISSIVE).
    */
  def decodeMessageContent(
      messages: DataFrame,
      contentDdl: String,
      failOnError: Boolean = true): DataFrame = {
    require(messages.columns.contains("message"),
      "decodeMessageContent expects a message struct(prefix, content) column")
    val opts = Map("mode" -> (if (failOnError) "FAILFAST" else "PERMISSIVE"))
    val keep = messages.columns.filter(c => c != "message" && c != "op").map(col)
    messages
      .where(col("op") === "m") // route message events here (ContentBasedRouter)
      .select(keep.toIndexedSeq
        :+ lit(Envelope.OpCreate).as("op")
        :+ from_json(col("message").getField("content").cast("string"), contentDdl, opts)
          .as("after"): _*)
  }

  // ------------------------------------------------------------ field naming

  /** snake_case conversion — `Strings.toSnakeCase` semantics
    * (`debezium-util/.../Strings.java:1346-1353`): an underscore lands at
    * every lower→UPPER, letter→digit and digit→letter boundary and every
    * dot, then the whole name lower-cases. Implemented as a char fold
    * (studied, not copied).
    */
  private def asciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def asciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def toSnakeCase(name: String): String = {
    val sb = new StringBuilder
    var prev = 0.toChar
    name.foreach { c =>
      if (c == '.') sb.append('_')
      else {
        val boundary =
          (prev >= 'a' && prev <= 'z' && c >= 'A' && c <= 'Z') ||
            (asciiLetter(prev) && asciiDigit(c)) ||
            (asciiDigit(prev) && asciiLetter(c))
        if (boundary) sb.append('_')
        sb.append(c.toLower)
      }
      prev = c
    }
    sb.toString
  }

  /** camelCase conversion — `Strings.convertDotAndUnderscoreStringTo-
    * CamelCase` semantics (`Strings.java:1287-1303`): split on runs of
    * dots/underscores, first segment untouched, every later segment
    * capitalized.
    */
  def toCamelCase(name: String): String = {
    val words = name.split("[._]+").filter(_.nonEmpty)
    if (words.isEmpty) ""
    else (words.head +: words.tail.map(w => w.head.toUpper + w.tail)).mkString
  }

  /** Avro-compatible name adjustment — `SchemaNameAdjuster` /
    * `FieldNameSelector` semantics (`debezium-connector-common/.../schema/
    * SchemaNameAdjuster.java:40-58`): valid chars are `[A-Za-z0-9_]` (the
    * FIRST char may not be a digit); each invalid char becomes `_`
    * (mode `avro`) or `_uXXXX` with the hex code point (mode
    * `avro_unicode`, collision-free for native names). Mode `none`
    * passes through.
    */
  def adjustAvroName(name: String, mode: String): String = mode match {
    case "none" => name
    case "avro" | "avro_unicode" =>
      val sb = new StringBuilder
      name.zipWithIndex.foreach { case (c, i) =>
        val valid = c == '_' || asciiLetter(c) || (i > 0 && asciiDigit(c))
        if (valid) sb.append(c)
        else if (mode == "avro") sb.append('_')
        else sb.append(f"_u${c.toInt}%04x")
      }
      sb.toString
    case m => throw new IllegalArgumentException(s"unknown field.name.adjustment.mode: $m")
  }

  /** FieldNameTransformation (`debezium-connect-plugins/.../
    * FieldNameTransformation.java:49-140` + `NamingStyleUtils.java:36-48`)
    * fused with field-name adjustment: every column renames to
    * `prefix + style(name) + suffix`, then Avro-adjusts per
    * `field.name.adjustment.mode`. The ORIGINAL name rides along as
    * [[graft.core.SourceMetadata.NameKey]] metadata (the reference stores
    * it as a schema parameter for exactly this reason —
    * `PropagateSourceMetadataToSchemaParameter.java:54-57`); an earlier
    * propagated source name is preserved, so chained renames keep the
    * FIRST origin. One narrow projection, no shuffle; collisions (two
    * columns mapping to one name) fail loudly like the reference's
    * conflict reporter.
    */
  def renameFields(
      df: DataFrame,
      style: String = "default",
      prefix: String = "",
      suffix: String = "",
      avroMode: String = "none"): DataFrame = {
    import graft.core.SourceMetadata
    import org.apache.spark.sql.types.MetadataBuilder
    def styled(n: String): String = style match {
      case "default"                  => n
      case "snake_case"               => toSnakeCase(n)
      case "camel_case" | "camelCase" => toCamelCase(n)
      case "UPPER_CASE" | "upper_case" => n.toUpperCase(java.util.Locale.ROOT)
      case "lower_case"               => n.toLowerCase(java.util.Locale.ROOT)
      case s => throw new IllegalArgumentException(s"unknown column.naming.style: $s")
    }
    val renames = df.schema.fields.map { f =>
      f -> adjustAvroName(prefix + styled(f.name) + suffix, avroMode)
    }
    val dupes = renames.groupBy(_._2).filter(_._2.length > 1).keys
    require(dupes.isEmpty,
      s"field renaming collides on: ${dupes.mkString(", ")} (originals: " +
        s"${renames.filter(r => dupes.exists(_ == r._2)).map(_._1.name).mkString(", ")})")
    val cols = renames.map { case (f, newName) =>
      val meta = if (f.metadata.contains(SourceMetadata.NameKey)) f.metadata
      else new MetadataBuilder().withMetadata(f.metadata)
        .putString(SourceMetadata.NameKey, f.name).build()
      col("`" + f.name.replace("`", "``") + "`").as(newName, meta)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Expression-level naming styles over a DATA column — the route /
    * collection name is per-record data, so unlike [[renameFields]] (static
    * schema names, driver-side strings) the styling must be a Catalyst
    * expression. Semantics lock-step with `NamingStyleUtils.applyNamingStyle`
    * (`debezium-connector-jdbc/.../util/NamingStyleUtils.java:36-48`):
    * snake_case inserts `_` at lower→UPPER, letter→digit and digit→letter
    * boundaries and at dots, then lower-cases (`Strings.toSnakeCase` — same
    * boundary set as [[toSnakeCase]]); camelCase splits on runs of
    * dots/underscores, first segment untouched, later segments capitalized
    * with their tails unchanged. All built-ins — regexp/string kernels
    * inside whole-stage codegen, no UDF.
    */
  def styledColumn(c: Column, style: String): Column = style match {
    case "default"                   => c
    case "UPPER_CASE" | "upper_case" => upper(c)
    case "LOWER_CASE" | "lower_case" => lower(c)
    case "snake_case" =>
      val s1 = regexp_replace(c, "([a-z])([A-Z])", "$1_$2")
      val s2 = regexp_replace(s1, "([A-Za-z])([0-9])", "$1_$2")
      val s3 = regexp_replace(s2, "([0-9])([A-Za-z])", "$1_$2")
      lower(translate(s3, ".", "_"))
    case "camel_case" | "camelCase" =>
      val parts = filter(split(c, "[._]+"), w => w =!= "")
      val tail = transform(slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
        w => concat(upper(substring(w, 1, 1)), w.substr(lit(2), length(w))))
      when(size(parts) === 0, lit("")) // a name of only separators
        .otherwise(concat(element_at(parts, 1), array_join(tail, "")))
    case s => throw new IllegalArgumentException(s"unknown collection.naming.style: $s")
  }

  /** CollectionNameTransformation analog (`debezium-connector-jdbc/.../
    * transforms/CollectionNameTransformation.java:95-135`, studied not
    * copied): rewrites the routed collection/table name — the record's
    * topic, i.e. the routing column emitted by [[byLogicalTableRouter]] /
    * [[contentBasedRouter]] — to `prefix + style(name) + suffix`. Null
    * routes pass through untouched (the reference skips null-topic
    * records). One narrow projection, no shuffle.
    */
  def collectionNameTransformation(
      df: DataFrame,
      routeCol: String = "__route",
      style: String = "default",
      prefix: String = "",
      suffix: String = ""): DataFrame = {
    require(df.columns.contains(routeCol),
      s"collectionNameTransformation expects a '$routeCol' routing column")
    val styled = concat(lit(prefix), styledColumn(col(routeCol), style), lit(suffix))
    df.withColumn(routeCol, when(col(routeCol).isNull, col(routeCol)).otherwise(styled))
  }

  // ------------------------------------------------------------- tracing

  /** W3C traceparent pattern inside a serialized java.util.Properties
    * context blob (the reference's application writes the active span
    * context into a row field; `TracingSpanUtil.java:66-72` extracts it
    * via a TextMapPropagator — the W3C propagator's carrier key is
    * `traceparent`).
    */
  private val TraceparentRe =
    "traceparent=([0-9a-f]{2}-[0-9a-f]{32}-[0-9a-f]{16}-[0-9a-f]{2})"

  /** ActivateTracingSpan SMT analog
    * (`debezium-connect-plugins/.../tracing/ActivateTracingSpan.java:104-130`
    * + `TracingSpanUtil.java:61-100`, studied not copied).
    *
    * The reference opens an OpenTelemetry span per record, links it to a
    * parent span whose serialized context a business application wrote
    * into the `tracingspancontext` row field, and injects the resulting
    * W3C `traceparent` into the record headers. A tracing SDK is process-
    * global state — the opposite of a distributed plan — so the Spark
    * analog keeps the DATA semantics: parse the propagated context, mint
    * deterministic span ids (md5 of the log position — reproducible
    * across retries, so speculative tasks emit identical spans), and
    * inject the `traceparent` header into the `headers` map. Everything
    * is codegen'd string/regexp work inside one narrow projection; no
    * shuffle, no UDF.
    *
    * Pass-through rules mirror `ActivateTracingSpan.apply:107-122`:
    * tombstones / non-CDC ops keep their row unchanged, and with
    * `requireContextField=true` rows lacking a propagated context are
    * not traced.
    */
  def activateTracingSpan(
      df: DataFrame,
      contextField: String = "tracingspancontext",
      requireContextField: Boolean = false,
      headersCol: String = "headers"): DataFrame = {
    val ctx =
      if (df.columns.contains(contextField)) col(contextField).cast("string")
      else lit(null).cast("string")
    val propagated = regexp_extract(ctx, TraceparentRe, 1)
    val hasCtx = ctx.isNotNull && propagated =!= ""
    // propagated trace id keeps the distributed trace together; otherwise
    // the record starts a new trace rooted at its log position.
    val traceId = when(hasCtx, substring(propagated, 4, 32))
      .otherwise(md5(concat(lit("trace"), col("lsn").cast("string"))))
    val spanId = substring(md5(concat(lit("span"), col("lsn").cast("string"))), 1, 16)
    val traceparent = concat(lit("00-"), traceId, lit("-"), spanId, lit("-01"))
    val isEnvelope = col("op").isin(
      Envelope.OpRead, Envelope.OpCreate, Envelope.OpUpdate, Envelope.OpDelete)
    val traced = isEnvelope && (hasCtx || lit(!requireContextField))
    val existing =
      if (df.columns.contains(headersCol)) col(headersCol)
      else lit(null).cast("map<string,string>")
    val injected = map_concat(
      coalesce(existing, map()), map(lit("traceparent"), traceparent))
    df.withColumn(headersCol, when(traced, injected).otherwise(existing))
  }

  /** The exported-spans feed of [[activateTracingSpan]] — the tabular
    * analog of the two spans `TracingSpanUtil.traceRecord` emits per
    * record (`TracingSpanUtil.java:62-100`): a `db-log-write` span whose
    * start is the SOURCE timestamp and whose parent is the propagated
    * application span, and a processing span (`operationName`, default
    * `debezium-read`) under it whose start is the envelope timestamp and
    * which carries the op as an attribute. Source-block fields become
    * `db.`-prefixed attributes (`TracingSpanUtil.java:117-128`); we carry
    * `db.instance` = repo here. Two narrow projections + a union — the
    * span feed is columnar, partition-local, and safe at any scale.
    */
  def tracingSpans(
      df: DataFrame,
      contextField: String = "tracingspancontext",
      operationName: String = "debezium-read",
      requireContextField: Boolean = false,
      sourceTs: Column = col("ts_ms"),
      processingTs: Column = col("ts_ms")): DataFrame = {
    val ctx =
      if (df.columns.contains(contextField)) col(contextField).cast("string")
      else lit(null).cast("string")
    val propagated = regexp_extract(ctx, TraceparentRe, 1)
    val hasCtx = ctx.isNotNull && propagated =!= ""
    val traceId = when(hasCtx, substring(propagated, 4, 32))
      .otherwise(md5(concat(lit("trace"), col("lsn").cast("string"))))
    val parentFromCtx = when(hasCtx, substring(propagated, 37, 16))
    val dbSpanId = substring(md5(concat(lit("span"), col("lsn").cast("string"))), 1, 16)
    val procSpanId = substring(md5(concat(lit("proc"), col("lsn").cast("string"))), 1, 16)
    val isEnvelope = col("op").isin(
      Envelope.OpRead, Envelope.OpCreate, Envelope.OpUpdate, Envelope.OpDelete)
    val traced = df.where(isEnvelope && (hasCtx || lit(!requireContextField)))
    val dbSpans = traced.select(
      traceId.as("trace_id"),
      dbSpanId.as("span_id"),
      parentFromCtx.as("parent_span_id"),
      lit("db-log-write").as("operation"),
      sourceTs.cast("long").as("start_ts_ms"),
      col("repo").as("db_instance"),
      lit(null).cast("string").as("attr_op"),
      col("lsn").as("lsn"))
    val procSpans = traced.select(
      traceId.as("trace_id"),
      procSpanId.as("span_id"),
      dbSpanId.as("parent_span_id"),
      lit(operationName).as("operation"),
      processingTs.cast("long").as("start_ts_ms"),
      col("repo").as("db_instance"),
      col("op").as("attr_op"),
      col("lsn").as("lsn"))
    dbSpans.unionAll(procSpans)
  }
}
