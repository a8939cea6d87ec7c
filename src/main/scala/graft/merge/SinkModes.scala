package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Envelope
import graft.operators.Lww

/** JDBC-sink insert modes — `insert.mode` ∈ {insert, update, upsert}
  * (`debezium-connector-jdbc/.../JdbcSinkConnectorConfig.java:291-305`):
  *
  *  - `upsert` is the engine's native path (LWW reduce + MERGE,
  *    [[CdcApply.applyBatch]]);
  *  - `insert` appends every upsert-op event as its own row — no key
  *    collapse (append-only audit/history sinks);
  *  - `update` applies only events whose key ALREADY exists in the target
  *    state — unmatched keys are dropped, not inserted.
  *
  * Both are single-shuffle: `insert` is a narrow filter; `update` is the
  * LWW reduce plus one `left_semi` key join against the target (broadcast
  * when the state is a dimension-sized table, shuffle-hash/SMJ otherwise —
  * Catalyst/AQE picks).
  */
object SinkModes {

  /** insert mode: every data event is a new row, deletes/control ops skipped. */
  def insert(events: DataFrame): DataFrame =
    events.where(col("op").isin(Envelope.UpsertOps: _*))

  /** update mode: LWW winners restricted to keys present in `state`. */
  def update(
      events: DataFrame,
      state: DataFrame,
      keyCols: Seq[String] = Envelope.keyCols): DataFrame =
    Lww.reduce(events.where(col("op").isin(Envelope.UpsertOps: _*)), keyCols)
      .join(state.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")

  /** `primary.key.mode` — how the SINK's upsert key is derived
    * (`JdbcSinkConnectorConfig.java:145,417`: none/kafka/record_key/
    * record_value + `primary.key.fields`):
    *  - `record_key`: the change event's key columns (`fields` optionally
    *    restricts to a subset, as the reference does for composite keys);
    *  - `record_value`: the configured payload field list;
    *  - `kafka`: the transport coordinates — (part, lsn) here, the
    *    (topic, partition, offset) analog of a single-stream engine;
    *  - `none`: keyless — upserts degrade to inserts.
    * Feed the result into a `MultiTable.TableDef(keyCols = ...)` or
    * [[upsertKeyed]].
    */
  def primaryKeyCols(
      mode: String,
      recordKeyCols: Seq[String] = Envelope.keyCols,
      fields: Seq[String] = Nil): Seq[String] = mode match {
    case "record_key" =>
      if (fields.isEmpty) recordKeyCols
      else {
        // reject unknown fields at config time like the reference sink —
        // a silent intersect could empty the key set and quietly degrade
        // upsert to insert semantics
        val unknown = fields.filterNot(recordKeyCols.contains)
        require(unknown.isEmpty,
          s"primary.key.fields not part of the record key: ${unknown.mkString(", ")}")
        recordKeyCols.filter(fields.contains)
      }
    case "record_value" =>
      require(fields.nonEmpty, "primary.key.fields is required for record_value mode")
      fields
    case "kafka" => Seq("part", "lsn")
    case "none"  => Nil
    case other   => throw new IllegalArgumentException(s"unknown primary.key.mode: $other")
  }

  /** Upsert winners under the mode-derived key: one LWW reduce on that key
    * (single shuffle); `none` keeps every row ([[insert]] semantics).
    */
  def upsertKeyed(
      events: DataFrame,
      mode: String,
      recordKeyCols: Seq[String] = Envelope.keyCols,
      fields: Seq[String] = Nil): DataFrame = {
    val keys = primaryKeyCols(mode, recordKeyCols, fields)
    val ups = insert(events)
    if (keys.isEmpty) ups else Lww.reduce(ups, keys)
  }

  /** Sink per-field include/exclude filter — `FieldFilterFactory`
    * semantics (`debezium-sink/src/main/java/io/debezium/sink/filter/
    * FieldFilterFactory.java:25-61`, studied not copied): a list entry is
    * `field` (applies to every collection) or `collection:field`; a
    * matching entry includes (include list) or excludes (exclude list)
    * the field, a non-match yields the opposite; a non-empty EXCLUDE list
    * takes precedence when both are configured; neither configured keeps
    * everything. The filter is config-time metadata — it drives a static
    * per-collection projection ([[projectFields]]), never per-row plan
    * branching.
    */
  def fieldFilter(
      includeList: String = "",
      excludeList: String = ""): (String, String) => Boolean = {
    def entries(l: String): Array[(Option[String], String)] =
      l.split(",").map(_.trim).filter(_.nonEmpty).map { e =>
        // split(-1) keeps trailing empties: a typo like "orders:" must
        // fail loudly, not silently re-parse as an unqualified field
        // named "orders" (which Java's default split would produce).
        e.split(":", -1) match {
          case Array(f) if f.trim.nonEmpty => (None, f.trim)
          case Array(t, f) if t.trim.nonEmpty && f.trim.nonEmpty =>
            (Some(t.trim), f.trim)
          case _ => throw new IllegalArgumentException(
            s"field filter entry must be 'field' or 'collection:field': '$e'")
        }
      }
    def matches(es: Array[(Option[String], String)], topic: String, field: String): Boolean =
      es.exists { case (t, f) => f == field.trim && t.forall(_ == topic.trim) }
    if (excludeList.trim.nonEmpty) {
      val es = entries(excludeList); (t, f) => !matches(es, t, f)
    } else if (includeList.trim.nonEmpty) {
      val es = entries(includeList); (t, f) => matches(es, t, f)
    } else (_, _) => true
  }

  /** One collection's sink frame projected by a field filter. Columns in
    * `keepAlways` (default: the upsert key) survive regardless — dropping
    * the key would silently degrade upsert to insert, the same reason the
    * reference validates `primary.key.fields` against the filter. Narrow
    * projection: the pruned columns never leave the scan.
    */
  def projectFields(
      df: DataFrame,
      collection: String,
      filter: (String, String) => Boolean,
      keepAlways: Seq[String] = Envelope.keyCols): DataFrame =
    df.select(df.columns.filter(c => keepAlways.contains(c) || filter(collection, c))
      .map(col).toIndexedSeq: _*)
}
