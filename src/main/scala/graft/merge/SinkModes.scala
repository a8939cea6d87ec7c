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
}
