package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.table.{CommitInfo, LakeTable}

/** Snapshot-mode policy — the Snapshotter SPI re-expressed
  * (`debezium-connector-common/src/main/java/io/debezium/snapshot/mode/` package,
  * mode enum `BinlogConnectorConfig.java:150-186`): given whether a
  * committed offset exists, decide whether to snapshot data, snapshot
  * schema, and/or stream.
  *
  * | mode                | data            | schema          | stream |
  * |---------------------|-----------------|-----------------|--------|
  * | always              | yes             | yes             | yes    |
  * | initial             | if no offset    | if no offset    | yes    |
  * | initial_only        | if no offset    | if no offset    | NO     |
  * | no_data             | no              | yes             | yes    |
  * | never               | no              | no              | yes    |
  * | when_needed         | if no offset or snapshot in progress | same | yes |
  * | recovery            | no              | yes (rebuild)   | yes    |
  * | configuration_based | per config      | per config      | per config |
  *
  * (`AlwaysSnapshotter/InitialSnapshotter/InitialOnlySnapshotter/
  * NoDataSnapshotter/NeverSnapshotter/WhenNeededSnapshotter/
  * RecoverySnapshotter/ConfigurationBasedSnapshotter.java` — each is a
  * tiny truth table over (offsetExists, snapshotInProgress); `recovery`
  * additionally REQUIRES existing offsets, it rebuilds only the schema
  * history.)
  */
object Snapshotter {

  final case class Decision(snapshotData: Boolean, snapshotSchema: Boolean, stream: Boolean)

  val Modes: Seq[String] =
    Seq("always", "initial", "initial_only", "no_data", "never", "when_needed", "recovery")

  /** The SPI truth table. `configurationBased` flags feed the
    * configuration_based mode (`snapshot.mode.configuration.based.*`).
    */
  def decide(
      mode: String,
      offsetExists: Boolean,
      snapshotInProgress: Boolean = false,
      configurationBased: Option[Decision] = None): Decision = mode match {
    case "always"       => Decision(snapshotData = true, snapshotSchema = true, stream = true)
    case "initial"      => Decision(!offsetExists, !offsetExists, stream = true)
    case "initial_only" => Decision(!offsetExists, !offsetExists, stream = false)
    case "no_data"      => Decision(snapshotData = false, snapshotSchema = true, stream = true)
    case "never"        => Decision(snapshotData = false, snapshotSchema = false, stream = true)
    case "when_needed" =>
      val snap = !offsetExists || snapshotInProgress
      Decision(snap, snap, stream = true)
    case "recovery" =>
      require(offsetExists,
        "snapshot.mode=recovery requires existing offsets (it rebuilds the schema history only)")
      Decision(snapshotData = false, snapshotSchema = true, stream = true)
    case "configuration_based" =>
      configurationBased.getOrElse(throw new IllegalArgumentException(
        "configuration_based mode needs explicit Decision flags"))
    case other => throw new IllegalArgumentException(s"unknown snapshot.mode: $other")
  }

  /** Compose the startup change log for a table per the mode's decision:
    * an `op='r'` snapshot of `base` (positioned at `snapshotLsn`) when the
    * decision says snapshot data, unioned with `stream` when it says
    * stream. When the decision says snapshot SCHEMA but not data and the
    * table has no schema yet, the base's envelope schema is registered as
    * a metadata-only commit — the schema-history bootstrap of `no_data` /
    * `recovery` (consumers get correctly-typed change events from the
    * first streamed row, SURVEY §1.3).
    *
    * `offsetExists` = the table has a committed batch (the engine's
    * checkpoint analog); LWW at apply time resolves snapshot-vs-stream
    * exactly as the watermark algorithm does for incremental snapshots.
    */
  def bootstrapLog(
      spark: SparkSession,
      table: LakeTable,
      base: DataFrame,
      stream: DataFrame,
      mode: String,
      snapshotLsn: Long,
      parts: Int = 8): DataFrame = {
    val last = table.lastCommit()
    val d = decide(mode, offsetExists = last.isDefined)
    val snap =
      if (d.snapshotData) Some(Snapshot.initial(base, snapshotLsn, parts, table.keyCols))
      else None
    if (!d.snapshotData && d.snapshotSchema && last.isEmpty) {
      // Schema-only registration: commit the envelope schema with zero
      // files so the table's schema history starts at stream position.
      val schemaJson = Snapshot.initial(base, snapshotLsn, parts, table.keyCols).schema.json
      table.commit(CommitInfo(version = 1L, batchId = -1L, watermark = Map.empty,
        fence = None, schemas = Seq(schemaJson), schemaIdx = 0, files = Nil))
    }
    val parts0 = Seq(snap, if (d.stream) Some(stream) else None).flatten
    parts0 match {
      case Nil      => stream.limit(0)
      case s :: Nil => s
      case ss       => ss.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }
}
