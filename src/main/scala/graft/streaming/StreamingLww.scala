package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.core.RepoEvent

/** Continuously-maintained per-key LWW winner over an event stream —
  * `ReducedRecordBuffer` (`debezium-connector-jdbc/.../ReducedRecordBuffer.java:48-115`)
  * as persistent streaming state instead of a per-batch buffer:
  * `KeyValueGroupedDataset.mapGroupsWithState` holds the current winner
  * per (repo, path) in the state store and emits it whenever the key sees
  * new events (update semantics downstream).
  *
  * The batch engine (`Lww.reduce` + `CdcApply`) remains the primary apply
  * path — it reduces declaratively and needs no state store. This
  * operator is for consumers that want a live winners *stream* (e.g. a
  * changelog topic of current-row images, Debezium's read-model output)
  * rather than a table.
  *
  * Scale: state is one row per live key, hash-partitioned by key across
  * the cluster by the groupByKey shuffle; the state store is RocksDB-
  * backed at real deployments (`spark.sql.streaming.stateStore.providerClass`).
  */
object StreamingLww {

  /** Session confs for the RocksDB state-store provider — the deployment
    * knob once live-key cardinality outgrows the default HDFS-backed
    * (executor-heap) store, ~10^8+ keys at the north-rule scale. Changelog
    * checkpointing ships per-batch deltas instead of full SST snapshots,
    * keeping commit cost O(changed keys). Set these on the SparkSession
    * BEFORE starting the query; the provider is fixed per checkpoint
    * location for the query's lifetime.
    */
  val RocksDbStateStoreConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  private def pos(e: RepoEvent): (String, Long) = (e.commit, e.lsn)

  /** Update-mode winners stream: one output row per key per microbatch in
    * which the key's winner (possibly) advanced.
    */
  def winners(events: Dataset[RepoEvent]): Dataset[RepoEvent] = {
    implicit val enc = Encoders.product[RepoEvent]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    events
      .groupByKey(e => (e.repo, e.path))
      .mapGroupsWithState[RepoEvent, RepoEvent](GroupStateTimeout.NoTimeout) {
        case (_, evs, state) =>
          val best = (evs ++ state.getOption.iterator)
            .maxBy(pos)(Ordering.Tuple2(Ordering.String, Ordering.Long))
          state.update(best)
          best
      }
  }
}
