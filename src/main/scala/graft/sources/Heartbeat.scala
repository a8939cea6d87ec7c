package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heartbeat events: for every source partition and every heartbeat
  * interval in which the partition saw NO change events, emit a marker
  * record carrying the partition's current offset — so downstream offset
  * tracking (and any sink watching per-partition progress) advances even
  * through quiet stretches of the log.
  *
  * Reference semantics (studied, not copied): `HeartbeatImpl` emits a
  * periodic record to a heartbeat topic whenever `heartbeat.interval.ms`
  * elapses without traffic, carrying the connector's current offset so
  * Kafka Connect commits it
  * (`debezium-connector-common/src/main/java/io/debezium/heartbeat/HeartbeatImpl.java:33-100`,
  * `Heartbeat.java`). In this engine the streaming loop itself already
  * advances offsets on metadata-only commits (`CdcApply`), so heartbeats
  * here serve the reference's OTHER purpose: a queryable per-partition
  * liveness/progress stream.
  *
  * Spark-first, scale shape: ONE aggregation of the log by
  * (partition, interval-bucket) — map-side-combined, output cardinality
  * parts × intervals, independent of event count — then all grid work
  * (dense interval grid, running-offset window, empty-interval anti-fill)
  * runs on that tiny aggregate. No second pass over the data.
  */
object Heartbeat {

  /** @param log        flat change log (any frame with part/ts/pos columns)
    * @param intervalMs heartbeat period (`heartbeat.interval.ms`)
    * @return (part, heartbeat_ts, last_lsn): one row per (partition,
    *         interval) with no events, carrying the partition's max offset
    *         before the interval start; intervals before a partition's
    *         first event emit nothing (the reference sends no heartbeat
    *         before the connector has an offset).
    */
  def emit(
      log: DataFrame,
      intervalMs: Long,
      partCol: Column = col("part"),
      tsCol: Column = col("ts_ms"),
      posCol: Column = col("lsn")): DataFrame = {
    val spark = log.sparkSession
    // Bounded driver literals (two longs), same treatment as merge fences.
    val bounds = log.agg(min(tsCol).as("lo"), max(tsCol).as("hi")).head()
    // A completely quiet log (no events at all) has no offsets to carry —
    // emit nothing, typed like a normal result (the reference sends no
    // heartbeat before the connector has an offset).
    if (bounds.isNullAt(0))
      return log.select(partCol.as("part"), tsCol.as("heartbeat_ts"), posCol.as("last_lsn"))
        .where(lit(false))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val nIntervals = ((hi - lo) / intervalMs).toInt

    // ONE pass over the log: per (part, interval bucket) max offset.
    val perBucket = log
      .groupBy(partCol.as("part"), ((tsCol - lo) / intervalMs).cast("long").as("i"))
      .agg(max(posCol).as("bucket_max"))

    // Dense grid of parts × intervals (tiny), offsets carried forward.
    val intervals = spark.range(0, nIntervals + 1L).select(
      col("id").as("i"), (lit(lo) + col("id") * intervalMs).as("heartbeat_ts"))
    val parts = perBucket.select(col("part")).distinct()
    val grid = parts.crossJoin(intervals)
      .join(perBucket, Seq("part", "i"), "left")
    val before = Window.partitionBy(col("part")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("last_lsn", max(col("bucket_max")).over(before))
      .where(col("bucket_max").isNull && col("last_lsn").isNotNull)
      .select(col("part"), col("heartbeat_ts"), col("last_lsn"))
  }
}
