package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.Envelope
import graft.merge.CdcApply
import graft.merge.CdcApply.BatchResult
import graft.sources.{Signals, Snapshot}
import graft.table.LakeTable

/** The engine's run loop — the Spark analog of
  * `AsyncEmbeddedEngine.run()` → coordinator → poll → process → commit
  * (SURVEY.md §3.1). Two modes:
  *
  *  - [[start]]: Structured Streaming over a directory of envelope parquet
  *    files (`readStream` + `foreachBatch`), checkpointed; admission control
  *    via `maxFilesPerTrigger` (the `max.batch.size` analog,
  *    `ChangeEventQueue.java:65-118`).
  *  - [[replay]]: deterministic batch-mode microbatching of a bounded log
  *    (used by specs and the bench; identical apply path).
  */
object CdcPipeline {

  /** Structured Streaming tail of a growing envelope-file directory.
    *
    * @param signalChannel optional control-plane file channel read at each
    *        microbatch boundary (SignalProcessor analog, SURVEY.md §2.1):
    *        `execute-snapshot` with `data` = a parquet path of base-table
    *        rows applies an ad-hoc blocking snapshot / backfill — `op='r'`
    *        events that compete through normal LWW on their own `commit`
    *        (at lsn 0, so a live row or retained tombstone from the SAME
    *        commit wins the tie; fresher base-table images win, staler
    *        ones lose — re-snapshot converges, never resurrects a newer
    *        delete); `log` prints. Signals are marked processed AFTER the
    *        batch commits; redelivery after a crash re-applies the
    *        snapshot, which is convergent.
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      checkpointDir: String,
      table: LakeTable,
      salt: Int = 1,
      maxFilesPerTrigger: Int = 16,
      orderedInput: Boolean = false,
      signalChannel: Option[String] = None): StreamingQuery = {
    val env = spark.readStream
      .schema(Envelope.schema())
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    env.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (envBatch: DataFrame, batchId: Long) =>
        val sp = envBatch.sparkSession
        val pending = signalChannel.map(ch => Signals.pending(ch)).getOrElse(Nil)
        pending.foreach { s =>
          s.`type` match {
            case Signals.ExecuteSnapshot =>
              val rows = sp.read.parquet(s.data)
              val snap = Snapshot.initial(rows, snapshotLsn = 0L)
              CdcApply.applyBatch(sp, table, snap, batchId,
                fenceByWatermark = false, fenceByBatchId = false)
            case Signals.Log =>
              System.err.println(s"[graft signal] ${s.data}")
            case _ => () // pause/resume are owned by the query lifecycle
          }
        }
        val flat = Envelope.unwrap(envBatch).drop("__deleted")
        CdcApply.applyBatch(sp, table, flat, batchId, salt,
          fenceByWatermark = orderedInput)
        signalChannel.foreach(ch => Signals.markProcessed(ch, pending.map(_.id)))
        ()
      }
      .start()
  }

  /** Deterministic microbatch replay of a bounded flat log: split into
    * contiguous lsn ranges and apply sequentially. Converges to the same
    * state for ANY batching (LWW is order-independent across batches).
    */
  def replay(
      spark: SparkSession,
      log: DataFrame,
      table: LakeTable,
      numBatches: Int = 4,
      salt: Int = 1,
      startBatchId: Long = 0L,
      writeMetrics: Boolean = true): Seq[BatchResult] = {
    // Materialize the log once; every batch slice then reads the cache
    // instead of recomputing the source derivation per slice.
    val cachedLog = log.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bounds = cachedLog.agg(min(col("lsn")), max(col("lsn"))).collect().head
      if (bounds.isNullAt(0)) return Nil
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val width = math.max(1L, (hi - lo) / numBatches + 1)
      (0 until numBatches).map { i =>
        val (a, b) = (lo + i * width, lo + (i + 1) * width)
        val slice = cachedLog.where(col("lsn") >= a && col("lsn") < b)
        CdcApply.applyBatch(spark, table, slice, startBatchId + i, salt, writeMetrics,
          cacheBatch = false)
      }
    } finally cachedLog.unpersist()
  }
}
