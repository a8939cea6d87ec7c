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
    *        microbatch boundary (the SignalProcessor dispatch analog,
    *        `pipeline/signal/SignalProcessor.java`, SURVEY.md §2.1), with
    *        the full action set:
    *
    *         - `execute-snapshot`, data = `<parquet path>[#chunks]`:
    *           starts a CHUNKED ad-hoc snapshot; one key-hash chunk is
    *           applied per microbatch boundary, interleaved with streaming
    *           (DBLog-style). Snapshot rows are `op='r'` events at lsn 0
    *           competing through normal LWW on their own `commit`, so
    *           fresher base images win, staler ones lose — re-snapshot
    *           converges, never resurrects a newer delete;
    *         - `pause-snapshot` / `resume-snapshot`: suspend / continue
    *           the chunk train (streaming is NOT paused — as in the
    *           reference, these act on the incremental snapshot);
    *         - `stop-snapshot`: cancel; remaining chunks never apply;
    *         - `log`: print.
    *
    *        Chunk progress persists beside the channel and advances only
    *        AFTER the chunk's commit; signals are marked processed AFTER
    *        the batch — crash redelivery re-applies convergently.
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
          val ch = signalChannel.get
          s.`type` match {
            case Signals.ExecuteSnapshot =>
              val (path, chunks) = s.data.split('#') match {
                case Array(p, n) => (p, n.toInt)
                case _           => (s.data, 1)
              }
              Signals.initSnapshot(ch, path, chunks)
            case Signals.PauseSnapshot  => Signals.setSnapshotPaused(ch, paused = true)
            case Signals.ResumeSnapshot => Signals.setSnapshotPaused(ch, paused = false)
            case Signals.StopSnapshot   => Signals.clearSnapshot(ch)
            case Signals.Log            => System.err.println(s"[graft signal] ${s.data}")
            case other                  => System.err.println(s"[graft signal] unknown action: $other")
          }
        }
        // One snapshot chunk per batch boundary, interleaved with the
        // stream (DBLog); progress advances after the chunk's commit.
        signalChannel.flatMap(Signals.snapshotState).foreach { st =>
          if (!st.paused && st.next < st.chunks) {
            val rows = sp.read.parquet(st.data)
            val chunk =
              if (st.chunks == 1) rows
              else rows.where(pmod(hash(table.keyCols.map(col): _*), lit(st.chunks)) === st.next)
            CdcApply.applyBatch(sp, table, Snapshot.initial(chunk, snapshotLsn = 0L), batchId,
              fenceByWatermark = false, fenceByBatchId = false)
            Signals.advanceSnapshot(signalChannel.get)
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
