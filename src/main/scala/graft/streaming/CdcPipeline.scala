package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.Envelope
import graft.merge.CdcApply
import graft.merge.CdcApply.BatchResult
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

  /** Structured Streaming tail of a growing envelope-file directory. */
  def start(
      spark: SparkSession,
      inputDir: String,
      checkpointDir: String,
      table: LakeTable,
      salt: Int = 1,
      maxFilesPerTrigger: Int = 16,
      orderedInput: Boolean = false): StreamingQuery = {
    val env = spark.readStream
      .schema(Envelope.schema())
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    env.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (envBatch: DataFrame, batchId: Long) =>
        val flat = Envelope.unwrap(envBatch).drop("__deleted")
        CdcApply.applyBatch(envBatch.sparkSession, table, flat, batchId, salt,
          fenceByWatermark = orderedInput)
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
