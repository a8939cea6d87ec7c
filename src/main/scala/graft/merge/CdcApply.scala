package graft.merge

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Envelope
import graft.operators.Lww
import graft.table.{CommitInfo, LakeTable, LogPos, SchemaEvolution}

/** One microbatch of the CDC apply loop: fence → reduce → merge → commit.
  *
  * This is the Spark-first re-expression of Debezium's sink path
  * (`JdbcChangeEventSink.execute`, `debezium-connector-jdbc/.../JdbcChangeEventSink.java:71-156`):
  * instead of per-record upsert/delete buffers with ordered flushes, the
  * whole batch reduces declaratively to one winner per key (LWW) and merges
  * into the bucketed lake table in a single shuffle.
  *
  * Exactly-once = three fences, checked in order:
  *  1. batchId fence: a batch at-or-below the committed batchId is a no-op
  *     (foreachBatch retry / checkpoint replay);
  *  2. per-source-partition offset watermark: events with lsn ≤ watermark
  *     of their partition were already applied (log replays);
  *  3. truncate fence: events ordered at-or-before the latest truncate are
  *     dead (SURVEY.md §7.3).
  *
  * Tombstone retention: delete winners are kept in the table as op='d' rows
  * so a late cross-partition event *older* than the delete cannot resurrect
  * the key. Reads filter them; compaction can drop tombstones once all
  * source partitions' watermarks pass them.
  *
  * Physical shape (tuned for the 10^10-event north rule — minimum Spark
  * jobs and shuffles per microbatch):
  *
  *  - Job 1 (stats): ONE pass over the batch computes, per source
  *    partition, the event count, max lsn (watermark advance), post-fence
  *    fresh count / max ts, the batch's truncate fence, and the set of
  *    touched buckets — all as conditional aggregates of a single
  *    `groupBy(part)`. The fences themselves are driver-known literals
  *    (`element_at(<watermark map literal>, part)`), so no join is needed.
  *  - Job 2 (merge+stage): LWW over (state of touched buckets ∪ fresh
  *    batch events) in ONE shuffle — `repartition(numBuckets, key)` whose
  *    HashPartitioning both satisfies the aggregate's distribution (no
  *    second exchange) and equals the bucket function, so each reduce task
  *    writes exactly its own bucket file. Optional salted pre-reduce of
  *    the batch side (hot-key level 1) adds one batch-side-only shuffle.
  *  - Job 3 (metrics, optional): per-partition applied counts from the
  *    merged winners (batch rows carry a `__src=1` tag that rides through
  *    `max_by`), joined driver-side with the stats vector.
  */
object CdcApply {

  final case class BatchResult(
      committed: Boolean,
      version: Long,
      batchId: Long,
      eventsIn: Long,
      fresh: Long,
      winners: Long, // applied batch winners; -1 when not computed (writeMetrics=false)
      reason: String)

  private def posCol: Column = struct(col("commit"), col("lsn"))
  private def posLit(p: LogPos): Column = struct(lit(p.commit).as("commit"), lit(p.lsn).as("lsn"))

  /** Well-formed-event predicate — the dead-letter-queue contract
    * (`debezium-sink/.../dlq/ErrorReporter.java`, error handlers
    * `pipeline/ErrorHandler.java`): key/position columns present and a
    * known op. Malformed events are side-outputted to `_quarantine`
    * instead of failing the batch (`errors.tolerance=all` analog); they
    * still advance the offset watermark (they were delivered).
    */
  private def isWellFormed: Column =
    col("repo").isNotNull && col("path").isNotNull && col("commit").isNotNull &&
      col("op").isin(Envelope.OpRead, Envelope.OpCreate, Envelope.OpUpdate,
        Envelope.OpDelete, Envelope.OpTruncate, Envelope.OpMessage, Envelope.OpTombstone)

  /** Apply one flat-event microbatch to the table. Single-writer (driver). */
  /** @param fenceByWatermark drop events at-or-below the committed
    *        per-partition offset watermark. Correct ONLY when the transport
    *        delivers each source partition in order (binlog/Kafka semantics
    *        — the reference's restart fence makes the same assumption). For
    *        unordered transports (e.g. a file dump) leave it off: the
    *        tombstone-retaining LWW merge is idempotent on its own, the
    *        fence is a work-skipping optimization.
    */
  def applyBatch(
      spark: SparkSession,
      table: LakeTable,
      batch: DataFrame,
      batchId: Long,
      salt: Int = 1,
      writeMetrics: Boolean = true,
      fenceByWatermark: Boolean = true,
      cacheBatch: Boolean = true,
      fenceByBatchId: Boolean = true): BatchResult = {
    val t0 = System.currentTimeMillis()
    val last = table.lastCommit()
    // Fence 1: idempotent batch replay (exactly-once on restart).
    // fenceByBatchId=false is for out-of-band applies (ad-hoc signal
    // snapshots) that interleave with the stream: they commit WITHOUT
    // advancing the stream's batchId, and convergence (LWW + retained
    // tombstones) makes their redelivery idempotent instead.
    if (fenceByBatchId && last.exists(_.batchId >= batchId))
      return BatchResult(committed = false, last.map(_.version).getOrElse(0L), batchId, 0, 0, 0, "batchId-fenced")
    val commitBatchId = if (fenceByBatchId) batchId else last.map(_.batchId).getOrElse(-1L)

    // The batch is read twice (stats, merge input); cache unless the caller
    // already materialized it (replay caches the whole log once).
    val cached = if (cacheBatch) batch.persist(StorageLevel.MEMORY_AND_DISK) else batch
    try {
      val wm = last.map(_.watermark).getOrElse(Map.empty[Int, Long])
      val oldFence = last.flatMap(_.fence)
      // Fence 2 as a literal map lookup (watermark vector is driver-known
      // and tiny — no broadcast join needed); fence 3 as a literal struct.
      val wmPred: Column =
        if (wm.isEmpty || !fenceByWatermark) lit(true)
        else {
          val w = element_at(typedlit(wm), col("part"))
          w.isNull || col("lsn") > w
        }
      val arrived = oldFence.fold(wmPred)(f => wmPred && posCol > posLit(f))
      val freshPred = arrived && isWellFormed
      // Message ('m') events are control-plane passthrough, not row state;
      // they advance offsets but never merge (Envelope.java:37-62).
      val isData = col("op") =!= Envelope.OpTruncate &&
        col("op") =!= Envelope.OpTombstone && col("op") =!= Envelope.OpMessage

      // Job 1: single-pass per-source-partition stats + fences + buckets.
      val stats = cached.groupBy(col("part")).agg(
        count(lit(1)).as("n"),
        max(col("lsn")).as("mx"),
        count(when(freshPred, 1)).as("freshN"),
        count(when(arrived && !isWellFormed, 1)).as("badN"),
        max(when(freshPred, col("ts_ms"))).as("maxTs"),
        max(when(freshPred && col("op") === Envelope.OpTruncate, posCol)).as("tf"),
        collect_set(when(freshPred && isData, table.bucketCol)).as("bks")).collect()

      val eventsIn = stats.map(_.getAs[Long]("n")).sum
      val freshCount = stats.map(_.getAs[Long]("freshN")).sum
      val badCount = stats.map(_.getAs[Long]("badN")).sum
      if (badCount > 0) {
        // DLQ side output: quarantined verbatim with provenance, batch
        // keeps going (errors.tolerance=all).
        cached.where(arrived && !isWellFormed)
          .withColumn("__batchId", lit(batchId))
          .write.mode("append").parquet(s"${table.root}/_quarantine")
      }
      val wmAdvance = stats.map(r => r.getAs[Int]("part") -> r.getAs[Long]("mx")).toMap
      val batchFence = stats.flatMap(r => Option(r.getAs[Row]("tf")))
        .map(r => LogPos(r.getString(0), r.getLong(1)))
        .reduceOption((a, b) => a.max(b))
      val newFence = (oldFence.toSeq ++ batchFence.toSeq)
        .reduceOption((a, b) => a.max(b))
      val newWm = (wm.keySet ++ wmAdvance.keySet).map { p =>
        p -> math.max(wm.getOrElse(p, Long.MinValue), wmAdvance.getOrElse(p, Long.MinValue))
      }.toMap

      // Schema reconciliation at the batch boundary (flush-on-schema-change,
      // ReducedRecordBuffer.java:57-62 → our microbatch boundary).
      val tableSchema = last.map(_.schema)
      val evolved = tableSchema.fold(cached.schema)(t => SchemaEvolution.reconcile(t, cached.schema))
      val evolvedJson = evolved.json
      val oldSchemas = last.map(_.schemas).getOrElse(Nil)
      val (schemas, schemaIdx) = oldSchemas.indexOf(evolvedJson) match {
        case -1 => (oldSchemas :+ evolvedJson, oldSchemas.size)
        case i  => (oldSchemas, i)
      }

      val version = last.map(_.version).getOrElse(0L) + 1
      if (freshCount == 0 && batchFence.isEmpty) {
        // Metadata-only commit: advance the batchId + watermark fences.
        table.commit(CommitInfo(version, commitBatchId, newWm, newFence, schemas, schemaIdx,
          last.map(_.files).getOrElse(Nil)))
        if (writeMetrics) appendMetrics(spark, table, batchId, version, stats, Map.empty, t0)
        return BatchResult(committed = true, version, batchId, eventsIn, 0, 0, "metadata-only")
      }

      // Touched buckets (truncate touches every bucket — the fence must be
      // applied to, i.e. rewrite, all of them).
      val touched: Set[Int] =
        if (batchFence.isDefined) (0 until table.numBuckets).toSet
        else stats.flatMap(_.getSeq[Int](stats.head.fieldIndex("bks"))).toSet

      // Job 2: merge = LWW over (current state of touched buckets ∪ fresh
      // batch events) in one key-shuffle laid out one-partition-per-bucket.
      // Batch rows are tagged __src=1 so the applied-winner metric falls
      // out of the merged result (the tag rides inside max_by).
      val dataEvents = cached.where(freshPred && isData)
      val aligned = SchemaEvolution.align(dataEvents, evolved).withColumn("__src", lit(1))
      val batchSide = if (salt > 1) Lww.saltedPartial(aligned, salt = salt) else aligned
      val state = last.flatMap(ci => table.snapshotRaw(spark, ci, Some(touched)))
        .map(s => SchemaEvolution.align(s, evolved).withColumn("__src", lit(0)))
      val unioned = state.fold(batchSide)(_.unionAll(batchSide))
      val fenced = batchFence.fold(unioned)(f => unioned.where(posCol > posLit(f)))
      // reducePartitioned lays winners out partition-id == bucket-id, so
      // staging is a plain parquet write (see LakeTable.stage contract).
      val merged0 = Lww.reducePartitioned(fenced, numPartitions = table.numBuckets)
      val merged = if (writeMetrics) merged0.persist(StorageLevel.MEMORY_AND_DISK) else merged0

      val staged = table.stage(merged.drop("__src"), batchId, schemaIdx)
      val untouchedFiles = last.map(_.files.filterNot(f => touched.contains(f.bucket))).getOrElse(Nil)
      table.commit(CommitInfo(version, commitBatchId, newWm, newFence, schemas, schemaIdx,
        untouchedFiles ++ staged))

      var winnersCount = -1L
      if (writeMetrics) {
        // Job 3: applied batch winners per source partition, off the cached
        // merged result (one row per touched key — small).
        val applied = merged.where(col("__src") === 1)
          .groupBy(col("part")).agg(count(lit(1)).as("c")).collect()
          .map(r => r.getAs[Int]("part") -> r.getAs[Long]("c")).toMap
        winnersCount = applied.values.sum
        appendMetrics(spark, table, batchId, version, stats, applied, t0)
        merged.unpersist()
      }
      BatchResult(committed = true, version, batchId, eventsIn, freshCount, winnersCount, "merged")
    } finally {
      if (cacheBatch) cached.unpersist()
    }
  }

  /** Per-partition lineage: events seen, fresh after fencing, winners
    * applied, dedup drops, commit lag (SURVEY.md §7.0 item 9). Built from
    * the driver-side stats vector — no extra pass over the data.
    */
  private def appendMetrics(
      spark: SparkSession, table: LakeTable, batchId: Long, version: Long,
      stats: Array[Row], applied: Map[Int, Long], t0: Long): Unit = {
    import spark.implicits._
    val now = System.currentTimeMillis()
    val rows = stats.toSeq.map { r =>
      val part = r.getAs[Int]("part")
      val freshN = r.getAs[Long]("freshN")
      val a = applied.getOrElse(part, 0L)
      val maxTs = Option(r.getAs[java.lang.Long]("maxTs")).map(_.toLong)
      (batchId, version, part, freshN, a, freshN - a,
        maxTs.map(now - _).getOrElse(0L), now - t0)
    }
    rows.toDF("batchId", "commitVersion", "part", "freshEvents",
      "applied", "dedupDropped", "commitLagMs", "batchWallMs")
      .coalesce(1)
      .write.mode("append").parquet(s"${table.root}/_metrics")
  }
}
