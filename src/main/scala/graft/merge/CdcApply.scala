package graft.merge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  */
object CdcApply {

  final case class BatchResult(
      committed: Boolean,
      version: Long,
      batchId: Long,
      eventsIn: Long,
      fresh: Long,
      winners: Long,
      reason: String)

  private def posCol: Column = struct(col("commit"), col("lsn"))
  private def posLit(p: LogPos): Column = struct(lit(p.commit).as("commit"), lit(p.lsn).as("lsn"))

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
      fenceByWatermark: Boolean = true): BatchResult = {
    val t0 = System.currentTimeMillis()
    val last = table.lastCommit()
    // Fence 1: idempotent batch replay (exactly-once on restart).
    if (last.exists(_.batchId >= batchId))
      return BatchResult(committed = false, last.map(_.version).getOrElse(0L), batchId, 0, 0, 0, "batchId-fenced")

    val cached = batch.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // One pass: per-partition event count + max lsn (events-in metric +
      // the watermark advance vector; all seen events keep it monotone).
      val stats = cached.groupBy(col("part"))
        .agg(count(lit(1)).as("n"), max(col("lsn")).as("mx")).collect()
      val eventsIn = stats.map(_.getAs[Long]("n")).sum
      val wmAdvance = stats.map(r => r.getInt(0) -> r.getAs[Long]("mx")).toMap
      // Watermark vector for fence 2 (tiny; broadcast joined).
      val wm = last.map(_.watermark).getOrElse(Map.empty[Int, Long])
      val fenced2 =
        if (wm.isEmpty || !fenceByWatermark) cached
        else {
          import spark.implicits._
          val wmDf = wm.toSeq.toDF("part", "__wm")
          cached.join(broadcast(wmDf), Seq("part"), "left")
            .where(col("__wm").isNull || col("lsn") > col("__wm"))
            .drop("__wm")
        }
      // Fence 3: previously committed truncate.
      val oldFence = last.flatMap(_.fence)
      val fresh0 = oldFence.fold(fenced2)(f => fenced2.where(posCol > posLit(f)))
      val fresh = fresh0.persist(StorageLevel.MEMORY_AND_DISK)
      // One pass: surviving-event count + the batch's truncate fence.
      val fr = fresh.agg(
        count(lit(1)).as("n"),
        max(when(col("op") === Envelope.OpTruncate, posCol)).as("p")).collect().head
      val freshCount = fr.getAs[Long]("n")
      val batchFence = Option(fr.getStruct(1))
        .map(r => LogPos(r.getString(0), r.getLong(1)))
      val newFence = (oldFence.toSeq ++ batchFence.toSeq)
        .reduceOption((a, b) => a.max(b))

      // Schema reconciliation at the batch boundary (flush-on-schema-change,
      // ReducedRecordBuffer.java:57-62 → our microbatch boundary).
      val tableSchema = last.map(_.schema)
      val evolved = tableSchema.fold(fresh.schema)(t => SchemaEvolution.reconcile(t, fresh.schema))
      val evolvedJson = evolved.json
      val oldSchemas = last.map(_.schemas).getOrElse(Nil)
      val (schemas, schemaIdx) = oldSchemas.indexOf(evolvedJson) match {
        case -1 => (oldSchemas :+ evolvedJson, oldSchemas.size)
        case i  => (oldSchemas, i)
      }

      // LWW winners of the batch (salted for hot keys), truncate applied.
      // Tombstone markers carry no state — dropped before reduction.
      val dataEvents = fresh.where(
        col("op") =!= Envelope.OpTruncate && col("op") =!= Envelope.OpTombstone)
      val winners0 = Lww.reduce(SchemaEvolution.align(dataEvents, evolved), salt = salt)
      val winners1 = batchFence.fold(winners0)(f => winners0.where(posCol > posLit(f)))
      val winners = winners1.persist(StorageLevel.MEMORY_AND_DISK)
      val winnersCount = winners.count()

      val newWm = (wm.keySet ++ wmAdvance.keySet).map { p =>
        p -> math.max(wm.getOrElse(p, Long.MinValue), wmAdvance.getOrElse(p, Long.MinValue))
      }.toMap

      val version = last.map(_.version).getOrElse(0L) + 1
      if (winnersCount == 0 && batchFence.isEmpty) {
        // Metadata-only commit: advance the batchId + watermark fences.
        table.commit(CommitInfo(version, batchId, newWm, newFence, schemas, schemaIdx,
          last.map(_.files).getOrElse(Nil)))
        if (writeMetrics) appendMetrics(spark, table, batchId, version, fresh, winners, t0)
        fresh.unpersist(); winners.unpersist()
        return BatchResult(committed = true, version, batchId, eventsIn, freshCount, 0, "metadata-only")
      }

      // Touched buckets (truncate touches every bucket).
      val touched: Set[Int] =
        if (batchFence.isDefined) (0 until table.numBuckets).toSet
        else winners.select(table.bucketCol.as("b")).distinct()
          .collect().map(_.getInt(0)).toSet

      // Merge = LWW over (current state of touched buckets ∪ batch winners).
      val state = last.flatMap(ci => table.snapshotRaw(spark, ci, Some(touched)))
        .map(s => SchemaEvolution.align(s, evolved))
        .map(s => batchFence.fold(s)(f => s.where(posCol > posLit(f))))
      // One shuffle (with map-side partial combine) reduces state ∪ batch;
      // a second, cheap exchange lays the winners out one-file-per-bucket
      // so reads prune by bucket and the next merge touches only changed
      // buckets' files.
      val mergedInput = state.fold(winners)(s => s.unionAll(winners))
      val merged = Lww.reduce(mergedInput)
        .withColumn("__bucket", table.bucketCol)
        .repartition(table.numBuckets, col("__bucket"))

      val staged = table.stage(merged, batchId, schemaIdx)
      val untouchedFiles = last.map(_.files.filterNot(f => touched.contains(f.bucket))).getOrElse(Nil)
      table.commit(CommitInfo(version, batchId, newWm, newFence, schemas, schemaIdx,
        untouchedFiles ++ staged))
      if (writeMetrics) appendMetrics(spark, table, batchId, version, fresh, winners, t0)
      fresh.unpersist(); winners.unpersist()
      BatchResult(committed = true, version, batchId, eventsIn, freshCount, winnersCount, "merged")
    } finally {
      cached.unpersist()
    }
  }

  /** Per-partition lineage: events seen, fresh after fencing, winners
    * applied, dedup drops, commit lag (SURVEY.md §7.0 item 9).
    */
  private def appendMetrics(
      spark: SparkSession, table: LakeTable, batchId: Long, version: Long,
      fresh: DataFrame, winners: DataFrame, t0: Long): Unit = {
    val now = System.currentTimeMillis()
    val f = fresh.groupBy(col("part")).agg(
      count(lit(1)).as("freshEvents"),
      max(col("ts_ms")).as("maxTsMs"))
    val w = winners.groupBy(col("part")).agg(count(lit(1)).as("applied"))
    val m = f.join(w, Seq("part"), "left")
      .select(
        lit(batchId).as("batchId"),
        lit(version).as("commitVersion"),
        col("part"),
        col("freshEvents"),
        coalesce(col("applied"), lit(0L)).as("applied"),
        (col("freshEvents") - coalesce(col("applied"), lit(0L))).as("dedupDropped"),
        (lit(now) - col("maxTsMs")).as("commitLagMs"),
        lit(now - t0).as("batchWallMs"))
    m.write.mode("append").parquet(s"${table.root}/_metrics")
  }
}
