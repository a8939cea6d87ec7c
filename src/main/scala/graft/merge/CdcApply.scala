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
  *  - Job 2 (merge+stage): the batch reduces to one winner per key in ONE
  *    shuffle — `repartition(numBuckets, key)` whose HashPartitioning both
  *    satisfies the aggregate's distribution (no second exchange) and
  *    equals the bucket function, so each task writes exactly its own
  *    bucket file. Copy-on-write tables then full-outer-join the winners
  *    against the STORAGE-PARTITIONED state read (bucketed scan, zero
  *    state-side exchange — `LakeTable.bucketedState` +
  *    `Lww.mergeCoPartitioned`); merge-on-read tables skip the state scan
  *    entirely and append the winner files (readers resolve per bucket).
  *    Optional salted pre-reduce (hot-key level 1) adds one
  *    batch-side-only shuffle.
  *  - Job 3 (metrics, optional): per-partition applied counts from the
  *    merged winners' `__src` tag (1 = batch side won), joined driver-side
  *    with the stats vector.
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
  private def isWellFormed(keyCols: Seq[String]): Column =
    keyCols.map(col(_).isNotNull).reduce(_ && _) &&
      col("commit").isNotNull && col("lsn").isNotNull && col("part").isNotNull &&
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
      val wellFormed = isWellFormed(table.keyCols)
      val freshPred = arrived && wellFormed
      // Malformed rows can null out BOTH predicates (null commit/lsn ⇒ the
      // fences are SQL NULL; null op ⇒ isin() is SQL NULL) — the quarantine
      // gate coalesces both so unknown-arrival / unknown-wellformedness
      // rows are quarantined, never silently dropped while the watermark
      // advances past them.
      val quarantined = coalesce(arrived, lit(true)) && !coalesce(wellFormed, lit(false))
      // Message ('m') events are control-plane passthrough, not row state;
      // they advance offsets but never merge (Envelope.java:37-62).
      val isData = col("op") =!= Envelope.OpTruncate &&
        col("op") =!= Envelope.OpTombstone && col("op") =!= Envelope.OpMessage

      // Job 1: single-pass per-source-partition stats + fences + buckets.
      val stats = cached.groupBy(col("part")).agg(
        count(lit(1)).as("n"),
        max(col("lsn")).as("mx"),
        count(when(freshPred, 1)).as("freshN"),
        count(when(quarantined, 1)).as("badN"),
        max(when(freshPred, col("ts_ms"))).as("maxTs"),
        max(when(freshPred && col("op") === Envelope.OpTruncate, posCol)).as("tf"),
        collect_set(when(freshPred && isData, table.bucketCol)).as("bks")).collect()

      val eventsIn = stats.map(_.getAs[Long]("n")).sum
      val freshCount = stats.map(_.getAs[Long]("freshN")).sum
      val badCount = stats.map(_.getAs[Long]("badN")).sum
      if (badCount > 0) {
        // DLQ side output: quarantined verbatim with provenance, batch
        // keeps going (errors.tolerance=all).
        cached.where(quarantined)
          .withColumn("__batchId", lit(batchId))
          .write.mode("append").parquet(s"${table.root}/_quarantine")
      }
      // Null-part groups (fully-malformed rows) must not advance any
      // partition's watermark: getAs[Int] would unbox null to 0 and fence
      // legitimate part-0 events.
      val partIdx = if (stats.nonEmpty) stats.head.fieldIndex("part") else 0
      val validStats = stats.filter(r => !r.isNullAt(partIdx))
      val wmAdvance = validStats.map(r => r.getAs[Int]("part") -> r.getAs[Long]("mx")).toMap
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
        // The TABLE schema does not evolve — no data arrived, so a wider
        // batch schema (e.g. a multi-table fan-out slice that routed zero
        // rows here) must not leak into this table's history; the
        // reference evolves on records, not on batch shape.
        table.commit(CommitInfo(version, commitBatchId, newWm, newFence,
          last.map(_.schemas).getOrElse(schemas), last.map(_.schemaIdx).getOrElse(schemaIdx),
          last.map(_.files).getOrElse(Nil)), prev = last)
        if (writeMetrics) appendMetrics(spark, table, batchId, version, validStats, Map.empty, t0)
        return BatchResult(committed = true, version, batchId, eventsIn, 0, 0, "metadata-only")
      }

      // Touched buckets (truncate touches every bucket — the fence must be
      // applied to, i.e. rewrite, all of them).
      val touched: Set[Int] =
        if (batchFence.isDefined) (0 until table.numBuckets).toSet
        else stats.flatMap(_.getSeq[Int](stats.head.fieldIndex("bks"))).toSet

      // Job 2: storage-partitioned merge. Batch side: optional salted
      // pre-reduce, then ONE key-shuffle LWW reduce laid out
      // one-partition-per-bucket (reducePartitioned: partition-id ==
      // bucket-id, see LakeTable.stage contract). State side: bucketed
      // scan of the touched buckets' files — NO shuffle (the scan reports
      // the on-disk HashPartitioning; LakeTable.bucketedState). The
      // full-outer winner-pick join is co-partitioned, so the whole merge
      // moves only the batch over the wire — state ≫ batch at 10^10
      // events no longer re-shuffles every microbatch.
      val dataEvents = cached.where(freshPred && isData)
      val aligned = SchemaEvolution.align(dataEvents, evolved)
      val alignedFenced = batchFence.fold(aligned)(f => aligned.where(posCol > posLit(f)))

      val hasStateFiles = last.exists(_.files.exists(f => touched.contains(f.bucket)))
      // -Dgraft.forceLegacyMerge=true disables the storage-partitioned
      // state read — bench/A-B escape hatch, never set in production.
      val forceLegacy = sys.props.get("graft.forceLegacyMerge").contains("true")
      // Physical-path choice from EXACT cardinalities (state rows come
      // from the manifest's footer counts; batch rows from the stats
      // pass): the storage-partitioned join saves shuffling the state but
      // pays a hash build over the batch winners, so when the batch
      // rivals the state (bulk loads, replays) one union+reduce aggregate
      // is cheaper (measured ~12% on an 8M replay), while state ≫ batch
      // strongly favors the join (1.55× wall, 14× less shuffle). Unknown
      // counts (-1, pre-upgrade files) conservatively count as large.
      val stateRowCounts = last.map(_.files.filter(f => touched.contains(f.bucket)).map(_.rows)).getOrElse(Nil)
      val stateRows = if (stateRowCounts.exists(_ < 0)) Long.MaxValue else stateRowCounts.sum
      val preferJoin = stateRows > 2 * freshCount
      val fastState: Option[DataFrame] =
        if (!hasStateFiles || forceLegacy || table.mergeOnRead || !preferJoin) None
        else last.flatMap(ci => table.bucketedState(spark, ci, Some(touched), evolved))
          .map(st => batchFence.fold(st)(f => st.where(posCol > posLit(f))))

      // Bucket-layout LWW reduce: prefer the single-exchange plan with
      // native map-side combine (Lww.reduceBucketedExact — partial agg
      // bounds hot keys at one row per map task, no salt stage needed);
      // fall back to salted-level-1 + repartition when the session's
      // shuffle-partition count or AQE coalescing can't guarantee the
      // partition-id==bucket contract.
      // `exactIn` feeds the partial-agg plan; `fallbackIn` (lazy) feeds the
      // repartition plan and is where the caller pre-salts ONLY the batch
      // side (state already holds ≤1 row/key — salting it would add a
      // pointless state shuffle).
      def layoutReduce(
          exactIn: org.apache.spark.sql.DataFrame,
          fallbackIn: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        Lww.reduceBucketedExact(exactIn, table.keyCols, table.numBuckets)
          .getOrElse(Lww.reducePartitioned(fallbackIn, table.keyCols, table.numBuckets))
      def salted(in: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        if (salt > 1) Lww.saltedPartial(in, table.keyCols, salt) else in

      // Winners carry __src (1 = the batch side won the key) so the
      // applied-winner metric falls out of the merged result.
      val merged0 =
        if (table.mergeOnRead) {
          // Merge-on-read: append ONLY the batch's winners — no state
          // scan, no rewrite; readers resolve LWW across each bucket's
          // file stack (LakeTable.resolved). O(batch) apply regardless of
          // table size — the incremental-regime answer to copy-on-write
          // amplification.
          layoutReduce(alignedFenced, salted(alignedFenced)).withColumn("__src", lit(1))
        } else if (!hasStateFiles || fastState.isDefined) {
          val batchW = layoutReduce(alignedFenced, salted(alignedFenced))
          fastState match {
            case Some(st) => Lww.mergeCoPartitioned(st, batchW, table.keyCols, smj = table.sortedBuckets)
            case None     => batchW.withColumn("__src", lit(1))
          }
        } else {
          // Union+reduce: chosen when the batch rivals the state (see
          // preferJoin above), or as the fallback when an old file schema
          // needs a non-native widen (e.g. →String) this batch — shuffles
          // state once; the rewrite puts those buckets back on the
          // join path.
          val tagged = alignedFenced.withColumn("__src", lit(1))
          val st = last.flatMap(ci => table.snapshotRaw(spark, ci, Some(touched))).get
          val stAligned = SchemaEvolution.align(st, evolved).withColumn("__src", lit(0))
          val stFenced = batchFence.fold(stAligned)(f => stAligned.where(posCol > posLit(f)))
          layoutReduce(stFenced.unionAll(tagged), stFenced.unionAll(salted(tagged)))
        }
      val merged = if (writeMetrics) merged0.persist(StorageLevel.MEMORY_AND_DISK) else merged0

      // attempt = version keeps the staging directory unique per commit:
      // an out-of-band apply (fenceByBatchId=false) shares the stream's
      // batchId, and mode(overwrite) on a shared dir would delete files the
      // other commit's manifest still references.
      val staged = table.stage(merged.drop("__src"), batchId, schemaIdx, attempt = version)
      // CoW replaces the touched buckets' files; MoR appends (prior files
      // stay live and are shadowed per key at read time until compaction).
      val untouchedFiles =
        if (table.mergeOnRead) last.map(_.files).getOrElse(Nil)
        else last.map(_.files.filterNot(f => touched.contains(f.bucket))).getOrElse(Nil)
      table.commit(CommitInfo(version, commitBatchId, newWm, newFence, schemas, schemaIdx,
        untouchedFiles ++ staged), prev = last)

      // Between-batch maintenance (single-writer slot): depth-triggered
      // partial compaction keeps MoR read fan-in bounded by rewriting only
      // the buckets whose stack outgrew autoCompactDepth.
      if (table.autoCompactDepth > 0)
        table.compactDeepBuckets(spark, table.autoCompactDepth)

      var winnersCount = -1L
      if (writeMetrics) {
        // Job 3: applied batch winners per source partition, off the cached
        // merged result (one row per touched key — small).
        val applied = merged.where(col("__src") === 1)
          .groupBy(col("part")).agg(count(lit(1)).as("c")).collect()
          .map(r => r.getAs[Int]("part") -> r.getAs[Long]("c")).toMap
        winnersCount = applied.values.sum
        appendMetrics(spark, table, batchId, version, validStats, applied, t0)
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
