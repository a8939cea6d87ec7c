package graft.merge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.merge.CdcApply.BatchResult
import graft.table.LakeTable

/** Row-level DML over a [[LakeTable]] — `DELETE FROM … WHERE` and
  * `UPDATE … SET … WHERE` — expressed the engine's one way: as change
  * events applied through the exactly-once merge. The GDPR/maintenance
  * surface every lake engine needs (Delta/Iceberg row-level DELETE/UPDATE
  * analog), and the JDBC-sink world's ad-hoc DML, without a second write
  * path: no file surgery, no special commit type — the merge, compaction,
  * tombstone retention, change feed, time travel, and derived views all
  * see ordinary events.
  *
  * LWW ordering: each emitted event wins its key by commit-suffixing —
  * `commit → commit ‖ '~'` ('~' = 0x7E sorts above every alphanumeric in
  * ASCII, and zone-map bounds remain ASCII-sound), with the row's own
  * lsn untouched. Per-key the new event strictly dominates the row it
  * replaces; unrelated keys are untouched.
  *
  * Both ops apply OUT-OF-BAND (`fenceByWatermark/fenceByBatchId = false`,
  * like the signal-driven snapshot chunks): they do not advance the
  * stream's batchId, and convergence under redelivery comes from LWW —
  * re-running a delete matches nothing (the rows are gone); re-running an
  * update is a second update, as it would be in SQL.
  *
  * Scale shape: one manifest-pruned state scan filtered by `pred`
  * (pushed to parquet), then the standard merge whose shuffle is O(hits),
  * never O(state).
  */
object Dml {

  private def bump(c: Column): Column = concat(c, lit("~"))

  /** `DELETE FROM table WHERE pred`: every current-state row matching
    * `pred` gets a dominating tombstone event. Returns the apply's
    * result (fresh = rows deleted); a no-hit delete is a no-op commit.
    */
  def deleteWhere(
      spark: SparkSession,
      table: LakeTable,
      pred: Column,
      salt: Int = 1): BatchResult = {
    val state = table.snapshot(spark).getOrElse(
      throw new IllegalStateException("deleteWhere on an empty table"))
    val events = state.where(pred)
      .withColumn("commit", bump(col("commit")))
      .withColumn("op", lit("d"))
    CdcApply.applyBatch(spark, table, events, batchId = 0L, salt = salt,
      writeMetrics = false, fenceByWatermark = false, fenceByBatchId = false)
  }

  /** `UPDATE table SET <sets> WHERE pred`: matching rows re-emit with the
    * SET expressions applied (each evaluated against the OLD row, so
    * `"content" -> concat(col("content"), …)` works) and a dominating
    * commit. Key columns cannot be SET — that is an insert+delete, not an
    * update (same rule as SQL engines enforce for bucketed tables).
    */
  def updateWhere(
      spark: SparkSession,
      table: LakeTable,
      pred: Column,
      sets: Seq[(String, Column)],
      salt: Int = 1): BatchResult = {
    val bad = sets.map(_._1).filter(table.keyCols.contains)
    require(bad.isEmpty, s"cannot SET key column(s) ${bad.mkString(", ")} — " +
      "delete and re-insert instead (the key IS the row's identity and bucket)")
    val state = table.snapshot(spark).getOrElse(
      throw new IllegalStateException("updateWhere on an empty table"))
    val hits = state.where(pred)
    // all SETs evaluate against the old row in ONE projection (sequential
    // withColumn would let a later SET see an earlier SET's output)
    val updated = hits.select(hits.columns.toIndexedSeq.map { c =>
      sets.collectFirst { case (n, e) if n == c => e.as(c) }.getOrElse(col(c))
    }: _*)
    val events = updated
      .withColumn("commit", bump(col("commit")))
      .withColumn("op", lit("u"))
    CdcApply.applyBatch(spark, table, events, batchId = 0L, salt = salt,
      writeMetrics = false, fenceByWatermark = false, fenceByBatchId = false)
  }
}
