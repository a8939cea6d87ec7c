package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-connector BUFFERED TRANSACTION semantics (LogMiner), re-expressed
  * as declarative Spark over a batch/microbatch of interleaved transaction
  * events — no per-transaction driver state, no event cache.
  *
  * Reference semantics (studied, not copied),
  * `debezium-connector-oracle/src/main/java/io/debezium/connector/oracle/logminer/buffered/BufferedLogMinerStreamingChangeEventSource.java`:
  *  - events buffer per transaction until its decision marker arrives;
  *    COMMIT emits them in order tagged with the commit SCN and a
  *    per-transaction event index (`handleCommitEvent`, :424-531, the
  *    `TransactionCommitConsumer.Handler` assigning `eventIndex`);
  *    ROLLBACK discards the whole buffer (`handleRollbackEvent`, :623-630);
  *  - a DML row carrying the ROLLBACK FLAG is a PARTIAL UNDO: it is never
  *    dispatched itself and removes the LATEST still-live event with the
  *    same row id in its transaction — the constraint-violation pattern
  *    where the transaction still commits
  *    (`isDispatchAllowedForDataChangeEvent`, :763-774;
  *    `rollbackTransactionEventWithRowId`, :1085-1093);
  *  - transactions that outlive the retention window without a decision
  *    are ABANDONED (`abandonTransactions`, :1254; config
  *    `log.mining.transaction.retention.ms`, `OracleConnectorConfig.java:193`),
  *    as are transactions exceeding the buffered-event threshold
  *    (`abandonTransactionOverEventThreshold`, :1238);
  *  - LOB_WRITE fragments merge into the owning DML before dispatch
  *    (`TransactionCommitConsumer.java:78-124` — fragments are assembled
  *    in order and folded into the most recent DML for the row; the
  *    fragment rows themselves are never dispatched).
  *
  * Spark mapping — each rule is ONE window or ONE join keyed by
  * (txn_id[, row_id]); shuffle volume is O(buffered window), never
  * O(table), and a hot transaction stays a single partition's sort, not a
  * driver-side cache:
  *  - the undo rule is exact LIFO cancellation, computed with a running
  *    balance + a reverse running minimum: a +1 event is cancelled iff
  *    the balance ever returns below its own level (the nearest-unmatched-
  *    push pairing, i.e. the reference's "latest event with this row id");
  *  - commit emission is an inner join against the COMMIT decisions;
  *  - abandonment is a per-transaction aggregate compared to the
  *    retention fence — no timers, no state store.
  */
object TxnBuffer {

  private val byRow = Seq("txn_id", "row_id")

  /** Exact partial-undo (LIFO) cancellation. Undo rows are dropped; each
    * cancels the latest still-live non-LOB event of its (txn_id, row_id).
    * LOB fragment rows (`op = 'lob'`) pass through untouched — the
    * reference's undo matching targets DML events only. Unmatched undos
    * (no live event — the reference logs a warning) just disappear.
    */
  def undoFiltered(events: DataFrame): DataFrame = {
    val part = Window.partitionBy(byRow.map(col): _*).orderBy(col("scn"))
    val balW = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val minW = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val delta =
      when(col("rollback_flag"), -1).when(col("op") === "lob", 0).otherwise(1)
    events
      .withColumn("__bal", sum(delta).over(balW))
      .withColumn("__minf", min(col("__bal")).over(minW))
      .where(col("op") === "lob" ||
        (!col("rollback_flag") && col("__minf") >= col("__bal")))
      .drop("__bal", "__minf")
  }

  /** Committed events in dispatch order: the undo-filtered buffer inner-
    * joined to COMMIT decisions, tagged with the commit SCN and the
    * reference's per-transaction event index (`emit_seq`). Rolled-back
    * and undecided transactions emit nothing — exactly the buffer
    * contract. Callers exclude LOB rows (or fold them first via
    * [[lobMerged]]).
    */
  def commitOrdered(events: DataFrame, decisions: DataFrame): DataFrame =
    attachCommits(undoFiltered(events), decisions)

  /** The commit join + dispatch index over an ALREADY undo-filtered (and
    * optionally [[lobMerged]]) buffer.
    */
  def attachCommits(survivors: DataFrame, decisions: DataFrame): DataFrame = {
    val commits = decisions.where(col("kind") === "COMMIT")
      .select(col("txn_id"), col("decision_scn").as("commit_scn"))
    val w = Window.partitionBy(col("txn_id")).orderBy(col("scn"))
    survivors
      .join(commits, "txn_id")
      .withColumn("emit_seq", row_number().over(w))
  }

  /** Per-transaction buffer summary: live (post-undo) event count, first/
    * last buffered SCN, and the decision status — `committed`,
    * `rolled_back`, `abandoned` (undecided with a start SCN older than
    * `retentionCutoffScn`, the retention-window analog) or `in_flight`.
    */
  def bufferState(
      events: DataFrame,
      decisions: DataFrame,
      retentionCutoffScn: Long): DataFrame = {
    val live = undoFiltered(events).where(col("op") =!= "lob")
      .groupBy("txn_id")
      .agg(count(lit(1)).as("events_live"),
        min(col("scn")).as("start_scn"),
        max(col("scn")).as("end_scn"))
    live.join(decisions, Seq("txn_id"), "left")
      .select(col("txn_id"), col("events_live"), col("start_scn"), col("end_scn"),
        when(col("kind") === "COMMIT", "committed")
          .when(col("kind") === "ROLLBACK", "rolled_back")
          .when(col("start_scn") < retentionCutoffScn, "abandoned")
          .otherwise("in_flight").as("status"))
  }

  /** Transactions whose live buffered-event count exceeds `maxEvents` —
    * the reference's over-threshold abandonment
    * (`abandonTransactionOverEventThreshold`). A map-side-combined
    * aggregate: one small row per transaction crosses the exchange.
    */
  def thresholdAbandoned(events: DataFrame, maxEvents: Long): DataFrame =
    undoFiltered(events).where(col("op") =!= "lob")
      .groupBy("txn_id").agg(count(lit(1)).as("events_live"))
      .where(col("events_live") > maxEvents)

  /** Fold LOB_WRITE fragments into their owning DML: per (txn_id, row_id)
    * the fragments assemble in SCN order and replace the content of the
    * latest live DML PRECEDING the first fragment; fragment rows are
    * consumed (never dispatched). Input should already be undo-filtered.
    */
  def lobMerged(survivors: DataFrame): DataFrame = {
    val frags = survivors.where(col("op") === "lob")
      .groupBy(byRow.map(col): _*)
      .agg(
        min(col("scn")).as("__ffs"),
        array_join(transform(
          array_sort(collect_list(struct(col("scn"), col("content")))),
          f => f.getField("content")), "").as("__lob"))
    val dml = survivors.where(col("op") =!= "lob")
    val ownerW = Window.partitionBy(byRow.map(col): _*)
    dml.join(frags, byRow, "left")
      .withColumn("__owner_scn",
        max(when(col("scn") < col("__ffs"), col("scn"))).over(ownerW))
      .withColumn("content",
        when(col("scn") === col("__owner_scn") && col("__lob").isNotNull, col("__lob"))
          .otherwise(col("content")))
      .drop("__ffs", "__lob", "__owner_scn")
  }
}
