package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic LogMiner-shaped transaction log derived from
  * the driver's `documents` parquet — the input grid for the Oracle-
  * connector buffered-transaction semantics ([[graft.operators.TxnBuffer]]).
  *
  * Reference shape (studied, not copied): LogMiner emits interleaved
  * per-transaction DML rows identified by (transaction id, SCN, row id)
  * plus separate COMMIT/ROLLBACK marker rows; DML rows may carry a
  * ROLLBACK FLAG marking a partial undo of the latest event with the
  * same row id (`debezium-connector-oracle/src/main/java/io/debezium/
  * connector/oracle/logminer/events/LogMinerEventRow.java:122`,
  * `buffered/BufferedLogMinerStreamingChangeEventSource.java:763-774`).
  *
  * Grid (lock-step with the DuckDB twin in `SparkEntry.txnCte`; requires
  * ≥40 documents so every transaction residue is populated):
  *  - one transaction per `doc_id % 40`; each doc contributes a create
  *    (scn = doc_id*8+1) and an update-or-delete (scn = doc_id*8+4);
  *  - docs with `doc_id % 11 == 3` append an UNDO row (rollback_flag,
  *    scn = doc_id*8+6) cancelling the latest live event of that row id;
  *  - docs with `doc_id % 13 == 5` (and no undo) append two LOB_WRITE
  *    fragments (op `lob`, scn = doc_id*8+2, +3) owned by the create;
  *  - decisions: txn % 5 == 0 → ROLLBACK, else txn % 7 == 3 → none
  *    (in-flight), else COMMIT at decision scn 10_000_000 + txn.
  */
object TxnLog {

  /** DML + undo + LOB-fragment rows:
    * (txn_id, scn, op, row_id, rollback_flag, content).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val dId = col("doc_id")
    val txn = concat(lit("txn"), lpad((dId % 40).cast("string"), 3, "0"))
    val rowId = concat(lit("r"), dId.cast("string"))

    val versions = spark.range(1, 3).select(col("id").cast("int").as("v"))
    val v = col("v")
    val dml = docs.crossJoin(versions).select(
      txn.as("txn_id"),
      (dId * 8 + when(v === 1, 1).otherwise(4)).as("scn"),
      when(v === 1, "c").when(dId % 4 === 0, "d").otherwise("u").as("op"),
      rowId.as("row_id"),
      lit(false).as("rollback_flag"),
      when(v === 2 && dId % 4 === 0, lit(null).cast("string"))
        .otherwise(concat(substring(col("text"), 1, 200), lit(" #v"), v.cast("string")))
        .as("content"))

    val undo = docs.where(dId % 11 === 3).select(
      txn.as("txn_id"), (dId * 8 + 6).as("scn"), lit("u").as("op"),
      rowId.as("row_id"), lit(true).as("rollback_flag"),
      lit(null).cast("string").as("content"))

    val fragIdx = spark.range(2, 4).select(col("id").cast("int").as("k"))
    val lob = docs.where(dId % 13 === 5 && dId % 11 =!= 3).crossJoin(fragIdx)
      .select(
        txn.as("txn_id"), (dId * 8 + col("k")).as("scn"), lit("lob").as("op"),
        rowId.as("row_id"), lit(false).as("rollback_flag"),
        concat(lit("L"), col("k").cast("string"), lit(":"),
          substring(col("text"), 50, 40)).as("content"))

    dml.unionAll(undo).unionAll(lob)
  }

  /** COMMIT/ROLLBACK marker rows: (txn_id, kind, decision_scn).
    * In-flight transactions (txn % 7 == 3 among non-rollbacks) are simply
    * absent — the reference's still-buffered case.
    */
  def decisions(spark: SparkSession): DataFrame = {
    val t = col("id").cast("int")
    spark.range(0, 40)
      .where(!(t % 5 =!= 0 && t % 7 === 3))
      .select(
        concat(lit("txn"), lpad(t.cast("string"), 3, "0")).as("txn_id"),
        when(t % 5 === 0, "ROLLBACK").otherwise("COMMIT").as("kind"),
        (lit(10000000L) + t).as("decision_scn"))
  }
}
