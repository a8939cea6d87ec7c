package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Envelope

/** Deterministic synthetic change-event log derived from the driver's
  * `documents` parquet table (TESTDATA.md), shaped per BASELINE.json
  * input_hint: (repo, path, commit, lang, content).
  *
  * The derivation is intentionally expressible in ANSI SQL so DuckDB can
  * compute the identical log as the correctness oracle ([[Sql.cte]] must be
  * kept in lock-step with [[flat]]).
  *
  * Scenario coverage (mirrors the reference's integration scenarios,
  * `BinlogConnectorIT.java` — consume-all, deletes, re-creates, replays):
  *  - each key (repo, path) sees up to 3 versions: create, then update or
  *    delete, then update / re-create;
  *  - no event after a delete unless it is a re-create (prefix-valid);
  *  - exact duplicate replays of a log subset (`lsn % 7 = 0`) exercise
  *    idempotence / dedup fencing;
  *  - `part` = doc_id % 8 simulates source partitions; `lsn` is the total
  *    order within the log; `commit` is the sortable commit id.
  */
object ChangeLog {

  /** Flat change log: repo, path, commit, lang, content, op, part, lsn, ts_ms.
    * Includes duplicate replays.
    */
  def flat(spark: SparkSession, sfDir: String): DataFrame =
    withReplays(base(spark, sfDir))

  /** The log without duplicate replays. */
  def base(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val versions = spark.range(1, 4).select(col("id").cast("int").as("v"))
    val dId = col("doc_id")
    val opCol =
      when(col("v") === 1, "c")
        .when(col("v") === 2, when(dId % 4 === 0, "d").otherwise("u"))
        .otherwise(when(dId % 8 === 0, "c").otherwise("u"))
    val lsn = dId * 3 + col("v")
    docs.crossJoin(versions)
      .where(!(col("v") === 3 && dId % 4 === 0 && dId % 8 =!= 0))
      .select(
        concat(lit("repo"), lpad((dId % 10).cast("string"), 2, "0")).as("repo"),
        concat(lit("src/f"), dId.cast("string"), lit(".txt")).as("path"),
        concat(lit("c"), lpad(lsn.cast("string"), 10, "0")).as("commit"),
        col("lang"),
        when(opCol === "d", lit(null).cast("string"))
          .otherwise(concat(substring(col("text"), 1, 200), lit(" #v"), col("v").cast("string")))
          .as("content"),
        opCol.as("op"),
        (dId % 8).cast("int").as("part"),
        lsn.as("lsn"),
        (lit(1700000000000L) + lsn * 1000L).as("ts_ms"))
  }

  /** Append exact duplicate replays of a log subset (exactly-once fencing
    * scenario: the same events arrive twice).
    */
  def withReplays(log: DataFrame): DataFrame =
    log.unionAll(log.where(col("lsn") % 7 === 0))

  /** Envelope-shaped version of the log. */
  def envelopes(spark: SparkSession, sfDir: String): DataFrame =
    Envelope.wrap(flat(spark, sfDir))

  /** ANSI-SQL twins of the derivation above, for the DuckDB oracle. */
  object Sql {
    private val opExpr =
      """CASE WHEN v = 1 THEN 'c'
        |     WHEN v = 2 THEN (CASE WHEN doc_id % 4 = 0 THEN 'd' ELSE 'u' END)
        |     ELSE (CASE WHEN doc_id % 8 = 0 THEN 'c' ELSE 'u' END) END""".stripMargin

    /** WITH clause producing `ev` = the full flat log incl. replays. */
    val cte: String =
      s"""WITH ev0 AS (
         |  SELECT concat('repo', lpad(cast(doc_id % 10 AS varchar), 2, '0')) AS repo,
         |         concat('src/f', cast(doc_id AS varchar), '.txt') AS path,
         |         concat('c', lpad(cast(doc_id * 3 + v AS varchar), 10, '0')) AS commit,
         |         lang,
         |         CASE WHEN ($opExpr) = 'd' THEN NULL
         |              ELSE concat(substr(text, 1, 200), ' #v', cast(v AS varchar)) END AS content,
         |         ($opExpr) AS op,
         |         cast(doc_id % 8 AS int) AS part,
         |         doc_id * 3 + v AS lsn,
         |         1700000000000 + (doc_id * 3 + v) * 1000 AS ts_ms
         |  FROM documents CROSS JOIN (VALUES (1),(2),(3)) AS vs(v)
         |  WHERE NOT (v = 3 AND doc_id % 4 = 0 AND doc_id % 8 <> 0)
         |), ev AS (SELECT * FROM ev0 UNION ALL SELECT * FROM ev0 WHERE lsn % 7 = 0)""".stripMargin
  }
}
