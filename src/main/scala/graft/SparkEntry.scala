package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.ChangeLog
import graft.operators.Lww
import graft.streaming.CdcPipeline
import graft.table.LakeTable

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val cte = ChangeLog.Sql.cte

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_cdc_apply_state")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 source: synthetic change-log derivation (envelope payload, flat)
    "q01_cdc_changelog" -> ((s, dir) => ChangeLog.flat(s, dir)),
    // §2.3 batch reduction: per-key LWW winner (ReducedRecordBuffer semantics)
    "q02_cdc_lww_reduce" -> ((s, dir) => Lww.reduce(ChangeLog.flat(s, dir))),
    // §2.4 apply: final table state after upsert/delete fold + sha256 invariant
    "q03_cdc_apply_state" -> ((s, dir) =>
      Lww.applyState(ChangeLog.flat(s, dir))
        .select(col("repo"), col("path"), col("commit"), col("lang"), col("content"),
          sha2(col("content"), 256).as("content_sha"))),
    // §3/§7 full engine: microbatched replay into the transactional
    // LakeTable (idempotent commits, tombstone retention, salted merge),
    // then read the converged snapshot back. Same oracle as q03 — proves
    // the engine's table state equals the declarative fold.
    "q04_cdc_replay_e2e" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-e2e").toString
      val table = new LakeTable(root, numBuckets = 16)
      CdcPipeline.replay(s, ChangeLog.flat(s, dir), table, numBatches = 6, salt = 4)
      table.snapshot(s).get
        .select(col("repo"), col("path"), col("commit"), col("lang"), col("content"),
          sha2(col("content"), 256).as("content_sha"))
    }),
    // §7.0 item 9: per-partition lineage metrics of a replay (wall-clock
    // columns excluded; dedup/applied counts are deterministic for the
    // single-batch replay used here).
    "q05_cdc_metrics" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-metrics").toString
      val table = new LakeTable(root, numBuckets = 16)
      CdcPipeline.replay(s, ChangeLog.flat(s, dir), table, numBatches = 1, salt = 4)
      s.read.parquet(s"$root/_metrics")
        .select(col("part"), col("freshEvents"), col("applied"), col("dedupDropped"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_cdc_changelog" ->
      s"""$cte
         |SELECT repo, path, commit, lang, content, op, part, lsn, ts_ms FROM ev""".stripMargin,
    "q02_cdc_lww_reduce" ->
      s"""$cte
         |SELECT repo, path, commit, lang, content, op, part, lsn, ts_ms FROM (
         |  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
         |  FROM ev) t
         |WHERE rn = 1""".stripMargin,
    "q03_cdc_apply_state" ->
      s"""$cte
         |SELECT repo, path, commit, lang, content, sha256(content) AS content_sha FROM (
         |  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
         |  FROM ev) t
         |WHERE rn = 1 AND op <> 'd'""".stripMargin,
    "q04_cdc_replay_e2e" ->
      s"""$cte
         |SELECT repo, path, commit, lang, content, sha256(content) AS content_sha FROM (
         |  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
         |  FROM ev) t
         |WHERE rn = 1 AND op <> 'd'""".stripMargin,
    "q05_cdc_metrics" ->
      s"""$cte
         |, winners AS (
         |  SELECT part FROM (
         |    SELECT part, row_number() OVER (PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
         |    FROM ev) t
         |  WHERE rn = 1)
         |SELECT f.part, f.freshEvents,
         |       coalesce(w.applied, 0) AS applied,
         |       f.freshEvents - coalesce(w.applied, 0) AS dedupDropped
         |FROM (SELECT part, count(*) AS freshEvents FROM ev GROUP BY part) f
         |LEFT JOIN (SELECT part, count(*) AS applied FROM winners GROUP BY part) w
         |  ON f.part = w.part""".stripMargin,
  )
}
