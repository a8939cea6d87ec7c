package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.ChangeLog
import graft.operators.Lww

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
  )
}
