package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic large-scale synthetic change-event log for throughput
  * benchmarking (BASELINE.json north rule: events/sec applied on a
  * 10^10-event log at full scale; in-sandbox evidence at reduced scale).
  *
  * Shape per the input hint: (repo, path, commit, lang, content) payload +
  * (op, part, lsn, ts_ms) positions. Generated from `spark.range` — pure
  * codegen, no input files, identical at any parallelism — so the bench
  * measures the engine (reduce + merge + commit), not a data source.
  *
  * Skew by construction (north rule: hot repos): `hotShare` of all events
  * hit `hotKeys` keys inside one hot repo; the rest spread uniformly over
  * `numKeys` keys in 100 repos. Key→event assignment uses a Knuth
  * multiplicative hash of the event id — deterministic, order-free.
  */
object SyntheticLog {

  /** @param startId first event id — lets incremental batches continue a
    *        previously-generated log's lsn sequence against the same key
    *        space (state-heavy merge scenarios).
    */
  def generate(
      spark: SparkSession,
      numEvents: Long,
      numKeys: Long,
      parts: Int = 32,
      hotKeys: Long = 100L,
      hotPct: Int = 20,
      startId: Long = 0L): DataFrame = {
    val id = col("id")
    val mixed = pmod(id * 2654435761L, lit(numKeys))
    val isHot = pmod(id, lit(100L)) < hotPct
    val keyId = when(isHot, pmod(id * 40503L, lit(hotKeys))).otherwise(mixed)
    val repo = when(isHot, lit("repo_hot"))
      .otherwise(concat(lit("repo"), lpad(pmod(keyId, lit(100L)).cast("string"), 3, "0")))
    val lsn = id + 1L
    val opMod = pmod(id, lit(19L))
    val op = when(opMod === 18L, "d").when(opMod === 17L, "r").otherwise(when(pmod(id, lit(2L)) === 0L, "c").otherwise("u"))
    spark.range(startId, startId + numEvents, 1L, parts).select(
      repo.as("repo"),
      concat(lit("src/f"), keyId.cast("string"), lit(".txt")).as("path"),
      concat(lit("c"), lpad(lsn.cast("string"), 12, "0")).as("commit"),
      element_at(typedlit(Seq("en", "de", "fr", "es", "zh")), (pmod(keyId, lit(5L)) + 1).cast("int")).as("lang"),
      when(op === "d", lit(null).cast("string"))
        .otherwise(concat(lit("// body "), md5(concat(keyId.cast("string"), lit("-"), lsn.cast("string"))),
          lit(" "), repeat(md5(keyId.cast("string")), 3))).as("content"),
      op.as("op"),
      pmod(id, lit(parts.toLong)).cast("int").as("part"),
      lsn.as("lsn"),
      (lit(1700000000000L) + lsn).as("ts_ms"))
  }
}
