package graft.tdp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget training sequences (the step between a cleaned
  * corpus and a dataloader — packing short documents together instead of
  * padding each to the context length).
  *
  * Contiguous greedy packing: within a pack group, documents are taken
  * in a deterministic order and a document starts a new sequence when
  * the RUNNING token total before it crosses a multiple of
  * `maxTokens` — i.e. `seq = floor((cumsum - tokens) / maxTokens)`, the
  * standard contiguous-fill rule (a document longer than the budget
  * gets a sequence of its own; packing never splits documents).
  *
  * Scale shape: a single global running sum would serialize on one
  * partition, so packing is done WITHIN deterministic hash groups
  * (`numGroups` ≈ cluster parallelism; each group packs independently —
  * exactly how a dataloader shards anyway). One window over
  * (group, docOrder): Spark plans a single hash exchange on the group
  * key + an in-partition running sum — no global sort, no driver state.
  * Everything is a pure function of (doc_id, token count), so the
  * DuckDB oracle recomputes it with the same window (q77).
  */
object Packing {

  /** Pack-group of a document: deterministic, ENGINE-PORTABLE hash
    * bucket (md5-based [[graft.operators.Transforms.stableRoute]], the
    * same function the partition router uses — an oracle or a dataloader
    * in another engine recomputes the same grouping).
    */
  def packGroup(docId: Column, numGroups: Int): Column =
    graft.operators.Transforms.stableRoute(docId.cast("string"), numGroups)

  /** Assign (group, seq, tokens) per document. `tokens` must be a
    * positive integer column (e.g. `TextAnalysis.bpeIshTokenCount`).
    * Within a group, documents pack in `docId` order.
    */
  def packSequences(
      docs: DataFrame,
      docId: Column,
      tokens: Column,
      maxTokens: Long,
      numGroups: Int = 32): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be positive: $maxTokens")
    val grouped = docs
      .withColumn("pack_group", packGroup(docId, numGroups))
      .withColumn("tokens", tokens.cast("long"))
    val w = Window.partitionBy(col("pack_group")).orderBy(docId.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .withColumn("pack_seq",
        floor((col("cum_tokens") - col("tokens")) / lit(maxTokens)))
  }

  /** Per-sequence summary: document count, token fill, fill ratio —
    * the padding-waste metric packing exists to minimize.
    */
  def packSummary(packed: DataFrame, maxTokens: Long): DataFrame =
    packed.groupBy("pack_group", "pack_seq")
      .agg(count(lit(1)).as("docs"), sum("tokens").as("fill_tokens"))
      .withColumn("fill_ratio",
        round(col("fill_tokens") / lit(maxTokens.toDouble), 6))
}
