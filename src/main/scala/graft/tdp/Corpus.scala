package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic test corpora derived from the driver's `documents` and
  * `embeddings` parquet (TESTDATA.md): the base tables plus planted exact
  * and near duplicates, so the dedup/similarity operators have known
  * positives to find. Every derivation has an ANSI-SQL twin (kept in
  * lock-step in [[Corpus.Sql]]) so the DuckDB oracle builds the identical
  * corpus.
  */
object Corpus {

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** documents ∪ near-dups (every 5th doc with a tail appended) ∪ exact
    * dups (every 7th doc verbatim), re-keyed into disjoint id ranges.
    */
  def docsWithDups(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir).select(col("doc_id"), col("text"), col("lang"))
    d.unionAll(
      d.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" the near dup tail")).as("text"), col("lang")))
      .unionAll(
        d.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"), col("lang")))
  }

  /** embeddings (as double vectors) ∪ scaled near-dups (×1.01 — cosine 1
    * with the original, lands in the same sign-projection LSH bucket).
    */
  def embsWithDups(spark: SparkSession, sfDir: String): DataFrame = {
    val e = embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
    e.unionAll(
      e.where(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.01)).as("embedding")))
  }

  object Sql {
    /** WITH-clause body for `corpus` (docs + dups). */
    val corpus: String =
      """corpus AS (
        |  SELECT doc_id, text, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, concat(text, ' the near dup tail') AS text, lang
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text, lang FROM documents WHERE doc_id % 7 = 0
        |)""".stripMargin

    /** WITH-clause body for `emb` (embeddings as double + scaled dups). */
    val emb: String =
      """emb AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, [CAST(x AS DOUBLE) * 1.01 for x in embedding] AS embedding
        |  FROM embeddings WHERE vec_id % 5 = 0
        |)""".stripMargin
  }
}
