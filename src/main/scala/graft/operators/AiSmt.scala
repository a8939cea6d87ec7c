package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AI-adjacent SMTs — the Spark re-expression of the reference's AI
  * module: append an embedding of a chosen field
  * (`debezium-ai/debezium-ai-embeddings/src/main/java/io/debezium/ai/embeddings/FieldToEmbedding.java:51`)
  * and parse/chunk a document field
  * (`debezium-ai/debezium-ai-docling/.../FieldToDocling.java`).
  *
  * The MODEL is a clearly-marked deterministic fake (same policy as
  * `tdp/Multimodal`'s codec): a hash-projection embedding — component d is
  * a uniform value in [-1, 1) derived from md5(d || '|' || text) — and a
  * fixed-window chunker. The Spark-side plumbing is the real deliverable:
  * a codegen'd narrow projection per record (no UDF, no model server in
  * the hot path), an exploded chunk table with provenance, and both
  * reproducible enough that a SQL oracle computes identical values. A real
  * deployment swaps `hashEmbedding` for a `mapInPandas`/external-endpoint
  * stage with the SAME dataframe contract.
  */
object AiSmt {

  /** FAKE MODEL (deterministic): dims-dimensional hash-projection
    * embedding of a string column. Component d =
    * hex64(md5(d||'|'||text)[0,8)) / 2^31 - 1 ∈ [-1, 1), optionally
    * L2-normalized. Pure codegen'd built-ins; bit-identical in DuckDB via
    * ('0x' || substr(md5(...), 1, 8))::BIGINT.
    */
  def hashEmbedding(c: Column, dims: Int = 16, normalize: Boolean = true): Column = {
    val comps = (0 until dims).map { d =>
      conv(substring(md5(concat(lit(s"$d|"), c)), 1, 8), 16, 10)
        .cast("long").cast("double") / 2147483648.0 - 1.0
    }
    val arr = array(comps: _*)
    if (!normalize) arr
    else {
      val n = sqrt(aggregate(arr, lit(0.0), (acc, x) => acc + x * x))
      transform(arr, x => x / n)
    }
  }

  /** FieldToEmbedding: append `outCol` = embedding(field). The record
    * shape is otherwise untouched, so this composes with the envelope
    * pipeline like any SMT (unwrap → embed → sink).
    */
  def fieldToEmbedding(
      df: DataFrame,
      field: String,
      outCol: String = "embedding",
      dims: Int = 16,
      normalize: Boolean = true): DataFrame =
    df.withColumn(outCol, hashEmbedding(col(field), dims, normalize))

  /** FieldToDocling analog: segment a document field into fixed-width
    * chunks (the fake "parser"), one output row per chunk with provenance
    * (`chunk_idx`, `chunk_chars`). Real chunking-for-embeddings shape:
    * explode stays narrow (no shuffle), ordering is deterministic.
    */
  def fieldToChunks(df: DataFrame, field: String, maxLen: Int = 120): DataFrame = {
    val len = length(col(field))
    val n = greatest(ceil(len.cast("double") / maxLen).cast("int"), lit(1))
    val chunks = transform(sequence(lit(0), n - 1),
      i => col(field).substr(i * maxLen + 1, lit(maxLen)))
    df.select(col("*"), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_chars", length(col("chunk")))
  }
}
