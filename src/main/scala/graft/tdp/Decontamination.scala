package graft.tdp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove training documents that overlap an
  * evaluation/benchmark set, the standard pretraining hygiene step
  * (published methodology: GPT-3 appendix C's 13-gram overlap filter and
  * its descendants; n is configurable because the right gram length
  * scales with document length).
  *
  * Scale shape (the part that matters at 100 TB): the benchmark side is
  * SMALL by construction (eval sets are thousands of documents, not
  * billions), so its distinct gram-hash set is broadcastable and the
  * CORPUS NEVER SHUFFLES:
  *
  *  1. benchmark → distinct n-gram md5s (tiny, broadcast);
  *  2. corpus → (id, gram-md5) narrow rows (16-byte hashes, never text),
  *     broadcast-joined against the benchmark grams at scan speed — only
  *     the MATCHING (id, gram) rows survive to the aggregation shuffle,
  *     which is therefore O(contamination), not O(corpus);
  *  3. the contaminated-id set (bounded by the benchmark's reach) comes
  *     back to the driver side as a broadcast anti-join — the kept corpus
  *     streams through untouched.
  *
  * Tokenization is shared with the dedup family ([[Dedup.shingles]] →
  * [[TextAnalysis.words]]) so "overlap" means the same thing to dedup,
  * repetition scoring, and decontamination, and the DuckDB oracle
  * recomputes it verbatim.
  */
object Decontamination {

  /** Distinct n-gram md5s of a document (md5 keeps the shuffled/broadcast
    * width at 32 hex chars regardless of gram length; DuckDB computes the
    * identical digest for the oracle).
    */
  def gramHashes(text: Column, n: Int): Column =
    array_distinct(transform(Dedup.shingles(text, n), g => md5(g)))

  /** SEMANTIC contamination report: corpus vectors whose cosine to ANY
    * eval-set vector reaches `threshold` — the embedding-space sibling of
    * the n-gram filter (catches paraphrased/translated benchmark leakage
    * that exact n-grams miss; standard practice alongside lexical
    * decontamination). Output: (idCol as corpus id, eval_id, cos) per
    * flagged pair, cosine rounded like the ANN family.
    *
    * Scale shape mirrors [[contaminationReport]]: the eval set is SMALL
    * by construction and BROADCAST; the corpus is scanned once, never
    * shuffled. The default is the exact pass (|corpus| × |eval| cosines,
    * streamed); `planes > 0` switches to the sign-LSH blocked variant
    * ([[Similarity.lshBucket]] on both sides, broadcast join on the
    * bucket key) which evaluates only same-bucket candidates — recall
    * trades with `planes` exactly as in the ANN operators.
    */
  def semanticContamination(
      corpus: DataFrame,
      evalSet: DataFrame,
      threshold: Double = 0.95,
      planes: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c0 = corpus.select(col(idCol), col(vecCol).as("__v"))
    val e0 = evalSet.select(col(idCol).as("eval_id"), col(vecCol).as("__ev"))
    val joined =
      if (planes <= 0) c0.crossJoin(broadcast(e0))
      else c0.withColumn("__bkt", Similarity.lshBucket(col("__v"), planes))
        .join(broadcast(e0.withColumn("__bkt", Similarity.lshBucket(col("__ev"), planes))), "__bkt")
    joined
      .select(col(idCol), col("eval_id"),
        round(Similarity.cosine(col("__v"), col("__ev")), 4).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Drop every corpus row flagged by [[semanticContamination]] — one
    * broadcast anti-join on the (bounded) flagged-id set.
    */
  def decontaminateSemantic(
      corpus: DataFrame,
      flagged: DataFrame,
      idCol: String = "vec_id"): DataFrame =
    corpus.join(broadcast(flagged.select(col(idCol)).distinct()), Seq(idCol), "left_anti")

  /** Per-document contamination report: documents sharing at least
    * `minOverlap` distinct n-grams with the benchmark set, with the
    * matched-gram count. Output: (idCol, matched_grams).
    */
  def contaminationReport(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 13,
      minOverlap: Int = 1,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bench = benchmark
      .select(explode(gramHashes(col(textCol), n)).as("__g"))
      .distinct()
    val corpusGrams = docs.select(col(idCol), explode(gramHashes(col(textCol), n)).as("__g"))
    corpusGrams
      .join(broadcast(bench), "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_grams"))
      .where(col("matched_grams") >= minOverlap)
  }

  /** The decontaminated corpus: `docs` minus every document flagged by
    * [[contaminationReport]]. The flagged-id side is bounded by the
    * benchmark's reach into the corpus — orders of magnitude below the
    * corpus — so it broadcasts and the kept rows never shuffle. (If a
    * pathological benchmark contaminated a large corpus fraction, drop
    * the explicit `broadcast` hint and let AQE pick the join; the
    * semantics are unchanged.)
    */
  def decontaminate(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 13,
      minOverlap: Int = 1,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bad = contaminationReport(docs, benchmark, n, minOverlap, idCol, textCol)
      .select(col(idCol))
    docs.join(broadcast(bad), Seq(idCol), "left_anti")
  }

  /** SPAN-LEVEL redaction: drop only the LINES that overlap the benchmark
    * instead of the whole document (the usual production refinement —
    * dropping a long document for one quoted benchmark sentence wastes
    * the rest of it). Output: (idCol, textCol with contaminated lines
    * removed, `redacted_lines` count); documents reduced to nothing keep
    * a row with empty text, never disappear.
    *
    * Scale shape: lines explode NARROW (id, line-index, gram-md5) into a
    * broadcast join against the benchmark gram set — only matching
    * (id, line) pairs survive to the (small, broadcast) bad-line set —
    * and the single corpus-width shuffle is the per-document reassembly
    * groupBy, the floor for an operator that returns rewritten text.
    */
  def redactContaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 13,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bench = benchmark
      .select(explode(gramHashes(col(textCol), n)).as("__g"))
      .distinct()
    val lines = docs.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__i", "__line")))
    val bad = lines
      .select(col(idCol), col("__i"), explode(gramHashes(col("__line"), n)).as("__g"))
      .join(broadcast(bench), "__g")
      .select(col(idCol), col("__i")).distinct()
      .withColumn("__bad", lit(true))
    lines.join(broadcast(bad), Seq(idCol, "__i"), "left")
      .groupBy(col(idCol))
      .agg(
        // collect_list skips the nulled (redacted) entries; array_sort on
        // (__i, line) structs restores the original line order.
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("__bad").isNull, struct(col("__i"), col("__line"))))),
            x => x.getField("__line"))).as(textCol),
        count(col("__bad")).as("redacted_lines"))
  }
}
