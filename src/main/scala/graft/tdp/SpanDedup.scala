package graft.tdp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring mining — the exact-substring dedup of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better") re-expressed at word-k-gram granularity for a shuffle-bounded
  * distributed plan: find maximal TOKEN SPANS that appear verbatim in at
  * least `minDocs` distinct documents, and optionally redact just those
  * spans (the paper's finding: removing the repeated substring beats
  * dropping whole documents).
  *
  * Scale shape (the point): the paper's suffix array is a single-machine
  * structure; the distributed equivalent is gram-level evidence with
  * per-document span reassembly, and the only corpus-sized exchanges are
  *
  *  1. the duplicated-gram detection — ONE shuffle of (doc, gram-hash)
  *     rows, pre-pruned by a map-side-combined count-min sketch
  *     ([[HeavyHitters.CmsAgg]] over per-doc-distinct grams, so the
  *     sketch estimates DOCUMENT frequency): CMS overcounts and never
  *     undercounts, so `estimate ≥ minDocs` keeps a superset and the
  *     web-scale singleton tail (most grams, by Zipf) never reaches the
  *     exchange; the exact count on survivors removes false positives,
  *     making the result EQUAL to the exact distinct-doc GROUP BY;
  *  2. the span merge — narrow (doc, pos) rows of MATCHING grams only,
  *     partitioned by doc.
  *
  * Texts never ride a shuffle: [[redactSpans]] joins the per-doc covered
  * POSITIONS (a small aggregated array) back to the corpus and rewrites
  * the token array with an index-aware `filter` — no explode, no
  * reassembly groupBy.
  *
  * Tokenization is the corpus-wide [[TextAnalysis.words]] (lowercased
  * whitespace split), shared with the dedup/decontamination family so
  * every operator agrees on positions; redacted text is therefore in
  * normalized token form, exactly like
  * [[Decontamination.redactContaminated]].
  *
  * Reference analog: none — Debezium has no corpus analytics; this
  * extends the engine's training-data family (SURVEY §8.2).
  */
object SpanDedup {

  /** (doc_id, pos, g): every full word-k-gram of every document with its
    * 1-based start token position; `g` is the gram's md5 (16-byte
    * equality key — positions shuffles never carry text). Documents
    * shorter than k words emit nothing (no partial grams — a span is
    * evidence of k consecutive shared tokens, and a short doc cannot
    * attest one).
    */
  /** The single source of truth for tokenization + gram hashing: every
    * full k-gram's md5 over the doc's `__ws` token array. Both
    * [[gramPositions]] and [[duplicateGrams]] build on this expression so
    * a change to tokenization or hashing cannot make span positions and
    * gram evidence disagree.
    */
  private def gramArray(k: Int): Column =
    transform(
      sequence(lit(1), size(col("__ws")) - (k - 1)),
      i => md5(concat_ws(" ", slice(col("__ws"), i, lit(k)))))

  /** (doc_id, __ws): tokenized docs long enough to hold one full k-gram. */
  private def withWords(
      docs: DataFrame, k: Int, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextAnalysis.words(col(textCol)).as("__ws"))
      .where(size(col("__ws")) >= k)

  def gramPositions(
      docs: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    withWords(docs, k, idCol, textCol)
      .select(col("doc_id"), posexplode(gramArray(k)).as(Seq("__p", "g")))
      .select(col("doc_id"), (col("__p") + 1).as("pos"), col("g"))

  /** Gram hashes appearing in ≥ `minDocs` DISTINCT documents, with their
    * exact document frequency: (g, df). Sketch-pruned, exact-verified —
    * see the object doc for why the result equals the exact GROUP BY.
    */
  def duplicateGrams(
      docs: DataFrame,
      k: Int = 3,
      minDocs: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text",
      sketchDepth: Int = 4,
      sketchWidth: Int = 4096): DataFrame = {
    // one row per (doc, distinct gram) — so both the sketch and the exact
    // count measure document frequency, not occurrence count; the
    // array_distinct stays MAP-side (inside the per-doc array), which is
    // why this does not reuse the exploded [[gramPositions]] rows
    val docGrams = withWords(docs, k, idCol, textCol)
      .select(col("doc_id"), explode(array_distinct(gramArray(k))).as("g"))
    val agg = udaf(new HeavyHitters.CmsAgg(sketchDepth, sketchWidth))
    val sk: Array[Long] = docGrams.select(agg(col("g")).as("sk"))
      .head().getSeq[Long](0).toArray
    docGrams
      .where(HeavyHitters.estimate(col("g"), sk, sketchDepth, sketchWidth) >= minDocs)
      .groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)
  }

  /** Maximal duplicated spans: (doc_id, span_start, span_end), 1-based
    * inclusive TOKEN positions, one row per maximal run of consecutive
    * duplicated-gram starts (a run of gram starts p..q covers tokens
    * p..q+k-1). `minTokens` drops spans shorter than that many tokens;
    * the effective floor is `max(minTokens, k)` — a span is at least one
    * full k-gram, so the default (0) means "no filter beyond the k-gram
    * resolution limit" at ANY k.
    *
    * Note the gram-evidence semantics: a span is included when each of
    * its k-windows appears in some other document — the standard
    * gram-granular relaxation of "the whole span appears elsewhere"
    * (different windows may be attested by different partners; with
    * k near the minimum interesting span this matches the suffix-array
    * answer in practice and is what a banded distributed plan can verify
    * without all-pairs alignment).
    */
  def duplicateSpans(
      docs: DataFrame,
      k: Int = 3,
      minDocs: Int = 2,
      minTokens: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text",
      sketchDepth: Int = 4,
      sketchWidth: Int = 4096): DataFrame = {
    val dup = duplicateGrams(docs, k, minDocs, idCol, textCol, sketchDepth, sketchWidth)
      .select(col("g"))
    val marked = gramPositions(docs, k, idCol, textCol)
      .join(dup, "g")
      .select(col("doc_id"), col("pos"))
    // consecutive positions share (pos - row_number) — the classic
    // gaps-and-islands grouping; one shuffle, partitioned by doc
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + (k - 1)).as("span_end"))
      .where(col("span_end") - col("span_start") + 1 >= math.max(minTokens, k))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** Redact the given spans from the corpus: every covered token is
    * dropped, the survivors re-joined with single spaces (normalized
    * token form — see object doc). Documents without spans pass through
    * with the same normalization so the output column is uniform; a
    * fully-covered document keeps an empty-text row (the
    * [[Decontamination.redactContaminated]] contract — row existence is
    * load-bearing for downstream joins).
    *
    * Plan: spans collapse to one small (doc, covered-positions array) row
    * per affected doc; the corpus LEFT-joins that and rewrites its token
    * array with an index-aware `filter` — the only corpus movement is the
    * join's co-partitioning exchange (and none at all when the covered
    * set is small enough to broadcast).
    */
  def redactSpans(
      docs: DataFrame,
      spans: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val covered = spans
      .groupBy(col("doc_id").as(idCol))
      .agg(array_sort(array_distinct(flatten(collect_list(
        sequence(col("span_start"), col("span_end")))))).as("__cov"))
    val ws = TextAnalysis.words(col(textCol))
    docs
      .join(covered, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__cov").isNull, array_join(ws, " "))
          .otherwise(array_join(
            filter(ws, (_, i) => !array_contains(col("__cov"), i + 1)),
            " ")))
      .drop("__cov")
  }
}
