package graft.tdp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents that look like a target
  * domain by importance weighting in a hashed n-gram feature space, then
  * Gumbel-top-k resampling.
  *
  *  1. hash every word into `buckets` feature buckets (md5-based, so the
  *     DuckDB oracle reproduces it byte-for-byte);
  *  2. fit two Laplace-smoothed unigram bucket models — target θt and raw
  *     θr — in ONE map-side-combined aggregate pass over the corpus
  *     (shuffle O(tasks × buckets); ≤ `buckets` rows reach the driver:
  *     the model is a bounded parameter, like IVF centroids);
  *  3. per-doc importance logw = Σ_words log(θt[b(w)] / θr[b(w)]),
  *     evaluated as a narrow codegen'd fold over literal per-bucket
  *     LOGITS — each quantized to an integer in 1e-6 nats, so the per-doc
  *     sum is exact integer arithmetic and cross-engine equality does not
  *     depend on float-summation order (the one ln() per BUCKET is the
  *     only transcendental, evaluated `buckets` times, not per word);
  *  4. Gumbel-top-k: key = logw + G where G = -ln(-ln u) and u is an
  *     md5-derived uniform — a pure function of (salt, id), so the sample
  *     is reproducible at any partitioning and recomputable by the
  *     oracle. Selection via orderBy+limit plans TakeOrderedAndProject
  *     (per-partition partial top-k, only k rows per partition reach the
  *     driver merge — never a global sort).
  *
  * Reference semantics (studied, not copied): the paper's §2 importance
  * estimator with hashed n-gram features and its Gumbel-top-k sampling
  * rule; unigram buckets here (the paper uses uni+bigrams — `words` can
  * be swapped for any gram column without changing the shapes).
  */
object Dsir {

  /** Feature-hash bucket in [0, buckets): first 8 md5 hex chars as an
    * integer, mod buckets. Lock-step with the SQL twin
    * (`CAST(concat('0x', substr(md5(g),1,8)) AS BIGINT) % buckets`).
    */
  def bucket(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))

  /** Whitespace unigrams of the lowercased text — the one shared
    * tokenization ([[TextAnalysis.words]]), so the DuckDB
    * `string_split_regex(lower(text), '\s+')` twin stays lock-step with
    * every oracle-checked operator at once.
    */
  def words(text: Column): Column = TextAnalysis.words(text)

  /** One corpus pass fitting BOTH bucket-count models: raw = every doc,
    * target = docs satisfying `targetPred`. Returns (targetCounts,
    * rawCounts), each of length `buckets`. The explode is narrow; the
    * groupBy partially aggregates map-side onto ≤ `buckets` keys, so the
    * shuffle is O(tasks × buckets) rows and the collect is the model.
    */
  def fitModels(
      docs: DataFrame,
      targetPred: Column,
      buckets: Int,
      textCol: String = "text"): (Array[Long], Array[Long]) = {
    val rows = docs
      .select(targetPred.as("t"), explode(words(col(textCol))).as("g"))
      .select(col("t"), bucket(col("g"), buckets).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("cr"), sum(when(col("t"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val cr = Array.fill(buckets)(0L)
    val ct = Array.fill(buckets)(0L)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      cr(b) = r.getLong(1)
      ct(b) = r.getLong(2)
    }
    (ct, cr)
  }

  /** Quantized per-bucket importance logits:
    * round(1e6 · ln( ((ct+1)/(Nt+B)) / ((cr+1)/(Nr+B)) )) — Laplace
    * smoothing, HALF_UP rounding away from zero (DuckDB `round`
    * semantics, NOT Math.round's floor(x+0.5), which disagrees on
    * negative halves). Integer logits make every downstream sum exact.
    */
  def logits(target: Array[Long], raw: Array[Long]): Array[Long] = {
    require(target.length == raw.length, "model arrays must align")
    val b = target.length
    val nt = target.sum.toDouble + b
    val nr = raw.sum.toDouble + b
    Array.tabulate(b) { i =>
      val ratio = ((target(i) + 1).toDouble / nt) / ((raw(i) + 1).toDouble / nr)
      java.math.BigDecimal.valueOf(1e6 * StrictMath.log(ratio))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
  }

  /** Per-doc importance: `(idCol, logw)` where logw is the exact integer
    * sum (1e-6 nats) of the literal bucket logits over the doc's words —
    * one narrow codegen'd projection, no shuffle, no join.
    */
  def importance(
      docs: DataFrame,
      targetPred: Column,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (ct, cr) = fitModels(docs, targetPred, buckets, textCol)
    val l = typedlit(logits(ct, cr).toSeq)
    docs.select(
      col(idCol),
      aggregate(
        transform(words(col(textCol)),
          w => element_at(l, (bucket(w, buckets) + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x).as("logw"))
  }

  /** Gumbel-top-k sampling key: logw + round(1e6 · -ln(-ln u)), with
    * u = (hex8(md5(salt‖id)) + 0.5) / 2³² — a deterministic uniform in
    * (0,1), so the sample is a pure function of (salt, id, logw).
    */
  def gumbelKey(id: Column, logw: Column, salt: String): Column = {
    val u = (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") + 0.5) / 4294967296.0
    logw + round(lit(1e6) * -log(-log(u))).cast("long")
  }

  /** Gumbel-top-k resample of `k` docs from an [[importance]]-scored
    * frame: equivalent to sampling without replacement with probability
    * ∝ exp(logw) (the paper's resampling step), but deterministic and
    * engine-portable. orderBy+limit plans TakeOrderedAndProject — each
    * partition forwards only its own top k.
    */
  def resample(
      scored: DataFrame,
      k: Int,
      salt: String,
      idCol: String = "doc_id"): DataFrame =
    scored
      .withColumn("skey", gumbelKey(col(idCol), col("logw"), salt))
      .orderBy(desc("skey"), col(idCol))
      .limit(k)
}
