package graft.tdp

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-wide frequent-term mining (heavy hitters) for a training-data
  * pipeline: find every term/n-gram whose corpus frequency is ≥ a
  * threshold — the primitive behind boilerplate detection, stopword
  * induction, and contamination scans.
  *
  * Scale shape (the whole point): the naive `explode → groupBy.count`
  * shuffles one row per DISTINCT term per task — at 100 TB the long tail
  * of near-unique terms dominates that exchange. Instead, two scan-speed
  * passes:
  *
  *  1. SKETCH: one map-side-combined count-min sketch over the exploded
  *     terms (a typed [[Aggregator]]; each task contributes one fixed
  *     depth×width array, so the exchange is O(tasks × 128 KB) no matter
  *     the corpus). The merged sketch is a bounded model parameter on
  *     the driver, like the IVF centroids.
  *  2. VERIFY: re-scan, keep only terms whose sketch estimate clears the
  *     threshold (CMS OVERCOUNTS, never undercounts — no false
  *     negatives), and exact-count just those candidates. The tail never
  *     reaches the shuffle; candidates are ≤ totalOccurrences/minCount
  *     by pigeonhole, so the exchange is bounded by the threshold, not
  *     the vocabulary.
  *
  * The sketch estimate is evaluated DECLARATIVELY (element_at lookups
  * into literal arrays + xxhash64 — whole-stage codegen, no UDF), with
  * JVM/Catalyst hash parity via [[XxHash64Function]] (both sides hash
  * `term#row` with Spark's seed-42 xxhash64). False positives are
  * removed by the exact pass, so the final result EQUALS the exact
  * `GROUP BY HAVING` — which is what the DuckDB oracle (q75) recomputes.
  *
  * Reference analog: Debezium has no corpus analytics; this extends the
  * engine for LLM-pipeline use alongside the dedup/ANN family.
  */
object HeavyHitters {

  /** Word n-grams of a token array (space-joined), for n-gram mining:
    * `ngrams(words, 2)` of [a,b,c] = ["a b", "b c"]. Pure Catalyst
    * (`transform` over a `sequence`), no explode until the caller asks.
    */
  def ngrams(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))

  /** Count-min sketch as a typed Aggregator over term occurrences.
    * Buffer = one depth×width Long array, mutated in place (partials
    * serialize only at task boundaries). Row r hashes `term#r` with
    * Spark's xxhash64 so the declarative estimate can reproduce the
    * exact cell indices.
    */
  final class CmsAgg(depth: Int, width: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], term: String): Array[Long] = {
      var r = 0
      while (r < depth) {
        b(r * width + cell(term, r, width)) += 1L
        r += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The sketch cell for (term, row): Spark's seed-42 xxhash64 of
    * `term#row`, exactly what [[estimate]] computes in Catalyst.
    */
  private def cell(term: String, row: Int, width: Int): Int = {
    val h = XxHash64Function.hash(UTF8String.fromString(term + "#" + row), StringType, 42L)
    (((h % width) + width) % width).toInt
  }

  /** Declarative CMS estimate of a term column against a driver-held
    * sketch: min over rows of the row's cell count. Each sketch row is a
    * literal array (data in the plan, not code) probed by `element_at`.
    */
  def estimate(term: Column, sketch: Array[Long], depth: Int, width: Int): Column =
    least((0 until depth).map { r =>
      val row = typedlit(sketch.slice(r * width, (r + 1) * width).toSeq)
      element_at(row, (pmod(xxhash64(concat(term, lit("#" + r))), lit(width.toLong)) + 1L).cast("int"))
    }: _*)

  /** All terms with corpus frequency ≥ `minCount`, with their EXACT
    * counts — sketch-pruned, exact-verified (see object doc). `terms` is
    * an array column over `docs` (e.g. `TextAnalysis.words(col("text"))`
    * or [[ngrams]] of it); empty strings are dropped.
    */
  def frequentTerms(
      docs: DataFrame,
      terms: Column,
      minCount: Long,
      depth: Int = 4,
      width: Int = 4096): DataFrame = {
    val toks = docs.select(explode(terms).as("term")).where(col("term") =!= "")
    val agg = udaf(new CmsAgg(depth, width))
    val sk: Array[Long] = toks.select(agg(col("term")).as("sk"))
      .head().getSeq[Long](0).toArray
    toks
      .where(estimate(col("term"), sk, depth, width) >= minCount)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
