package graft.tdp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over the
  * `documents` table: exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Design for 100 TB:
  *  - exact dedup is one hash-shuffle on a 64-hex digest, never on the
  *    content itself (shuffle bytes = O(docs × 64B), not O(corpus));
  *  - MinHash/LSH turns the quadratic all-pairs problem into
  *    O(bands) self-joins on short band keys — the only shuffles are on
  *    those keys; candidate verification touches only colliding pairs;
  *  - SimHash groups by a 16-bit fingerprint (tiny shuffle key);
  *  - n-gram Jaccard is gated behind a cheap blocking key so the self-join
  *    never goes quadratic;
  *  - all hash primitives are md5/sha2 strings so a DuckDB oracle computes
  *    byte-identical values.
  */
object Dedup {

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup: group by sha256(text), keep the lowest doc_id as the
    * canonical copy. One shuffle on the digest; content never shuffles.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("__sha")).orderBy(col(idCol))
    docs.withColumn("__sha", sha2(col(textCol), 256))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed("__sha", "content_sha")
  }

  /** Exact-duplicate groups: digest → member count + canonical id (for
    * reporting / CCNet-style duplicate statistics).
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("canonical_id"))

  // -------------------------------------------------------------- shingling

  /** Word k-shingles of the lowercased text. Clamping slice semantics match
    * DuckDB's `words[i:i+k-1]` (both return a short tail shingle / the
    * whole text when there are fewer than k words).
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val ws = TextAnalysis.words(text)
    transform(
      sequence(lit(1), greatest(size(ws) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(ws, i, lit(k))))
  }

  // ---------------------------------------------------------------- MinHash

  /** MinHash signature: H independent permutations simulated by
    * lexicographic-min of md5(h || '|' || shingle) — the classic
    * min-wise-independent-hash estimator (Broder '97), string-valued so
    * Spark and DuckDB compare identically.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleK: Int = 3): Column = {
    val sh = array_distinct(shingles(text, shingleK))
    array((0 until numHashes).map { h =>
      array_min(transform(sh, s => md5(concat(lit(s"$h|"), s))))
    }: _*)
  }

  /** LSH banding + candidate verification.
    *
    * Signature of H = bands×rowsPerBand minhashes; docs agreeing on ALL
    * minhashes of any band become candidate pairs (one self-join per band
    * on the md5 of the band slice — a short uniform key, so the join is a
    * well-distributed hash join, broadcastable when one side is small).
    * Candidates are verified by the signature-agreement fraction (the
    * unbiased Jaccard estimate) against `threshold`.
    *
    * Returns (a, b, est_jaccard) with a < b, distinct.
    */
  def minhashLsh(
      docs: DataFrame,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val h = bands * rowsPerBand
    // Two-step projection: `__sh` becomes a real column so the H hash
    // lanes share ONE shingling pass (higher-order functions are not
    // codegen-CSE'd — inlining the shingle subtree into every lane costs
    // H× the shingling work; CollapseProject keeps the split because the
    // reference is non-cheap and multiply-used). Persist: the self-join
    // below otherwise recomputes the signatures once PER JOIN SIDE.
    val withSh = docs.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol))).as("__sh"))
    val sigs = withSh
      .select(col("id"), array((0 until h).map { hh =>
        array_min(transform(col("__sh"), s => md5(concat(lit(s"$hh|"), s))))
      }: _*).as("sig"))
      .persist()
    // band key = md5 of the band's joined minhashes
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        md5(concat_ws("|", (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r)): _*))
      }: _*)).as(Seq("band", "bkey")))
    val l = banded.select(col("band"), col("bkey"), col("id").as("a"), col("sig").as("siga"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("b"), col("sig").as("sigb"))
    val pairs = l.join(r, Seq("band", "bkey")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("siga"), col("sigb")).dropDuplicates("a", "b")
    val agree = size(filter(
      zip_with(col("siga"), col("sigb"), (x, y) => x === y),
      x => x.cast("boolean")))
    pairs
      .select(col("a"), col("b"), round(agree.cast("double") / h, 4).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- SimHash

  /** 16-bit SimHash fingerprint as a bit-string: bit j is the sign of the
    * sum over words of ±1 — +1 when the j-th hex digit of md5(word) is in
    * the top half ('8'..'f'). Charikar's simhash with md5-derived
    * projections; identical in DuckDB via substr(md5(w), j+1, 1) >= '8'.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    val hs = transform(TextAnalysis.words(text), w => md5(w))
    concat((0 until bits).map { j =>
      val s = aggregate(hs, lit(0),
        (acc, hcol) => acc + when(hcol.substr(j + 1, 1) >= "8", 1).otherwise(-1))
      when(s > 0, "1").otherwise("0")
    }: _*)
  }

  /** Near-dup pairs by identical simhash (hamming distance 0 grouping —
    * the banding trick over simhash segments generalizes this; identical
    * fingerprints catch the heavy exact/near-exact tail).
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val f = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
    val l = f.select(col("fp"), col("id").as("a"))
    val r = f.select(col("fp"), col("id").as("b"))
    l.join(r, "fp").where(col("a") < col("b")).select(col("a"), col("b"), col("fp"))
  }

  // --------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard similarity over candidate pairs produced by a
    * cheap blocking key (docs sharing a text prefix — at corpus scale the
    * block key would be an LSH band; the verify step is identical).
    * |A∩B| and |A∪B| are integer set sizes → exact across engines.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double = 0.6,
      shingleK: Int = 3,
      blockPrefix: Int = 24,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(
      col(idCol).as("id"),
      substring(col(textCol), 1, blockPrefix).as("blk"),
      array_distinct(shingles(col(textCol), shingleK)).as("sh"))
      .persist() // shingle sets are recomputed per self-join side otherwise
    val l = base.select(col("blk"), col("id").as("a"), col("sh").as("sha_"))
    val r = base.select(col("blk"), col("id").as("b"), col("sh").as("shb_"))
    l.join(r, "blk").where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(
          size(array_intersect(col("sha_"), col("shb_"))).cast("double") /
            size(array_union(col("sha_"), col("shb_"))).cast("double"), 4)
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ------------------------------------------------- embedding cosine dedup

  /** Near-duplicate pairs by embedding cosine similarity ≥ threshold,
    * blocked by an LSH bucket (sign-random-projection, [[Similarity.lshBucket]])
    * so the self-join is per-bucket, not quadratic. Exact cosine verifies
    * each candidate pair.
    */
  def embeddingCosinePairs(
      embs: DataFrame,
      threshold: Double = 0.95,
      planes: Int = 6,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = embs.select(
      col(idCol).as("id"),
      col(vecCol).as("v"),
      Similarity.lshBucket(col(vecCol), planes).as("bkt"))
      .persist() // bucket projections are recomputed per self-join side otherwise
    val l = base.select(col("bkt"), col("id").as("a"), col("v").as("va"))
    val r = base.select(col("bkt"), col("id").as("b"), col("v").as("vb"))
    l.join(r, "bkt").where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Similarity.cosine(col("va"), col("vb")), 4).as("cos"))
      .where(col("cos") >= threshold)
      .dropDuplicates("a", "b")
  }
}
