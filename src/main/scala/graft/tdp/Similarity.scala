package graft.tdp

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a sign-random-
  * projection LSH bucketing as the scale path (per-bucket candidate
  * generation instead of the full cross product).
  *
  * Determinism: the random hyperplanes are ±1 weights derived from
  * md5("p_d") (no RNG), so Spark, a re-run, and the DuckDB oracle all
  * compute identical buckets; dot products fold left-to-right in double
  * precision in both engines, so even the float math is bit-identical.
  *
  * Scale: brute-force is a broadcast of the (small) query set against the
  * corpus — one narrow pass, no shuffle of the corpus. The LSH variant
  * shuffles only (bucket, id, vec) once; at 1000 executors each bucket's
  * candidates co-locate. An IVF refinement would replace the hash bucket
  * with a learned-centroid assignment — same join shape.
  */
object Similarity {

  /** Left-to-right double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // -------------------------------------------------------------- LSH bucket

  /** ±1 weight for hyperplane p, dimension d (0-based): +1 iff the first
    * hex digit of md5("p_d") is '8'..'f'. Shared contract with the SQL
    * oracle.
    */
  def planeWeight(p: Int, d: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes(StandardCharsets.UTF_8))
    if (((md(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
  }

  /** Bucket key: the sign pattern of `planes` deterministic ±1-weight
    * projections, as a bit-string ("101…"). Weights are inlined as array
    * literals (driver-computed, tiny) so the projection is pure codegen.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int = 64): Column =
    concat((0 until planes).map { p =>
      val w = typedlit((0 until dims).map(d => planeWeight(p, d)))
      val proj = aggregate(
        zip_with(vec, w, (x, wd) => x.cast("double") * wd),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, "1").otherwise("0")
    }: _*)

  // ----------------------------------------------------------- brute force

  /** Exact top-k cosine neighbors for each query vector. The query set is
    * broadcast (small by contract); ranking is per-query with a
    * deterministic tie-break (cos DESC, neighbor id ASC).
    *
    * Scale note on the rank filter: Catalyst rewrites
    * `row_number() ≤ k` into a WindowGroupLimit with a PARTIAL pass below
    * the exchange (SPARK-37099), so each corpus partition pre-selects its
    * own top-k BEFORE the shuffle — only |queries|×k rows per partition
    * cross the wire, never the full scored set. Asserted in TdpSpec.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qv"), col("nv")), 4).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** LSH-bucketed ANN: candidates = corpus vectors in the query's bucket;
    * exact cosine re-ranks within the bucket. Recall trades off with
    * bucket count (`planes`); a multi-probe variant would also search
    * neighboring buckets (hamming-1 keys) — same join, more keys.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      planes: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes).as("bkt"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      lshBucket(col(vecCol), planes).as("bkt"))
    val scored = c.join(broadcast(q), "bkt")
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qv"), col("nv")), 4).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Multi-probe key set: the exact bucket plus every hamming-1 variant
    * (one flipped plane bit). Probing neighbor buckets recovers the recall
    * a finer bucketing (more planes) gives up — the standard multi-probe
    * LSH trade: planes↑ shrinks candidate lists, probes↑ restores recall,
    * candidate count ≈ (planes+1)/2^planes of the corpus per query.
    */
  def multiProbeKeys(vec: Column, planes: Int): Column = {
    val b = lshBucket(vec, planes)
    array((b +: (1 to planes).map { i =>
      concat(
        substring(b, 1, i - 1),
        when(substring(b, i, 1) === "1", "0").otherwise("1"),
        substring(b, i + 1, planes - i))
    }): _*)
  }

  /** Multi-probe LSH ANN: the corpus keeps its single exact bucket (one
    * narrow pass, no shuffle); each query fans out to its probe set and
    * joins on the bucket key. Same scale shape as [[lshTopK]] — the
    * broadcast side just carries planes+1 rows per query.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      planes: Int = 6,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      explode(multiProbeKeys(col(vecCol), planes)).as("bkt"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      lshBucket(col(vecCol), planes).as("bkt"))
    val scored = c.join(broadcast(q), "bkt")
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qv"), col("nv")), 4).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  // -------------------------------------------------------------------- IVF

  /** Coarse-quantizer centroids: the `nlist` corpus vectors with the
    * smallest ids (deterministic seeding; a k-means refinement would
    * iterate assign→mean over the same join shape). Centroids are MODEL
    * PARAMETERS — bounded by nlist, collected once, and inlined as array
    * literals so the per-row assignment is pure codegen with no join (the
    * same treatment as [[lshBucket]]'s hyperplanes, except learned from
    * data instead of hashed).
    */
  def ivfCentroids(
      corpus: DataFrame,
      nlist: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Long, Seq[Double])] =
    corpus
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .orderBy(col("id")).limit(nlist)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Partial-mean state for [[VecMeanAgg]]. */
  final case class VecSum(sum: Seq[Double], n: Long)

  /** Elementwise vector-mean aggregation function — the centroid-update
    * step of a distributed Lloyd's iteration as a Spark `Aggregator`:
    * per-task partial sums combine map-side, so the shuffle moves one
    * (dims, count) pair per (task × list), never the vectors. The
    * posexplode-and-regroup alternative would shuffle corpus × dims rows.
    */
  final class VecMeanAgg extends org.apache.spark.sql.expressions.Aggregator[Seq[Double], VecSum, Seq[Double]] {
    override def zero: VecSum = VecSum(Nil, 0L)
    // zip would silently truncate to the shorter vector — a ragged
    // embedding corpus must fail loudly, not corrupt the centroid means
    // (round-2 ADVICE).
    override def reduce(b: VecSum, v: Seq[Double]): VecSum =
      if (b.n == 0L) VecSum(v, 1L)
      else {
        require(b.sum.size == v.size,
          s"ragged embedding: dim ${v.size} vs accumulator dim ${b.sum.size}")
        VecSum(b.sum.zip(v).map { case (a, x) => a + x }, b.n + 1)
      }
    override def merge(a: VecSum, b: VecSum): VecSum =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sum.size == b.sum.size,
          s"ragged embedding: partial dims ${a.sum.size} vs ${b.sum.size}")
        VecSum(a.sum.zip(b.sum).map { case (x, y) => x + y }, a.n + b.n)
      }
    override def finish(r: VecSum): Seq[Double] = r.sum.map(_ / r.n)
    override def bufferEncoder: org.apache.spark.sql.Encoder[VecSum] =
      org.apache.spark.sql.Encoders.product[VecSum]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Lloyd's-refined IVF centroids: start from the deterministic seeds
    * ([[ivfCentroids]]) and iterate assign → mean. Each iteration is ONE
    * map-side-combined aggregate over the corpus (the assignment is the
    * same literal-centroid argmax the query path uses — no join, no corpus
    * shuffle beyond nlist×tasks partial rows). Means are rounded to 1e-9 so
    * the learned model is stable against float-summation order; an empty
    * list keeps its previous centroid (standard k-means practice).
    */
  def ivfCentroidsKmeans(
      corpus: DataFrame,
      nlist: Int,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[(Long, Seq[Double])] = {
    var cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    val vecs = corpus.select(transform(col(vecCol), x => x.cast("double")).as("v"))
    val mean = udaf(new VecMeanAgg)
    (0 until iters).foreach { _ =>
      val means = vecs
        .select(element_at(ivfProbes(col("v"), cents, 1), 1).as("list_id"), col("v"))
        .groupBy("list_id").agg(mean(col("v")).as("m"))
        .collect()
        .map(r => r.getAs[Long]("list_id") -> r.getSeq[Double](r.fieldIndex("m")))
        .toMap
      cents = cents.map { case (cid, old) =>
        cid -> means.get(cid).map(_.map(x => math.rint(x * 1e9) / 1e9)).getOrElse(old)
      }
    }
    cents
  }

  /** All centroids scored against `vec`, as an array of
    * `struct(cos, cid)` sorted nearest-first with a deterministic cid
    * tie-break — the single evaluation both the probe list and an
    * assignment-with-distance consumer (e.g. SemDeDup's ccos) share, so
    * neither pays the nlist×dim cosine work twice.
    */
  def ivfScoredSorted(vec: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    val scored = array(cents.map { case (cid, cv) =>
      struct(cosine(vec, typedlit(cv)).as("cos"), lit(cid).as("cid"))
    }: _*)
    array_sort(scored, (l, r) =>
      when(l.getField("cos") > r.getField("cos"), -1)
        .when(l.getField("cos") < r.getField("cos"), 1)
        .when(l.getField("cid") < r.getField("cid"), -1)
        .when(l.getField("cid") > r.getField("cid"), 1)
        .otherwise(0))
  }

  /** The `nprobe` centroid ids nearest (by cosine) to `vec`, nearest
    * first; deterministic tie-break on centroid id. `nprobe = 1` is the
    * inverted-list assignment.
    */
  def ivfProbes(vec: Column, cents: Seq[(Long, Seq[Double])], nprobe: Int): Column =
    slice(transform(ivfScoredSorted(vec, cents), x => x.getField("cid")), 1, nprobe)

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their nearest
    * centroid's inverted list (a narrow, codegen'd map — no shuffle);
    * each query probes its `nprobe` nearest lists and exact cosine
    * re-ranks only those candidates. Expected work per query is
    * nprobe/nlist of the corpus vs the brute-force full scan.
    *
    * Scale: the corpus is scanned once with a literal-centroid argmax and
    * joined to the broadcast probe set on `list_id` — no corpus shuffle;
    * the `row_number ≤ k` rank filter is a WindowGroupLimit with a partial
    * per-partition pass (SPARK-37099), so only |queries|×k rows per
    * partition reach the exchange. Recall grows with nprobe (multi-probe),
    * nlist with corpus size (≈√N lists keeps lists and probe cost balanced).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 8,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      kmeansIters: Int = 0): DataFrame = {
    val cents =
      if (kmeansIters > 0) ivfCentroidsKmeans(corpus, nlist, kmeansIters, idCol, vecCol)
      else ivfCentroids(corpus, nlist, idCol, vecCol)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      element_at(ivfProbes(col(vecCol), cents, 1), 1).as("list_id"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      explode(ivfProbes(col(vecCol), cents, nprobe)).as("list_id"))
    val scored = c.join(broadcast(q), "list_id")
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(cosine(col("qv"), col("nv")), 4).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }
}
