package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.sources.Snapshot
import graft.tdp.{Dedup, Sampling}

/** Property-based specs for the round-3 operators (raw ScalaCheck driven
  * from ScalaTest, like ReplayPropertySpec):
  *
  *  1. range-chunk predicates form a DISJOINT COVER of any key multiset
  *     (dupes, skew, unicode, any chunk count);
  *  2. split assignment is exhaustive-and-disjoint for any fraction list
  *     summing to 1, and sampling is monotone in the rate (a higher-rate
  *     sample is a superset of a lower-rate one with the same salt);
  *  3. duplicate clusters = the exact connected components of any pair
  *     graph (driver-side union-find as the oracle).
  */
class TdpPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("rangeChunkPredicates: disjoint cover over arbitrary key multisets") {
    val genKeys = for {
      n <- Gen.choose(1, 400)
      skewed <- Gen.listOfN(n, Gen.frequency(
        (3, Gen.const("hot")), // heavy duplicate key
        (5, Gen.alphaNumStr.map(_.take(8))),
        (1, Gen.const("zzü")), // non-ascii
        (1, Gen.const("a�")), // U+FFFD: sorts HIGH in UTF-16, low-ish in UTF-8
        (1, Gen.const("a😀")), // supplementary char: UTF-16 surrogates sort LOW, UTF-8 sorts HIGH
        (1, Gen.const(null: String)) // null keys must land in exactly one chunk
      ))
      paths <- Gen.listOfN(n, Gen.choose(0, 50))
    } yield skewed.zip(paths).map { case (r, p) => (r, s"f$p") }
    val prop = Prop.forAll(genKeys, Gen.choose(1, 7)) { (ks, chunks) =>
      val df = ks.toDF("repo", "path")
      val preds = Snapshot.rangeChunkPredicates(df, chunks, Seq("repo", "path"), seed = 7L)
      val counts = preds.map(p => df.where(p).count())
      val disjoint = preds.indices.forall { i =>
        (i + 1 until preds.size).forall(j => df.where(preds(i) && preds(j)).count() == 0L)
      }
      counts.sum == ks.size.toLong && disjoint
    }
    check("range chunks", prop)
  }

  test("sampling: splits exhaustive+disjoint for any fractions; rate-monotone samples") {
    val genFracs = for {
      k <- Gen.choose(1, 4)
      ws <- Gen.listOfN(k, Gen.choose(1, 10))
    } yield {
      val total = ws.sum.toDouble
      ws.zipWithIndex.map { case (w, i) => (s"s$i", w / total) }
    }
    val ids = spark.range(0, 3000).select(col("id")).cache()
    val prop = Prop.forAll(genFracs) { fracs =>
      val assigned = Sampling.assignSplits(ids, col("id"), fracs, salt = "p")
      val counts = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
      // exhaustive up to the 2^-32 sliver at the last cut; names disjoint
      // by construction (one split column)
      counts.keySet.subsetOf(fracs.map(_._1).toSet + null) &&
        counts.filterKeys(_ != null).values.sum >= 3000L - 1
    }
    check("splits", prop)
    val rMono = Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val sLo = Sampling.hashSample(ids, col("id"), lo, "m").as[Long].collect().toSet
      val sHi = Sampling.hashSample(ids, col("id"), hi, "m").as[Long].collect().toSet
      sLo.subsetOf(sHi)
    }
    check("rate monotone", rMono)
    // rate 1.0 keeps EVERY row (strict-< against a clamped "ffffffff"
    // would drop hash=ffffffff rows), and fractions summing to exactly
    // 1.0 leave no row unassigned
    assert(Sampling.hashSample(ids, col("id"), 1.0, "m").count() === 3000L)
    val full = Sampling.assignSplits(ids, col("id"),
      Seq("a" -> 0.5, "b" -> 0.5), salt = "full")
    assert(full.where(col("split").isNull).count() === 0L)
  }

  test("duplicateClusters equals a driver-side union-find on any pair graph") {
    val genPairs = for {
      n <- Gen.choose(1, 45)
      as <- Gen.listOfN(n, Gen.choose(0L, 30L))
      bs <- Gen.listOfN(n, Gen.choose(0L, 30L))
    } yield as.zip(bs).collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct
    val prop = Prop.forAll(genPairs) { pairs =>
      pairs.isEmpty || {
        // generous round cap: a random graph can induce a long path, and
        // min-label propagation needs O(diameter) rounds
        val clusters = Dedup.duplicateClusters(pairs.toDF("a", "b"), maxIters = 50)
          .as[(Long, Long)].collect().toMap
        // oracle: union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val oracle = parent.keys.toSeq.map(v => v -> find(v)).toMap
        clusters == oracle
      }
    }
    check("connected components", prop)
  }

  test("duplicateClusters fails loudly when maxIters < component diameter") {
    val chain = (0L until 10L).sliding(2).map(s => (s.head, s.last)).toSeq
    intercept[IllegalStateException](
      Dedup.duplicateClusters(chain.toDF("a", "b"), maxIters = 2).collect())
  }
}
