package graft

import org.apache.spark.sql.functions._
import graft.tdp.{HeavyHitters, TextAnalysis}

/** Heavy hitters: count-min sketch prune → exact verify. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat the cat",
    "the dog sat on the log",
    "a cat and a dog and a bird",
    "the bird sat on the cat"
  ).toDF("text")

  test("CMS estimate never undercounts (overestimate-only invariant)") {
    val toks = docs.select(explode(TextAnalysis.words(col("text"))).as("term"))
    val exact = toks.groupBy("term").count().as[(String, Long)].collect().toMap
    // deliberately tiny width → forced collisions → still no undercount
    for (width <- Seq(8, 64)) {
      val agg = udaf(new HeavyHitters.CmsAgg(3, width))
      val sk = toks.select(agg(col("term"))).head().getSeq[Long](0).toArray
      val est = toks.distinct()
        .select(col("term"), HeavyHitters.estimate(col("term"), sk, 3, width).as("e"))
        .as[(String, Long)].collect()
      est.foreach { case (t, e) =>
        assert(e >= exact(t), s"width=$width term=$t est=$e exact=${exact(t)}")
      }
    }
  }

  test("frequentTerms equals the exact GROUP BY HAVING at any sketch width") {
    val toks = docs.select(explode(TextAnalysis.words(col("text"))).as("term"))
    for (minCount <- Seq(2L, 3L, 5L); width <- Seq(8, 4096)) {
      val got = HeavyHitters.frequentTerms(docs, TextAnalysis.words(col("text")),
        minCount, depth = 3, width = width)
        .as[(String, Long)].collect().toSet
      val want = toks.groupBy("term").count().where(col("count") >= minCount)
        .as[(String, Long)].collect().toSet
      assert(got === want, s"minCount=$minCount width=$width")
    }
  }

  test("ngrams: space-joined sliding windows; shorter-than-n arrays give none") {
    val out = Seq("a b c d", "x", "").toDF("text")
      .select(HeavyHitters.ngrams(TextAnalysis.words(col("text")), 2).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b", "b c", "c d"))
    assert(out(1) === Nil)
    // frequent bigrams end-to-end
    val bi = HeavyHitters.frequentTerms(docs,
      HeavyHitters.ngrams(TextAnalysis.words(col("text")), 2), minCount = 3L)
      .as[(String, Long)].collect().toMap
    assert(bi("sat on") === 3L)
    assert(bi.contains("the cat"))
  }
}
