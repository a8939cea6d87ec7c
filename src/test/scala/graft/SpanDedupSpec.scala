package graft

import graft.tdp.SpanDedup

/** Cross-document repeated-substring spans (Lee et al. 2022 at k-gram
  * granularity) — boundaries, doc-frequency semantics, CMS-prune equality,
  * redaction, and a brute-force property oracle.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate spans: shared run found with exact token boundaries; unique docs emit nothing") {
    val docs = Seq(
      (1L, "aa bb one two three four five six cc dd"),
      (2L, "one two three four five six zz yy xx ww"),
      (3L, "totally unrelated words nothing here matches at all ok fine"))
      .toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, k = 3, minDocs = 2, minTokens = 3)
      .as[(Long, Int, Int)].collect().toSet
    // doc 1: duplicated gram starts 3..6 → tokens 3..8; doc 2: starts 1..4 → tokens 1..6
    assert(spans === Set((1L, 3, 8), (2L, 1, 6)))
  }

  test("minDocs counts DISTINCT documents — a gram repeated within one doc is not cross-doc") {
    val docs = Seq(
      (1L, "x y z p q x y z"), // "x y z" twice, but only in doc 1
      (2L, "totally different content here"))
      .toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpans(docs, k = 3, minDocs = 2).count() === 0)
  }

  test("minTokens drops short spans") {
    val docs = Seq(
      (1L, "aa bb one two three cc"),
      (2L, "one two three zz yy ww"))
      .toDF("doc_id", "text")
    val at3 = SpanDedup.duplicateSpans(docs, k = 3, minDocs = 2, minTokens = 3)
      .as[(Long, Int, Int)].collect().toSet
    assert(at3 === Set((1L, 3, 5), (2L, 1, 3)))
    assert(SpanDedup.duplicateSpans(docs, k = 3, minDocs = 2, minTokens = 4).count() === 0)
  }

  test("CMS prune is exact-equivalent even at forced-collision sketch width") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until 10).map(_ => s"w${rnd.nextInt(15)}").mkString(" "))
    }.toDF("doc_id", "text")
    val wide = SpanDedup.duplicateSpans(docs, k = 3, sketchWidth = 4096)
      .as[(Long, Int, Int)].collect().toSet
    val tiny = SpanDedup.duplicateSpans(docs, k = 3, sketchWidth = 2)
      .as[(Long, Int, Int)].collect().toSet
    assert(tiny === wide, "CMS overcounts only — the exact pass must erase width effects")
    assert(wide.nonEmpty, "the random corpus should contain cross-doc grams")
  }

  test("redactSpans drops exactly the covered tokens; fully-covered docs keep an empty row") {
    val docs = Seq(
      (1L, "AA bb one two THREE four five six cc dd"), // mixed case → normalized output
      (2L, "one two three four five six"),             // fully covered
      (3L, "hello world untouched"))                   // no spans
      .toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, k = 3, minDocs = 2, minTokens = 3)
    val out = SpanDedup.redactSpans(docs, spans)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "aa bb cc dd", 2L -> "", 3L -> "hello world untouched"))
  }

  test("property: spans equal a brute-force gram-evidence oracle") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val corpus = (0 until 25).map { i =>
        (i.toLong, (0 until (6 + rnd.nextInt(9))).map(_ => s"t${rnd.nextInt(12)}").mkString(" "))
      }
      val k = 3; val minTokens = 4
      // brute force: df per gram by distinct docs; per doc, merge
      // consecutive duplicated gram starts; span = [start, end + k - 1]
      val grams = corpus.map { case (id, t) =>
        id -> t.split("\\s+").toSeq.sliding(k).filter(_.size == k).map(_.mkString(" ")).toVector
      }.toMap
      val df = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expected = grams.flatMap { case (id, gs) =>
        val dupPos = gs.zipWithIndex.collect { case (g, i) if df(g) >= 2 => i + 1 }
        val runs = dupPos.foldLeft(Vector.empty[Vector[Int]]) {
          case (acc, p) if acc.nonEmpty && acc.last.last == p - 1 => acc.init :+ (acc.last :+ p)
          case (acc, p) => acc :+ Vector(p)
        }
        runs.map(r => (id, r.head, r.last + k - 1)).filter(s => s._3 - s._2 + 1 >= minTokens)
      }.toSet
      val got = SpanDedup.duplicateSpans(
        corpus.toDF("doc_id", "text"), k = k, minDocs = 2, minTokens = minTokens)
        .as[(Long, Int, Int)].collect().toSet
      assert(got === expected, s"seed=$seed")
    }
  }
}
