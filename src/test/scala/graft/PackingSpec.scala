package graft

import org.apache.spark.sql.functions._
import graft.tdp.Packing

/** Sequence packing: contiguous offset-binning inside hash groups. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("doc_id", "tok")

  test("pack assignment equals the driver-side contiguous-binning oracle") {
    val packed = Packing.packSequences(docs, col("doc_id"), col("tok"), maxTokens = 10, numGroups = 4)
      .select(col("doc_id"), col("pack_group"), col("pack_seq"), col("tokens"), col("cum_tokens"))
      .as[(Long, Long, Long, Long, Long)].collect()
    // oracle: per group, sort by doc_id, running sum, seq = (cum-before)/max
    val byGroup = packed.groupBy(_._2)
    byGroup.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, seq, tok, cumGot) =>
        assert(seq === cum / 10, "seq = floor(offset/budget)")
        cum += tok
        assert(cumGot === cum, "running total")
      }
    }
    // total docs preserved, never split
    assert(packed.length === 200)
  }

  test("oversized documents get a sequence; later docs move past it") {
    val big = Seq((1L, 3L), (2L, 25L), (3L, 4L)).toDF("doc_id", "tok")
    val p = Packing.packSequences(big, col("doc_id"), col("tok"), maxTokens = 10, numGroups = 1)
      .select(col("doc_id"), col("pack_seq")).as[(Long, Long)].collect().toMap
    assert(p(1L) === 0L)
    assert(p(2L) === 0L) // starts at offset 3 → seq 0 (fill overflows, never splits)
    assert(p(3L) === 2L) // offset 28 → seq 2: the oversized doc pushed the cursor
  }

  test("packSummary reports fill; plan uses ONE exchange (group key only)") {
    val packed = Packing.packSequences(docs, col("doc_id"), col("tok"), maxTokens = 10, numGroups = 4)
    val sum = Packing.packSummary(packed, maxTokens = 10)
    val ratios = sum.select("fill_ratio").as[Double].collect()
    assert(ratios.forall(_ > 0.0))
    // most sequences fill close to budget (docs are small vs budget)
    assert(ratios.count(_ >= 0.8) >= ratios.length / 2)
    val plan = packed.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected exactly one exchange:\n$plan")
  }
}
