package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Crdt
import graft.operators.Crdt.PNCount

/** CRDT counter laws + Spark agreement (reference:
  * debezium-connector-common/src/main/java/io/debezium/crdt/PNCounter.java,
  * DeltaCounter.java — merge must converge regardless of order).
  */
class CrdtSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val genCount: Gen[PNCount] = for {
    i <- Gen.chooseNum(0L, 1000000L)
    d <- Gen.chooseNum(0L, 1000000L)
  } yield PNCount(i, d)

  test("PNCount.merge is commutative, associative, with zero identity") {
    check("merge-laws", Prop.forAll(genCount, genCount, genCount) { (a, b, c) =>
      a.merge(b) == b.merge(a) &&
        a.merge(b).merge(c) == a.merge(b.merge(c)) &&
        a.merge(PNCount.zero) == a &&
        a.merge(b).value == a.value + b.value
    })
  }

  test("Aggregator replica fold converges independent of partitioning and order") {
    val gen = for {
      deltas <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      parts <- Gen.chooseNum(1, 7)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (deltas, parts, seed)
    check("replica-convergence", Prop.forAll(gen) { case (deltas, parts, seed) =>
      val agg = new Crdt.PNCounterAgg
      val expected = PNCount(deltas.filter(_ > 0).sum, -deltas.filter(_ < 0).sum)
      // Any grouping of the deltas into replicas, merged in any order,
      // yields the same count — the CRDT convergence property.
      val replicas = deltas.grouped(math.max(math.max(deltas.size / parts, 1), 1))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = new scala.util.Random(seed).shuffle(replicas)
        .foldLeft(agg.zero)(agg.merge)
      merged == expected
    })
  }

  test("typed udaf agrees with the declarative pnCounts on a keyed log") {
    val df = Seq(
      ("a", 1L), ("a", -1L), ("a", 1L), ("a", 1L), ("a", 0L),
      ("b", -1L), ("b", -1L), ("b", 1L)).toDF("k", "delta")
      .repartition(4)
    val pnUdaf = udaf(new Crdt.PNCounterAgg)
    val typed = df.groupBy($"k").agg(pnUdaf($"delta").as("pn"))
      .select($"k", $"pn.increments", $"pn.decrements",
        ($"pn.increments" - $"pn.decrements").as("value"))
    val decl = Crdt.pnCounts(df, Seq("k"), col("delta"))
    assert(typed.except(decl).isEmpty && decl.except(typed).isEmpty)
    val a = decl.where($"k" === "a").as[(String, Long, Long, Long)].head()
    assert(a === (("a", 3L, 1L, 2L)))
  }

  test("deltaCounts: per-interval changes sum to the running PN totals") {
    val df = Seq(
      ("a", 0L, 1L), ("a", 0L, 1L), ("a", 1L, -1L), ("a", 2L, 1L),
      ("b", 0L, -1L), ("b", 2L, 1L)).toDF("k", "epoch", "delta")
    val out = Crdt.deltaCounts(df, Seq("k"), col("delta"), col("epoch"))
      .orderBy($"k", $"interval")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(
      ("a", 0L, 2L, 0L, 2L, 2L, 0L, 2L),
      ("a", 1L, 0L, 1L, -1L, 2L, 1L, 1L),
      ("a", 2L, 1L, 0L, 1L, 3L, 1L, 2L),
      ("b", 0L, 0L, 1L, -1L, 0L, 1L, -1L),
      ("b", 2L, 1L, 0L, 1L, 1L, 1L, 0L)))
    // Final interval's running value equals the plain PN count.
    val pn = Crdt.pnCounts(df, Seq("k"), col("delta"))
      .select($"k", $"value").as[(String, Long)].collect().toMap
    val last = out.groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2)._8 }
    assert(last === pn)
  }

  test("opDelta maps CDC ops to live-row deltas") {
    val df = Seq("c", "r", "u", "d", "t", "m").toDF("op")
      .withColumn("delta", Crdt.opDelta())
    val m = df.as[(String, Long)].collect().toMap
    assert(m === Map("c" -> 1L, "r" -> 1L, "u" -> 0L, "d" -> -1L, "t" -> 0L, "m" -> 0L))
  }
}
