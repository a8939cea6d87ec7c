package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Gtid, GtidOps}

/** GTID-set interval algebra: parse/render canonicalization, containment,
  * subtract, union-as-CRDT-join (commutative/associative/idempotent — the
  * property that makes the typed Aggregator replay-safe), and the codegen'd
  * column predicates used by q103's restart fence.
  */
class GtidSpec extends SparkSpec {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val u1 = "36eca6cd-0000-0000-0000-000000000001"
  private val u2 = "36eca6cd-0000-0000-0000-000000000002"

  test("parse + render canonicalizes: coalesce adjacent/overlapping, sort servers") {
    // unsorted servers, overlapping ([1,3]+[2,5]) and adjacent ([7,8]+[9,9]) intervals
    val s = s"$u2:10-12,$u1:2-5:1-3:7-8:9"
    assert(GtidOps.render(GtidOps.parse(s)) === s"$u1:1-5:7-9,$u2:10-12")
    assert(GtidOps.render(GtidOps.parse("")) === "")
    assert(GtidOps.render(GtidOps.parse(null)) === "")
  }

  test("containsGtid / containedWithin match the reference contract") {
    val set = GtidOps.parse(s"$u1:1-5:8,$u2:3")
    assert(GtidOps.containsGtid(set, s"$u1:5"))
    assert(GtidOps.containsGtid(set, s"$u1:8"))
    assert(!GtidOps.containsGtid(set, s"$u1:6"))
    assert(!GtidOps.containsGtid(set, s"$u2:4"))
    // subset on one server, missing server, exceeding range
    assert(GtidOps.containedWithin(GtidOps.parse(s"$u1:2-4"), set))
    assert(!GtidOps.containedWithin(GtidOps.parse(s"$u1:4-6"), set))
    assert(!GtidOps.containedWithin(GtidOps.parse(s"$u2:3,$u1:9"), set))
    assert(GtidOps.containedWithin(GtidOps.parse(""), set))
  }

  test("subtract cuts islands exactly (reference GtidSet.subtract)") {
    val a = GtidOps.parse(s"$u1:1-10,$u2:5")
    val b = GtidOps.parse(s"$u1:3-4:7,$u2:5")
    assert(GtidOps.render(GtidOps.subtract(a, b)) === s"$u1:1-2:5-6:8-10")
    // a - a = empty; a - empty = a
    assert(GtidOps.render(GtidOps.subtract(a, a)) === "")
    assert(GtidOps.render(GtidOps.subtract(a, GtidOps.parse(""))) === GtidOps.render(a))
  }

  private val genSet: Gen[String] = for {
    nsrv <- Gen.choose(1, 3)
    ivs <- Gen.listOfN(nsrv, for {
      srv <- Gen.choose(1, 3)
      n <- Gen.choose(1, 4)
      points <- Gen.listOfN(n, Gen.choose(1L, 40L))
    } yield s"srv$srv:" + points.map(p => s"$p-${p + 2}").mkString(":"))
  } yield ivs.mkString(",")

  test("union is a semilattice join: commutative, associative, idempotent") {
    def j(a: String, b: String) =
      GtidOps.render(GtidOps.union(GtidOps.parse(a), GtidOps.parse(b)))
    check("semilattice", Prop.forAll(genSet, genSet, genSet) { (a, b, c) =>
      j(a, b) == j(b, a) &&
        j(j(a, b), c) == j(a, j(b, c)) &&
        j(a, a) == GtidOps.render(GtidOps.parse(a))
    })
  }

  test("subtract then union restores the superset (partition law)") {
    check("partition-law", Prop.forAll(genSet, genSet) { (a0, b0) =>
      val a = GtidOps.parse(a0); val b = GtidOps.parse(b0)
      val inter = GtidOps.subtract(a, GtidOps.subtract(a, b)) // a ∩ b
      val only = GtidOps.subtract(a, b)
      GtidOps.render(GtidOps.union(only, inter)) == GtidOps.render(a)
    })
  }

  test("codegen'd column predicates agree with the Scala kernel") {
    import spark.implicits._
    val rows = (1L to 60L).map(i => (s"srv${i % 3}:$i", i)).toDF("gtid", "i")
    val set = s"srv0:3-30,srv1:1-10:22-40,srv2:2-35"
    val kept = rows
      .where(!Gtid.gtid_in_set(col("gtid"), lit(set)))
      .as[(String, Long)].collect().map(_._2).toSet
    val expect = (1L to 60L).filterNot { i =>
      GtidOps.containsGtid(GtidOps.parse(set), s"srv${i % 3}:$i")
    }.toSet
    assert(kept === expect)

    val pair = Seq((s"srv0:5-6", set), (set, s"srv0:5-6")).toDF("a", "b")
    val got = pair.select(
      Gtid.gtid_set_contains(col("a"), col("b")).as("c"),
      Gtid.gtid_set_union(col("a"), col("b")).as("u"),
      Gtid.gtid_set_subtract(col("a"), col("b")).as("s")).collect()
    assert(got(0).getBoolean(0) && !got(1).getBoolean(0))
    assert(got(0).getString(1) === got(1).getString(1)) // union commutes in codegen too
  }

  test("parse memo stays correct when the set argument alternates per row") {
    import spark.implicits._
    // two different sets interleaved row-by-row: a stale single-entry memo
    // would answer with the WRONG set if the equality check were skipped
    val rows = (1L to 40L).map { i =>
      val set = if (i % 2 == 0) "srv0:1-10" else "srv0:20-30"
      (s"srv0:$i", set, i)
    }.toDF("gtid", "set", "i")
    val kept = rows.where(Gtid.gtid_in_set(col("gtid"), col("set")))
      .select("i").as[Long].collect().toSet
    val expect = (1L to 40L).filter { i =>
      if (i % 2 == 0) i >= 1 && i <= 10 else i >= 20 && i <= 30
    }.toSet
    assert(kept === expect)
  }

  test("GtidSetAgg accumulates the executed set regardless of grouping/order") {
    import spark.implicits._
    val agg = udaf(new Gtid.GtidSetAgg)
    val gtids = (1L to 50L).map(i => s"srv${if (i <= 25) 0 else 1}:$i")
      .toDF("g").repartition(7)
    val got = gtids.agg(agg(col("g"))).as[String].collect().head
    assert(got === "srv0:1-25,srv1:26-50")
  }
}
