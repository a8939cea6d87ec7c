package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.TxnBuffer
import graft.sources.TxnLog

/** Oracle-connector buffered-transaction semantics: LIFO partial-undo
  * cancellation, commit emission / rollback discard, retention + threshold
  * abandonment, LOB fragment merge, and the plan shape (windows + one
  * join keyed by txn — no driver-side cache, bounded exchanges).
  */
class TxnBufferSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Long, String, String, Boolean, String)*): DataFrame =
    rows.toDF("txn_id", "scn", "op", "row_id", "rollback_flag", "content")

  private def dec(rows: (String, String, Long)*): DataFrame =
    rows.toDF("txn_id", "kind", "decision_scn")

  test("undo cancels the LATEST live event of its row id (LIFO), not the first") {
    // push e1, push e2, undo (cancels e2), push e3, undo, undo (cancels e3 then e1)
    val a = ev(
      ("t1", 1L, "c", "r1", false, "e1"),
      ("t1", 2L, "u", "r1", false, "e2"),
      ("t1", 3L, "u", "r1", true, null),
      ("t1", 4L, "u", "r1", false, "e3"),
      // sibling row untouched by r1's undos
      ("t1", 5L, "c", "r2", false, "x1"))
    val got = TxnBuffer.undoFiltered(a).select("content").as[String].collect().toSet
    assert(got === Set("e1", "e3", "x1"))

    val b = ev(
      ("t1", 1L, "c", "r1", false, "e1"),
      ("t1", 2L, "u", "r1", false, "e2"),
      ("t1", 3L, "u", "r1", true, null),
      ("t1", 4L, "u", "r1", false, "e3"),
      ("t1", 5L, "u", "r1", true, null),
      ("t1", 6L, "u", "r1", true, null))
    assert(TxnBuffer.undoFiltered(b).count() === 0)
  }

  test("unmatched undos are dropped without cancelling anything") {
    val a = ev(
      ("t1", 1L, "u", "r1", true, null), // arrives before any event
      ("t1", 2L, "c", "r1", false, "e1"))
    val got = TxnBuffer.undoFiltered(a).select("content").as[String].collect().toSet
    assert(got === Set("e1"))
  }

  test("property: declarative undo filter == stack simulation") {
    val genSeq = Gen.listOfN(14, Gen.oneOf(true, false, false, false))
    val prop = Prop.forAll(genSeq) { flags =>
      val rows = flags.zipWithIndex.map { case (isUndo, i) =>
        ("t1", (i + 1).toLong, "u", "r1", isUndo, if (isUndo) null else s"e$i")
      }
      // the reference's cache behavior: undo pops the latest live event
      val expect = rows.foldLeft(List.empty[String]) {
        case (stack, (_, _, _, _, true, _))  => if (stack.isEmpty) stack else stack.tail
        case (stack, (_, _, _, _, false, c)) => c :: stack
      }.toSet
      val got = TxnBuffer.undoFiltered(ev(rows: _*))
        .select("content").as[String].collect().toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("commitOrdered: rollback and undecided transactions emit nothing; emit_seq is dense in scn order") {
    val a = ev(
      ("t1", 3L, "c", "r1", false, "a"),
      ("t1", 1L, "c", "r2", false, "b"),
      ("t2", 2L, "c", "r1", false, "x"),
      ("t3", 4L, "c", "r1", false, "y"))
    val d = dec(("t1", "COMMIT", 100L), ("t2", "ROLLBACK", 101L)) // t3 undecided
    val got = TxnBuffer.commitOrdered(a, d)
      .select("txn_id", "content", "commit_scn", "emit_seq")
      .as[(String, String, Long, Int)].collect().sortBy(_._4)
    assert(got.toSeq === Seq(("t1", "b", 100L, 1), ("t1", "a", 100L, 2)))
  }

  test("bufferState: committed / rolled_back / abandoned-past-retention / in_flight") {
    val a = ev(
      ("t1", 1L, "c", "r1", false, "a"),
      ("t2", 2L, "c", "r1", false, "b"),
      ("t3", 3L, "c", "r1", false, "c"), // undecided, old → abandoned
      ("t4", 50L, "c", "r1", false, "d"), // undecided, recent → in_flight
      ("t4", 60L, "u", "r1", true, null)) // undo inside t4: live count drops to 0 → t4 vanishes
    val d = dec(("t1", "COMMIT", 100L), ("t2", "ROLLBACK", 101L))
    val got = TxnBuffer.bufferState(a, d, retentionCutoffScn = 10L)
      .select("txn_id", "status", "events_live")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("t1", "committed", 1L), ("t2", "rolled_back", 1L),
      ("t3", "abandoned", 1L)))
  }

  test("thresholdAbandoned flags only transactions over the live-event cap") {
    val rows = (1 to 5).map(i => ("big", i.toLong, "c", s"r$i", false, s"e$i")) :+
      (("small", 9L, "c", "r1", false, "x"))
    val got = TxnBuffer.thresholdAbandoned(ev(rows: _*), maxEvents = 3)
      .select("txn_id").as[String].collect().toSet
    assert(got === Set("big"))
  }

  test("lobMerged: fragments assemble in scn order into the latest preceding DML; fragment rows consumed") {
    val a = ev(
      ("t1", 1L, "c", "r1", false, "orig"),
      ("t1", 2L, "lob", "r1", false, "AA"),
      ("t1", 3L, "lob", "r1", false, "BB"),
      ("t1", 4L, "u", "r1", false, "later"), // AFTER the fragments — not the owner
      ("t1", 5L, "c", "r2", false, "plain"))
    val got = TxnBuffer.lobMerged(TxnBuffer.undoFiltered(a))
      .select("scn", "op", "content").as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "c", "AABB"), (4L, "u", "later"), (5L, "c", "plain")))
  }

  test("grid: q104/q105/q106 shapes over the synthetic TxnLog at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val events = TxnLog.events(spark, dir)
    val decisions = TxnLog.decisions(spark)
    val state = TxnBuffer.bufferState(events, decisions, retentionCutoffScn = 160L)
      .select("status").as[String].collect()
    val byStatus = state.groupBy(identity).view.mapValues(_.length).toMap
    // 8 rollback txns (t%5==0), 5 undecided (t%7==3, none divisible by 5)
    assert(byStatus("rolled_back") === 8)
    assert(byStatus("abandoned") + byStatus("in_flight") === 5)
    assert(byStatus("committed") === 27)
    // committed events: no rollback-flagged rows, no lob rows, dense emit_seq
    val committed = TxnBuffer.commitOrdered(events.where(col("op") =!= "lob"), decisions)
    val perTxn = committed.groupBy("txn_id")
      .agg(count(lit(1)).as("n"), max(col("emit_seq")).as("mx"))
      .where(col("n") =!= col("mx")).count()
    assert(perTxn === 0)
    // lob merge changes exactly the owner rows' content
    val live = TxnBuffer.undoFiltered(events)
    val merged = TxnBuffer.attachCommits(TxnBuffer.lobMerged(live), decisions)
    val lobRows = merged.where(col("content").startsWith("L2:")).count()
    assert(lobRows > 0)
  }

  test("plan shape: commitOrdered is windows + one join — bounded exchanges, no cartesian") {
    val events = TxnLog.events(spark, "/root/testdata/sf0.001")
    val plan = TxnBuffer.commitOrdered(events.where(col("op") =!= "lob"), TxnLog.decisions(spark))
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.size <= 4, s"expected <=4 exchanges, got:\n$plan")
    val cartesian = plan.collect {
      case p if p.nodeName.toLowerCase.contains("cartesian") => p
    }
    assert(cartesian.isEmpty)
  }
}
