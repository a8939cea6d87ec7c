package graft

import org.apache.spark.sql.functions._
import graft.sources.ChangeTable

/** SQL-Server-style change-table ingestion: mask decode, max-column
  * repair, before/after row pairing.
  */
class ChangeTableSpec extends SparkSpec {
  import spark.implicits._

  private val captured = Seq("k", "a", "b")

  private def raw = Seq(
    // insert: one op-2 row
    (10L, 10L, 2, null: Array[Byte], "k1", "a1", "b1"),
    // update: op-3 pre-image + op-4 post-image; mask bit 1 (a) only;
    // b is a max-type column stored NULL because unchanged
    (11L, 11L, 3, Array[Byte](0x02), "k1", "a1", null: String),
    (11L, 11L, 4, Array[Byte](0x02), "k1", "a2", null: String),
    // update with NULL mask: everything counts as changed; b's NULL is real
    (12L, 12L, 3, null: Array[Byte], "k1", "a2", null: String),
    (12L, 12L, 4, null: Array[Byte], "k1", "a3", null: String),
    // delete: one op-1 row with the pre-image
    (13L, 13L, 1, null: Array[Byte], "k1", "a3", "b3"))
    .toDF("__lsn", "__seqval", "__op", "__update_mask", "k", "a", "b")

  test("columnChanged: bit i%8 of byte i/8; null or short mask = changed") {
    val m = Seq((Array[Byte](0x05, 0x01), 1)).toDF("m", "x")
    def bit(i: Int) = m.select(ChangeTable.columnChanged(col("m"), i)).head().getBoolean(0)
    assert(bit(0) && !bit(1) && bit(2) && !bit(3)) // 0x05 = bits 0,2
    assert(bit(8) && !bit(9))                      // second byte 0x01
    assert(bit(16))                                // past the mask = changed
    val nul = Seq((null: Array[Byte], 1)).toDF("m", "x")
    assert(nul.select(ChangeTable.columnChanged(col("m"), 3)).head().getBoolean(0))
  }

  test("repairMaxColumns: unchanged-NULL max column becomes the placeholder") {
    val fixed = ChangeTable.repairMaxColumns(raw, captured, Seq("b"), "__gone__")
      .select("__lsn", "__op", "b").as[(Long, Int, String)].collect().toSet
    assert(fixed.contains((11L, 3, "__gone__")) && fixed.contains((11L, 4, "__gone__")))
    // null mask ⇒ changed ⇒ the NULL is a real value, not repaired
    assert(fixed.contains((12L, 4, null)))
    // non-update rows never repaired
    assert(fixed.contains((10L, 2, "b1")) && fixed.contains((13L, 1, "b3")))
  }

  test("toEvents: op pairing, before/after images, changed-column decode") {
    val ev = ChangeTable.toEvents(raw, captured).orderBy("lsn")
    val rows = ev.select(col("op"), col("lsn"),
      col("before.a"), col("after.a"), array_join(col("changed"), ",")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("c", 10L), ("u", 11L), ("u", 12L), ("d", 13L)))
    val byLsn = rows.map(r => r.getLong(1) -> r).toMap
    assert(byLsn(10L).isNullAt(2) && byLsn(10L).getString(3) === "a1") // c: after only
    assert(byLsn(11L).getString(2) === "a1" && byLsn(11L).getString(3) === "a2")
    assert(byLsn(11L).getString(4) === "a")                  // mask 0x02 = bit 1
    assert(byLsn(12L).getString(4) === "k,a,b")              // null mask = all
    assert(byLsn(13L).getString(2) === "a3" && byLsn(13L).isNullAt(3)) // d: before only
    assert(byLsn(10L).isNullAt(4) && byLsn(13L).isNullAt(4)) // changed is update-only
  }

  test("pairing is the ONLY exchange in the plan") {
    val plan = ChangeTable.toEvents(raw, captured).queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange".r.findAllMatchIn(plan).size === 1, plan)
  }

  test("composition: repaired placeholder patches from sink state via reselect") {
    val state = Seq(("k1", "b-live")).toDF("k", "b")
    val repaired = ChangeTable.repairMaxColumns(raw, captured, Seq("b"), "__gone__")
    val ev = ChangeTable.toEvents(repaired, captured)
      .where(col("op") === "u")
      .select(col("lsn"), col("after.k").as("k"), col("after.b").as("b"))
    val patched = graft.operators.Transforms.reselectColumns(
      ev, state, Seq("b"), "__gone__", keyCols = Seq("k"))
      .select("lsn", "b").as[(Long, String)].collect().toMap
    assert(patched(11L) === "b-live") // placeholder → reselected
    assert(patched(12L) === null)     // real NULL stays
  }
}
