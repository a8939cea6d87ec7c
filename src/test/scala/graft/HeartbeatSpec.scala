package graft

import org.apache.spark.sql.functions._
import graft.sources.Heartbeat

/** Heartbeat emission: quiet (part, interval) cells emit markers carrying
  * the partition's running offset; active cells and pre-first-event cells
  * emit nothing.
  */
class HeartbeatSpec extends SparkSpec {
  import spark.implicits._

  test("heartbeats fill exactly the quiet intervals, carrying the last offset") {
    // part 0: events at t=0 (lsn 1) and t=25000 (lsn 5) — interval 1 quiet
    // part 1: one event at t=3000 (lsn 2) — intervals 1 and 2 quiet
    val log = Seq(
      (0, 0L, 1L),
      (0, 25000L, 5L),
      (1, 3000L, 2L)
    ).toDF("part", "ts_ms", "lsn")
    val hb = Heartbeat.emit(log, intervalMs = 10000L)
      .select("part", "heartbeat_ts", "last_lsn").as[(Int, Long, Long)]
      .collect().toSet
    assert(hb === Set((0, 10000L, 1L), (1, 10000L, 2L), (1, 20000L, 2L)))
  }

  test("no heartbeats before a partition's first offset; offsets never regress") {
    val log = Seq(
      (0, 40000L, 9L), // part 0 silent for intervals 0-3, then one event
      (1, 0L, 1L), (1, 1000L, 3L), (1, 45000L, 8L)
    ).toDF("part", "ts_ms", "lsn")
    val hb = Heartbeat.emit(log, intervalMs = 10000L).cache()
    // part 0 has no offset before t=40000: nothing emitted for it
    assert(hb.where(col("part") === 0).count() === 0)
    // part 1: quiet intervals 1..3 all carry lsn 3 (max before each start)
    val p1 = hb.where(col("part") === 1)
      .select("heartbeat_ts", "last_lsn").as[(Long, Long)].collect().toSet
    assert(p1 === Set((10000L, 3L), (20000L, 3L), (30000L, 3L)))
    hb.unpersist()
  }
}
