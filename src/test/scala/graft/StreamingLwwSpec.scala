package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.core.RepoEvent
import graft.streaming.StreamingLww

/** Streaming per-key LWW state (`mapGroupsWithState`): winners advance
  * across microbatches, stale events never regress the state — the
  * streaming analog of ReducedRecordBuffer held in the state store.
  */
class StreamingLwwSpec extends SparkSpec {
  import spark.implicits._

  private def ev(key: (String, String), lsn: Long, op: String): RepoEvent = {
    val f = FlatEvent.mk(key, lsn, op)
    RepoEvent(f.repo, f.path, f.commit, f.lang, f.content, f.op, f.part, f.lsn, f.ts_ms)
  }

  test("winners stream advances per key across batches; stale events don't regress it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[RepoEvent]
    val q = StreamingLww.winners(in.toDS())
      .writeStream.format("memory").queryName("lww_out").outputMode(OutputMode.Update()).start()
    try {
      in.addData(ev(("r1", "a"), 1, "c"), ev(("r1", "a"), 5, "u"), ev(("r1", "b"), 2, "c"))
      q.processAllAvailable()
      val b1 = spark.table("lww_out").as[RepoEvent].collect()
      assert(b1.map(e => (e.repo, e.path) -> e.lsn).toMap === Map(("r1", "a") -> 5L, ("r1", "b") -> 2L))

      // batch 2: a STALE event for (r1,a) (lsn 3 < 5) and fresh for (r1,b)
      in.addData(ev(("r1", "a"), 3, "u"), ev(("r1", "b"), 7, "u"))
      q.processAllAvailable()
      val all = spark.table("lww_out").as[RepoEvent].collect()
      // latest emission per key: (r1,a) stays at 5 (stale ignored), (r1,b) at 7
      val latest = all.groupBy(e => (e.repo, e.path)).view.mapValues(_.maxBy(_.lsn).lsn).toMap
      assert(latest === Map(("r1", "a") -> 5L, ("r1", "b") -> 7L))
    } finally q.stop()
  }

  test("RocksDB state store provider: same winners semantics, state survives a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rocksdb-ckpt").toString
    val prev = StreamingLww.RocksDbStateStoreConf.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    StreamingLww.RocksDbStateStoreConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val in = MemoryStream[RepoEvent]
      // The memory sink cannot recover from a checkpoint; foreachBatch can.
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[RepoEvent]
      def start() = StreamingLww.winners(in.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[RepoEvent], _: Long) =>
          batch.collect().foreach(emitted.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update()).start()

      val q1 = start()
      in.addData(ev(("r1", "a"), 1, "c"), ev(("r1", "a"), 5, "u"), ev(("r1", "b"), 2, "c"))
      q1.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(emitted.asScala.map(e => (e.repo, e.path) -> e.lsn).toMap ===
        Map(("r1", "a") -> 5L, ("r1", "b") -> 2L))
      q1.stop()

      // Restart from the checkpoint: the RocksDB store must restore
      // (r1,a)->5, so the stale lsn=3 event cannot regress the winner.
      val q2 = start()
      in.addData(ev(("r1", "a"), 3, "u"), ev(("r1", "b"), 7, "u"))
      q2.processAllAvailable()
      val latest = emitted.asScala.toSeq.groupBy(e => (e.repo, e.path))
        .view.mapValues(_.maxBy(_.lsn).lsn).toMap
      assert(latest === Map(("r1", "a") -> 5L, ("r1", "b") -> 7L))
      q2.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
