package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Signals
import graft.streaming.CdcPipeline
import graft.table.LakeTable

/** Signal-channel actions (SignalProcessor dispatch analog): chunked
  * execute-snapshot interleaved with streaming, pause/resume deferring and
  * draining the chunk train, stop cancelling the remainder.
  */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("signals").toString

  test("chunked snapshot honors pause/resume/stop across batch boundaries") {
    val inDir = tmp(); val ckpt = tmp(); val sigDir = tmp()
    val channel = s"$sigDir/signals.jsonl"
    val table = new LakeTable(tmp(), numBuckets = 4)

    var tick = 0L
    def runBatch(): Unit = { // one new file -> exactly one microbatch boundary
      tick += 1
      val ev = Seq(FlatEvent.mk(("repoT", "tick.txt"), tick, "u")).toDF()
      graft.core.Envelope.wrap(ev).coalesce(1).write.mode("append").parquet(inDir)
      CdcPipeline.start(spark, inDir, ckpt, table, signalChannel = Some(channel)).awaitTermination()
    }

    // backfill snapshot: 9 keys, chunk = pmod(hash(repo,path), 3)
    val snapRows = (0 until 9)
      .map(i => (s"snap$i", s"f$i.txt", "c0000000001", "scala", s"backfill $i"))
      .toDF("repo", "path", "commit", "lang", "content")
    val snapPath = s"$sigDir/snap.parquet"
    snapRows.write.parquet(snapPath)
    val chunkOf = snapRows
      .select(col("repo"), pmod(hash(col("repo"), col("path")), lit(3)).as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    def applied(): Set[String] =
      table.snapshot(spark).map(_.where(col("repo").startsWith("snap"))
        .select("repo").as[String].collect().toSet).getOrElse(Set.empty)

    runBatch() // baseline stream only
    assert(applied() === Set.empty)

    Signals.send(channel, Signals.SignalRecord("s1", Signals.ExecuteSnapshot, s"$snapPath#3"))
    runBatch() // consumes the signal AND applies chunk 0
    val afterChunk0 = applied()
    assert(afterChunk0 === chunkOf.filter(_._2 == 0).keySet, "exactly chunk 0 applied")

    Signals.send(channel, Signals.SignalRecord("s2", Signals.PauseSnapshot, ""))
    runBatch() // paused: no chunk applies, stream still flows
    assert(applied() === afterChunk0, "pause defers the chunk train")
    assert(Signals.snapshotState(channel).exists(_.paused))

    Signals.send(channel, Signals.SignalRecord("s3", Signals.ResumeSnapshot, ""))
    runBatch() // resumed: chunk 1 drains
    assert(applied() === chunkOf.filter(c => c._2 <= 1).keySet, "resume drains the next chunk")

    Signals.send(channel, Signals.SignalRecord("s4", Signals.StopSnapshot, ""))
    runBatch() // stopped: chunk 2 never applies
    runBatch()
    assert(applied() === chunkOf.filter(c => c._2 <= 1).keySet, "stop cancels the remainder")
    assert(Signals.snapshotState(channel).isEmpty)

    // the stream itself was never paused
    assert(table.snapshot(spark).get.where(col("repo") === "repoT").count() === 1)
  }
}
