package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{CdcPipeline, Lineage}
import graft.table.LakeTable

/** OpenLineage-analog run-event feed: dataset facets on START, one
  * RUNNING row per committed microbatch, terminal COMPLETE/FAIL, all
  * columns deterministic (replay-stable feed).
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("lineage").toString

  private val job = Lineage.Job("graft", "files-cdc")

  test("replayWithLineage emits START facets, RUNNING per batch, COMPLETE with live count") {
    val log = (1 to 200).map(i => FlatEvent.mk((s"repo${i % 3}", s"p${i % 10}.txt"), i.toLong,
      if (i % 11 == 0) "d" else "u"))
    val table = new LakeTable(tmp(), numBuckets = 8)
    val results = Lineage.replayWithLineage(spark, log.toDF(), table, job,
      inputName = "log", outputName = "state", numBatches = 3)
    assert(results.forall(_.committed))

    val feed = Lineage.feed(spark, table.root).orderBy("seq").collect()
    assert(feed.length === 2 + 3 + 1, "2 START + 3 RUNNING + COMPLETE")
    assert(feed.map(_.getAs[Int]("seq")).toSeq === (0 until 6))
    assert(feed.forall(_.getAs[String]("run_id") === Lineage.runId(job)),
      "one run id across the whole run")

    val starts = feed.filter(_.getAs[String]("event_type") === Lineage.Start)
    assert(starts.map(r => (r.getAs[String]("dataset_name"), r.getAs[String]("dataset_kind"),
      r.getAs[String]("dataset_type"))).toSet ===
      Set(("log", "INPUT", "STREAM"), ("state", "OUTPUT", "TABLE")))
    assert(starts.forall(_.getAs[String]("schema_json").contains(""""name":"lsn","type":"bigint"""")),
      "schema facet serializes field names and types")
    assert(starts.forall(_.getAs[Long]("records") === -1L))

    val running = feed.filter(_.getAs[String]("event_type") === Lineage.Running)
    assert(running.map(_.getAs[Long]("batch_id")).toSeq === results.map(_.batchId),
      "RUNNING rows track committed batches in order")
    assert(running.map(_.getAs[Long]("records")).toSeq === results.map(_.eventsIn))
    assert(running.map(_.getAs[Long]("records")).sum === 200L)

    val complete = feed.last
    assert(complete.getAs[String]("event_type") === Lineage.Complete)
    assert(complete.getAs[Long]("records") === table.snapshot(spark).get.count())
  }

  test("run id is a deterministic content hash of the job identity") {
    assert(Lineage.runId(job) === Lineage.runId(Lineage.Job("graft", "files-cdc", "other desc")),
      "description does not change run identity")
    assert(Lineage.runId(job) !== Lineage.runId(Lineage.Job("graft", "other")))
    assert(Lineage.runId(job).matches("[0-9a-f]{32}"))
  }

  test("a failing replay leaves a FAIL terminal row") {
    val table = new LakeTable(tmp(), numBuckets = 8)
    // a log with a non-existent column reference inside the plan blows up
    // at action time, after START was emitted
    val poisoned = (1 to 10).map(i => FlatEvent.mk(("r", "p.txt"), i.toLong, "u")).toDF()
      .withColumn("lsn", expr("raise_error('boom')").cast("long"))
    intercept[Exception] {
      Lineage.replayWithLineage(spark, poisoned, table, job, "log", "state", numBatches = 2)
    }
    val feed = Lineage.feed(spark, table.root).orderBy("seq").collect()
    assert(feed.last.getAs[String]("event_type") === Lineage.Fail)
    assert(feed.last.getAs[Long]("records") === -1L)
  }
}
