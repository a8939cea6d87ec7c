package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling harness for the q84 ingest-near-dedup sweep outlier: sums
  * Spark job wall time per call site so the dominant phase is measurable,
  * not guessed. Test-scope tool, like [[ProfReplay]].
  */
object ProfQ84 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bySite = mutable.Map.empty[String, (Long, Int)] // totalMs, jobs
    val jobStart = mutable.Map.empty[Int, (String, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobStart(j.jobId) = (site, System.currentTimeMillis())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { case (site, t0) =>
          val d = System.currentTimeMillis() - t0
          val (tot, n) = bySite.getOrElse(site, (0L, 0))
          bySite(site) = (tot + d, n + 1)
        }
    })

    val execs = mutable.ArrayBuffer.empty[(String, Double)]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        execs.synchronized {
          execs += ((funcName + " | " + qe.logical.nodeName + " | " +
            qe.sparkPlan.nodeName, durationNs / 1e9))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    val t0 = System.nanoTime()
    val root = java.nio.file.Files.createTempDirectory("prof-q84").toString
    val index = tdp.IngestDedup.nearIndexTable(s"$root/idx", numBuckets = 16)
    val p0 = System.nanoTime()
    tdp.IngestDedup.ingestNear(spark, index,
      tdp.Corpus.documents(spark, sfDir).where(col("doc_id") % 3 =!= 0)
        .select("doc_id", "text"), 0L).unpersist()
    val p1 = System.nanoTime()
    val out = tdp.IngestDedup.ingestNear(spark, index,
      tdp.Corpus.docsWithDups(spark, sfDir).select("doc_id", "text"), 1L)
    val n = out.count()
    val p2 = System.nanoTime()
    out.unpersist()

    println(f"[prof-q84] phase1 ${(p1 - p0) / 1e9}%.1f s, phase2 ${(p2 - p1) / 1e9}%.1f s, total ${(p2 - t0) / 1e9}%.1f s, admitted $n")
    Thread.sleep(1000) // listener bus drain
    bySite.toSeq.sortBy(-_._2._1).take(20).foreach { case (site, (ms, jobs)) =>
      println(f"[prof-q84] ${ms / 1000.0}%8.1f s  $jobs%4d jobs  $site")
    }
    execs.synchronized {
      execs.zipWithIndex.sortBy(-_._1._2).take(12).foreach { case ((k, s), i) =>
        println(f"[prof-q84-sql] #$i%3d $s%8.1f s  $k")
      }
    }
    spark.stop()
  }
}
