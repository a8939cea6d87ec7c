package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.sources.SyntheticLog
import graft.streaming.CdcPipeline
import graft.table.LakeTable

/** Scratch profiler (test scope, not shipped): one warmed replay at a
  * given core count with per-JOB wall times grouped by call site, to
  * locate where the per-replay fixed overhead and the multi-core
  * scaling gap live. Run:
  * `sbt "Test/runMain graft.ProfReplay 8 4000000"`.
  */
object ProfReplay {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val events = args.lift(1).getOrElse("4000000").toLong
    val shm = java.nio.file.Paths.get("/dev/shm")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    val spark = (if (java.nio.file.Files.isWritable(shm))
      b.config("spark.local.dir", "/dev/shm/graft-prof-local") else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replay(n: Long, profile: Boolean): Double = {
      val root = java.nio.file.Files.createTempDirectory(shm, "graft-prof")
      val table = new LakeTable(root.toString, numBuckets = 64)
      // Materialize untimed, mirroring Bench.replayThroughput: the metric
      // times the APPLY, not the synthesis of the input log.
      val log = SyntheticLog.generate(spark, n, numKeys = n / 20, parts = 32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      log.count()
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val events0 = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
      // Per-stage task aggregates: (n, sumRunMs, maxRunMs, gcMs, shufRdB, shufWrB, inB, outB, serMs, deserMs)
      val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
      val stageDone = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          starts.put(e.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
            events0.add((e.jobId, t0, System.nanoTime(), site))
          }
        }
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            val a = stageAgg.computeIfAbsent(e.stageId, _ => new Array[Long](10))
            a.synchronized {
              a(0) += 1
              a(1) += m.executorRunTime
              a(2) = math.max(a(2), m.executorRunTime)
              a(3) += m.jvmGCTime
              a(4) += m.shuffleReadMetrics.totalBytesRead
              a(5) += m.shuffleWriteMetrics.bytesWritten
              a(6) += m.inputMetrics.bytesRead
              a(7) += m.outputMetrics.bytesWritten
              a(8) += m.resultSerializationTime
              a(9) += m.executorDeserializeTime
            }
          }
        }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
          stageDone.add((e.stageInfo.stageId, System.nanoTime(), e.stageInfo.name))
      }
      if (profile) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      CdcPipeline.replay(spark, log, table, numBatches = 4, salt = 8, writeMetrics = false)
      table.snapshot(spark).foreach(_.count())
      val sec = (System.nanoTime() - t0) / 1e9
      if (profile) {
        Thread.sleep(1500)
        spark.sparkContext.removeSparkListener(listener)
        import scala.jdk.CollectionConverters._
        val evs = events0.asScala.toSeq.sortBy(_._2)
        val total = evs.map(e => e._3 - e._2).sum / 1e9
        System.err.println(f"[prof] cpus=$cpus events=$n wall=$sec%.1f s; job-time total $total%.1f s")
        var prevEnd = t0
        evs.foreach { case (id, s, e, site) =>
          val gap = (s - prevEnd) / 1e9
          prevEnd = math.max(prevEnd, e)
          System.err.println(f"[prof]   job$id%-3d ${(e - s) / 1e9}%6.2f s (gap before: $gap%5.2f s)  $site")
        }
        val stages = stageDone.asScala.toSeq.sortBy(_._1)
        stages.foreach { case (sid, _, name) =>
          Option(stageAgg.get(sid)).foreach { a =>
            val mb = (b: Long) => b / 1e6
            System.err.println(
              f"[prof]   stage$sid%-3d n=${a(0)}%3d sum=${a(1) / 1e3}%6.2fs max=${a(2) / 1e3}%5.2fs " +
              f"gc=${a(3) / 1e3}%5.2fs deser=${a(9) / 1e3}%5.2fs " +
              f"sRd=${mb(a(4))}%7.1fMB sWr=${mb(a(5))}%7.1fMB in=${mb(a(6))}%7.1fMB out=${mb(a(7))}%7.1fMB  $name")
          }
        }
        stageAgg.clear(); stageDone.clear()
      }
      graft.core.Fs.deleteTree(root)
      sec
    }

    replay(math.min(250000L, events), profile = false) // warm-up
    replay(events, profile = true)
    replay(events, profile = true)
    spark.stop()
  }
}
