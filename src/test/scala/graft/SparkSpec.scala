package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // shared session; never stop it

  /** Sum of `metric` over the task metrics of every stage completed
    * during `action`. The listener bus posts asynchronously, so the
    * counter is polled until stable instead of sleeping a fixed time — a
    * slow bus would otherwise UNDERCOUNT and let an upper-bound
    * assertion pass vacuously. Callers asserting `<= bound` should pair
    * it with a positive control (`> 0` on work that must register) so a
    * broken meter is detectable.
    */
  protected def taskMetric(metric: org.apache.spark.executor.TaskMetrics => Long)(
      action: => Unit): Long = {
    val n = new java.util.concurrent.atomic.AtomicLong
    val meter = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        n.addAndGet(metric(sc.stageInfo.taskMetrics))
    }
    spark.sparkContext.addSparkListener(meter)
    try {
      action
      var prev = -1L; var stable = 0; var waited = 0
      while (stable < 3 && waited < 8000) {
        val cur = n.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        Thread.sleep(250); waited += 250
      }
    } finally spark.sparkContext.removeSparkListener(meter)
    n.get
  }

  /** Input records actually READ by `action` — the observable for
    * driver-side file/row-group pruning (a pruned file schedules no
    * task, so its rows never reach inputMetrics).
    */
  protected def recordsRead(action: => Unit): Long =
    taskMetric(_.inputMetrics.recordsRead)(action)

  /** Shuffle bytes written during `action` — wall time barely moves in
    * local mode, but on a cluster the exchange is network-bound, so
    * bytes moved is the honest scale observable.
    */
  protected def shuffleBytes(action: => Unit): Long =
    taskMetric(_.shuffleWriteMetrics.bytesWritten)(action)
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
