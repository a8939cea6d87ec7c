package graft

import org.apache.spark.sql.SparkSession
import graft.sources.SyntheticLog
import graft.streaming.CdcPipeline
import graft.table.LakeTable

/** Per-round benchmark (driver-run; see BASELINE.md).
  *
  * Emits ONE JSON line: per-query wall times over SPARK_GRAFT_SF_DIR, plus
  * the north-rule headline — end-to-end change-events/sec applied on a
  * deterministic synthetic log (replay → LakeTable convergence) — and the
  * two-parallelism scaling evidence (local[8] vs local[32] on the same
  * input; sandbox stand-in for N vs 4N executors; efficiency =
  * (thr_4N / thr_N) / 4).
  *
  * Each replay measurement runs in a FRESH SparkSession with an untimed
  * warm-up replay first, so the headline measures the engine, not JIT /
  * codegen warm-up or state left over from the query sweep.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_EVENTS (default 2,000,000),
  * SPARK_GRAFT_SCALING=0 to skip the scaling pass.
  */
object Bench {

  private def session(cpus: Int, aqe: Boolean = true): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full replay of `numEvents` synthetic events into a fresh
    * LakeTable; returns (wallSec, eventsPerSec). Buckets = 2×cores for
    * load balance within a wave.
    */
  private def replayThroughput(spark: SparkSession, numEvents: Long, cpus: Int): (Double, Double) = {
    val root = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val table = new LakeTable(root, numBuckets = cpus * 2)
    val log = SyntheticLog.generate(spark, numEvents, numKeys = numEvents / 20, parts = cpus)
    val t0 = System.nanoTime()
    CdcPipeline.replay(spark, log, table, numBatches = 4, salt = 8, writeMetrics = false)
    table.snapshot(spark).foreach(_.count()) // force a converged read
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, numEvents / sec)
  }

  /** Fresh session at `cpus`: untimed warm-up replay, then the median of
    * `reps` measurements (the sandbox's wall-clock noise is ±2× on single
    * runs — host contention, not the engine). AQE off for the replay: the
    * plan is explicitly partitioned (bucket-aligned merge), so adaptive
    * re-planning only adds per-stage driver latency here; it stays ON for
    * the query sweep.
    */
  private def measuredReplay(numEvents: Long, cpus: Int, reps: Int = 3): (Double, Double) = {
    val s = session(cpus, aqe = false)
    try {
      replayThroughput(s, math.min(500000L, numEvents), cpus) // warm-up
      val runs = (1 to reps).map(_ => replayThroughput(s, numEvents, cpus)).sortBy(_._1)
      runs(runs.size / 2)
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "2000000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    val qSession = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(qSession, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    qSession.stop()

    // Headline + scaling: same job at parallelism 8 and `cpus` (stands in
    // for N vs 4N executors), each in a fresh warmed session.
    val (thr8, replaySec, eps) =
      if (doScaling) {
        val (_, t8) = measuredReplay(benchEvents, 8)
        val (sec, t32) = measuredReplay(benchEvents, cpus)
        (Some(t8), sec, t32)
      } else {
        val (sec, t) = measuredReplay(benchEvents, cpus)
        (None, sec, t)
      }

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + replaySec
    val scalingJson = thr8.map { t8 =>
      val eff = (eps / t8) / (cpus / 8.0)
      f""","scaling":{"events":$benchEvents,"thr_local8":$t8%.0f,"thr_local$cpus":$eps%.0f,"efficiency":$eff%.3f}"""
    }.getOrElse("")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cdc_replay":{"events":$benchEvents,"sec":$replaySec%.3f,"events_per_sec":$eps%.0f}$scalingJson}""")
  }
}
