package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Control-plane signals (SURVEY.md §2.1 "Signal channels").
  *
  * Reference: `pipeline/signal/SignalProcessor.java` polls registered
  * channels (source table, file, Kafka, JMX, in-process) for
  * `SignalRecord{id, type, data}` (`pipeline/signal/SignalRecord.java:29-37`)
  * and dispatches to actions (execute-snapshot, stop-snapshot, pause,
  * resume, log).
  *
  * Spark-first: the channel is a tiny JSON-lines file read at each
  * microbatch boundary inside `foreachBatch` — driver-side, O(signals)
  * bytes, never a cluster job. Processed signal ids are recorded next to
  * the channel so redelivery is idempotent (the reference dedupes via the
  * signal table's PK).
  */
object Signals {

  final case class SignalRecord(id: String, `type`: String, data: String)

  val ExecuteSnapshot = "execute-snapshot"
  val StopSnapshot = "stop-snapshot"
  val PauseSnapshot = "pause-snapshot"
  val ResumeSnapshot = "resume-snapshot"
  val SchemaChanges = "schema-changes"
  val Log = "log"

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("data", StringType, nullable = true)))

  /** Append a signal to a file channel (test/ops helper). */
  def send(channel: String, s: SignalRecord): Unit = {
    val p = Paths.get(channel)
    Files.createDirectories(p.getParent)
    val line = LineCodec.toJson(s) + "\n"
    Files.writeString(p, line, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Read all signals currently in the file channel (driver-side). */
  def read(channel: String): Seq[SignalRecord] = {
    val p = Paths.get(channel)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map(LineCodec.fromJson)
  }

  /** Signals not yet marked processed; marking is an append to
    * `<channel>.done`. Idempotent redelivery: already-done ids are skipped.
    */
  def pending(channel: String): Seq[SignalRecord] = {
    val done = {
      val p = Paths.get(channel + ".done")
      if (Files.exists(p)) Files.readAllLines(p).asScala.toSet else Set.empty[String]
    }
    read(channel).filterNot(s => done.contains(s.id))
  }

  def markProcessed(channel: String, ids: Seq[String]): Unit = {
    if (ids.isEmpty) return
    val p = Paths.get(channel + ".done")
    Files.writeString(p, ids.mkString("", "\n", "\n"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  // ------------------------------------------------- snapshot progress

  /** Driver-side state of a signal-driven chunked snapshot (the analog of
    * `AbstractIncrementalSnapshotChangeEventSource`'s persisted
    * IncrementalSnapshotContext): which chunk is next, and whether the
    * snapshot is paused. Lives beside the channel; mutated only at batch
    * boundaries by the single-writer driver. Progress advances AFTER the
    * chunk's commit, so a crash redelivers the chunk — idempotent under
    * LWW convergence.
    *
    * Chunk membership, one of (the `ChunkBoundaryCalculator` analogs):
    *  - `staged` nonEmpty: the source was re-clustered ONCE into
    *    `staged/__chunk=N/` key-range directories — each chunk read is
    *    directory-pruned to exactly its slice (O(chunk), not O(table);
    *    round-2 VERDICT #2: the old hash-chunk predicate re-scanned the
    *    whole table per chunk);
    *  - `expr` nonEmpty: an SQL chunk-index expression over the source
    *    (lets an oracle recompute membership);
    *  - both empty: single-chunk snapshot.
    *
    * `cond` (optional) is the signal's ADDITIONAL-CONDITION — an SQL row
    * predicate restricting the snapshot to matching rows (the reference's
    * `additional-conditions` field on execute-snapshot,
    * `ExecuteSnapshot.java:61-70,88-97`): applied before chunking, so a
    * conditioned backfill reads and re-emits only the selected slice.
    */
  final case class SnapshotProgress(
      data: String, chunks: Int, next: Int, paused: Boolean,
      staged: String = "", expr: String = "", cond: String = "")

  private def statePath(channel: String) = Paths.get(channel + ".snapshot.json")

  def snapshotState(channel: String): Option[SnapshotProgress] = {
    val p = statePath(channel)
    if (!Files.exists(p)) None
    else {
      // `cond` is optional so a state file written by the pre-condition
      // format (an in-flight chunk train across an upgrade) still parses.
      val R = """\{"data":"(.*)","chunks":(\d+),"next":(\d+),"paused":(true|false),"staged":"(.*)","expr":"(.*?)"(?:,"cond":"(.*)")?\}""".r
      Files.readString(p).trim match {
        case R(d, c, n, pz, st, ex, cd) =>
          Some(SnapshotProgress(unescState(d), c.toInt, n.toInt, pz.toBoolean,
            unescState(st), unescState(ex), unescState(Option(cd).getOrElse(""))))
        case other => throw new IllegalArgumentException(s"bad snapshot state: $other")
      }
    }
  }

  private def escState(s: String): String = LineCodec.esc(s)
  private def unescState(s: String): String = LineCodec.unesc(s)

  private def writeState(channel: String, st: SnapshotProgress): Unit =
    Files.writeString(statePath(channel),
      s"""{"data":"${escState(st.data)}","chunks":${st.chunks},"next":${st.next},""" +
        s""""paused":${st.paused},"staged":"${escState(st.staged)}",""" +
        s""""expr":"${escState(st.expr)}","cond":"${escState(st.cond)}"}""")

  /** execute-snapshot action: start (or restart) a chunked snapshot. */
  def initSnapshot(channel: String, data: String, chunks: Int,
      staged: String = "", expr: String = "", cond: String = ""): Unit =
    writeState(channel, SnapshotProgress(data, math.max(chunks, 1), 0, paused = false, staged, expr, cond))

  /** One chunk committed: advance; the state file (and any range-staged
    * clustering dir) disappears when done.
    */
  def advanceSnapshot(channel: String): Unit = snapshotState(channel).foreach { st =>
    if (st.next + 1 >= st.chunks) {
      Files.deleteIfExists(statePath(channel))
      deleteStaged(st)
    } else writeState(channel, st.copy(next = st.next + 1))
  }

  /** pause-/resume-snapshot actions (no-ops when no snapshot is running). */
  def setSnapshotPaused(channel: String, paused: Boolean): Unit =
    snapshotState(channel).foreach(st => writeState(channel, st.copy(paused = paused)))

  /** stop-snapshot action: cancel — remaining chunks are never applied. */
  def clearSnapshot(channel: String): Unit = {
    snapshotState(channel).foreach(deleteStaged)
    Files.deleteIfExists(statePath(channel))
  }

  private def deleteStaged(st: SnapshotProgress): Unit =
    if (st.staged.nonEmpty) graft.core.Fs.deleteTree(Paths.get(st.staged))

  /** Minimal explicit JSON codec (flat 3-field record; avoids dragging a
    * JSON mapper into executors — this never leaves the driver anyway).
    */
  private object LineCodec {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }
    def toJson(s: SignalRecord): String =
      s"""{"id":"${esc(s.id)}","type":"${esc(s.`type`)}","data":"${esc(Option(s.data).getOrElse(""))}"}"""
    private val R = """\{"id":"(.*?)","type":"(.*?)","data":"(.*)"\}""".r
    def fromJson(line: String): SignalRecord = line.trim match {
      case R(i, t, d) => SignalRecord(unesc(i), unesc(t), unesc(d))
      case other => throw new IllegalArgumentException(s"bad signal line: $other")
    }
    /** Single left-to-right scan: chained `replace` calls would re-scan
      * earlier replacements' output — `replace("\\n","\n")` first turns a
      * literal backslash+n (escaped as `\\` `n`) into backslash+NEWLINE,
      * corrupting any value that contains a backslash before an 'n'.
      */
    def unesc(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n'  => sb.append('\n'); i += 2
            case '"'  => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case _    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }
}
