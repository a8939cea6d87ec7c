package graft.table

import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Envelope
import org.apache.parquet.column.values.bloomfilter.{BloomFilter => ParquetBloom}

/** A position in the change log's total order (SURVEY.md §1.2). */
final case class LogPos(commit: String, lsn: Long) {
  def max(other: LogPos): LogPos =
    if (commit > other.commit || (commit == other.commit && lsn >= other.lsn)) this
    else other
}

/** One data file in a commit manifest. `stats` holds optional per-column
  * zone maps — (min, max) string bounds for the key and ordering columns,
  * read from the parquet footer at stage time (same footer open as the
  * row count; no data read). Bounds are Iceberg-style truncated (min is a
  * prefix, max is a prefix with its last char bumped — still a valid upper
  * bound) and only stored when pure ASCII, where Java string order, UTF-16
  * order and parquet's unsigned-UTF-8 stats order all agree — so pruning
  * with them is sound for any value. Empty map = no stats (old manifests,
  * non-string columns, non-ASCII extremes): readers must treat absence as
  * "may contain anything".
  */
final case class FileEntry(path: String, bucket: Int, schemaIdx: Int, rows: Long,
    stats: Map[String, (String, String)] = Map.empty)

final case class CommitInfo(
    version: Long,
    batchId: Long,
    watermark: Map[Int, Long],         // source partition -> max applied lsn
    fence: Option[LogPos],             // latest truncate position
    schemas: Seq[String],              // distinct StructType jsons, append-only
    schemaIdx: Int,                    // current table schema
    files: Seq[FileEntry],
    numBuckets: Int = 0,               // bucket layout at this commit (0 = pre-layout-tracking commit)
    tsMs: Long = 0L) {                 // wall-clock commit stamp (0 = pre-stamp commit); set by commit()
  def schema: StructType = DataType.fromJson(schemas(schemaIdx)).asInstanceOf[StructType]
}

/** Transactional bucketed Parquet table — the in-repo Iceberg surrogate
  * (no Iceberg jar in the sandbox; SURVEY.md §7.1 item 2).
  *
  * Layout:
  * {{{
  *   <root>/_commits/v<zero-padded>.json   // the commit log (source of truth)
  *   <root>/data/<batch-dir>/__bucket=N/part-....parquet
  *   <root>/_metrics/part-....parquet      // per-batch per-partition lineage
  * }}}
  *
  * Properties:
  *  - snapshot isolation: readers resolve the latest commit file and read
  *    only the files in its manifest; concurrently-staged data is invisible;
  *  - atomic commit: write-temp + ATOMIC_MOVE of the commit json — a crashed
  *    writer leaves only orphan data dirs that no manifest references;
  *  - idempotent fencing: a commit carries the microbatch id and the
  *    per-source-partition offset watermark; re-applying an already-committed
  *    batch is a no-op (exactly-once; the Spark analog of Debezium's
  *    restart-skip fencing, `BinlogStreamingChangeEventSource.java:280-310`);
  *  - schema evolution at commit boundaries: each data file remembers the
  *    schema it was written with; reads align every file group to the
  *    current table schema (null-fill added columns, upcast widened ones) —
  *    the sink-side `alterTableIfNeeded` analog
  *    (`debezium-connector-jdbc/.../JdbcChangeEventSink.java:217-219`).
  *
  * Scale notes: keys are hash-bucketed (`pmod(hash(keyCols), numBuckets)` —
  * identical to Spark's native bucketing, which is what [[bucketedState]]
  * exploits for the shuffle-free state read). Two write modes:
  *  - copy-on-write (default): a merge rewrites only touched buckets; reads
  *    are resolved by construction;
  *  - merge-on-read (`mergeOnRead = true`): a merge APPENDS per-batch
  *    winner files — O(batch) apply regardless of table size — and reads
  *    resolve LWW across each bucket's file stack ([[resolved]],
  *    shuffle-free); [[compact]] collapses the stacks.
  * Commit files are incremental manifests (delta + roll-up every
  * [[LakeTable.FullManifestEvery]]): driver metadata per commit is
  * O(touched buckets), not O(table files). At 100 TB raise `numBuckets` so
  * one bucket ~ a few GB, and set `maxFileRows` so each bucket is a STACK
  * of size-bounded files rather than one monolith (the read side — bucketed
  * scan, MoR resolve, compaction — is multi-file-per-bucket native).
  */
final class LakeTable(
    val root: String,
    val numBuckets: Int = 32,
    val keyCols: Seq[String] = Envelope.keyCols,
    val mergeOnRead: Boolean = false,
    val sortedBuckets: Boolean = false,
    val autoCompactDepth: Int = 0,
    val maxFileRows: Long = 0L,
    val bloomKeyNdv: Int = 0,
    val writerOptions: Map[String, String] = Map.empty,
    val commitStore: Option[CommitStore] = None) {
  require(!(sortedBuckets && mergeOnRead),
    "sortedBuckets needs the ≤1-file-per-bucket CoW invariant (Spark only " +
      "reports bucket sort order for single-file buckets); merge-on-read stacks files")
  require(!(sortedBuckets && maxFileRows > 0),
    "sortedBuckets needs the ≤1-file-per-bucket CoW invariant; " +
      "maxFileRows splits a bucket write into size-bounded files")
  private def commitsDir: Path = Paths.get(root, "_commits")

  /** The commit log's storage backend (schema history + offset store in
    * one — see [[CommitStore]]); file-backed under `_commits/` unless a
    * backend was injected. DATA files always live under `root` — the
    * seam covers metadata, like the reference's storage modules.
    */
  private val store: CommitStore = commitStore.getOrElse(new FileCommitStore(commitsDir))

  /** Bucket assignment — a pure function of the key, never stored.
    * IDENTICAL to Spark's native bucketing / HashPartitioning partition-id
    * expression (`pmod(Murmur3Hash(keys), n)`), which is what makes both
    * the stage() partition-id==bucket contract and the shuffle-free
    * [[bucketedState]] read line up.
    */
  def bucketCol: org.apache.spark.sql.Column =
    pmod(hash(keyCols.map(col): _*), lit(numBuckets))

  def lastCommit(): Option[CommitInfo] =
    commitNames().lastOption.map(materialize).map(validateLayout)

  /** All commits, oldest first — the table's history / schema log. NOT
    * layout-validated: history may span a [[rebucket]] (time travel and the
    * schema log read old layouts through the layout-independent aligned
    * read; [[bucketedState]] refuses them itself).
    */
  def commits(): Seq[CommitInfo] = commitNames().map(materialize)

  /** Commit versions present, decoded from FILENAMES only (`v%020d.json`)
    * — no JSON parse; the cheap existence probe for history-dependent
    * consumers (the change feed's window materialization, the view
    * maintainer's retention check).
    */
  def commitVersions(): Seq[Long] =
    commitNames().map(_.stripPrefix("v").stripSuffix(".json").toLong)

  /** Fail fast on a bucket-layout mismatch of the HEAD commit: `bucketCol`
    * is a pure function of `numBuckets`, so an instance opened with the
    * wrong count would silently route keys to the wrong buckets (wrong
    * merges, wrong bucketed scan). The commit log records the layout
    * ([[rebucket]] evolves it); use [[LakeTable.open]] to adopt whatever
    * the table currently has.
    */
  private def validateLayout(ci: CommitInfo): CommitInfo = {
    if (ci.numBuckets > 0 && ci.numBuckets != numBuckets)
      throw new IllegalStateException(
        s"bucket-layout mismatch: table at $root has numBuckets=${ci.numBuckets} " +
          s"(commit v${ci.version}) but this instance was constructed with $numBuckets; " +
          "re-open via LakeTable.open(root) after a rebucket")
    ci
  }

  /** Drain a directory listing with the stream CLOSED afterwards —
    * `Files.list`/`Files.walk` hold an open directory fd until closed,
    * and unclosed streams on the per-microbatch paths (commitPaths runs
    * every batch) leak fds until finalization.
    */
  private def listDir(p: Path): Seq[Path] = {
    if (!Files.isDirectory(p)) return Nil
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def commitNames(): Seq[String] =
    store.listNames().filter(_.matches("v\\d+\\.json")).sorted

  /** Resolve a commit file to a materialized CommitInfo, folding delta
    * commits onto their base (chain length < [[LakeTable.FullManifestEvery]]
    * by construction). A tiny memo keeps the recently-resolved commits so
    * the per-batch lastCommit() is one small-file read, not a chain walk.
    */
  private val resolved = new java.util.concurrent.ConcurrentHashMap[Long, CommitInfo]()

  private def materialize(name: String): CommitInfo =
    LakeTable.parse(store.read(name)) match {
      case Right(full) =>
        resolved.put(full.version, full); trimMemo(full.version); full
      case Left(d) =>
        Option(resolved.get(d.version)).getOrElse {
          val base = Option(resolved.get(d.base)).getOrElse(
            materialize(f"v${d.base}%020d.json"))
          val files = base.files.filterNot(f => d.removedPaths.contains(f.path)) ++ d.added
          val ci = CommitInfo(d.version, d.batchId, d.watermark, d.fence, d.schemas, d.schemaIdx, files, d.numBuckets, d.tsMs)
          resolved.put(ci.version, ci); trimMemo(ci.version); ci
        }
    }

  private def trimMemo(latest: Long): Unit = {
    val it = resolved.keySet.iterator()
    while (it.hasNext) if (it.next() < latest - 2) it.remove()
  }

  /** Schema-change log: one row per commit whose schema differs from its
    * predecessor (the `SchemaHistory` / schema-change-topic analog,
    * `relational/history/SchemaHistory.java:175-216`; filter it like
    * `transforms/SchemaChangeEventFilter.java`).
    */
  def schemaLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cs = commits()
    val rows = cs.zip(None +: cs.map(Some(_))).collect {
      case (c, prev) if !prev.exists(_.schemaIdx == c.schemaIdx) =>
        (c.version, c.batchId, c.schemaIdx, c.schemas(c.schemaIdx))
    }
    rows.toDF("version", "batchId", "schemaIdx", "schemaJson")
  }

  /** Register an externally-supplied schema into the table's schema
    * history as a METADATA-ONLY commit (no data moves; existing files and
    * fences carry over). The `schema-changes` SIGNAL action analog
    * (`pipeline/signal/actions/SchemaChanges.java:24-80`: user-injected
    * table-change events patch the schema history when DDL was missed) —
    * here the history IS the commit log, so the patch is one commit. The
    * incoming schema reconciles under the additive evolution rules
    * ([[SchemaEvolution.reconcile]] — add/widen only, incompatible changes
    * throw); registering the current schema is a no-op.
    *
    * The patch commit PRESERVES the predecessor's batchId: stamping the
    * in-flight microbatch's id here would make the batchId fence treat
    * that batch's own DATA apply as a replay and silently drop it (the
    * signal is processed before the apply in the same foreachBatch).
    */
  def registerSchema(schemaJson: String): Unit = {
    val incoming = DataType.fromJson(schemaJson) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"schema-changes payload must be a struct schema, got ${other.simpleString}")
    }
    lastCommit() match {
      case None =>
        commit(CommitInfo(version = 1L, batchId = -1L, watermark = Map.empty,
          fence = None, schemas = Seq(incoming.json), schemaIdx = 0, files = Nil))
      case Some(ci) =>
        val evolved = SchemaEvolution.reconcile(ci.schema, incoming)
        if (evolved != ci.schema) {
          val json = evolved.json
          val (schemas, idx) = ci.schemas.indexOf(json) match {
            case -1 => (ci.schemas :+ json, ci.schemas.size)
            case i  => (ci.schemas, i)
          }
          commit(ci.copy(version = ci.version + 1, schemas = schemas, schemaIdx = idx),
            prev = Some(ci))
        }
    }
  }

  /** TIMESTAMP AS OF time travel (Delta/Iceberg timestamp variant): the
    * state at the NEWEST commit whose wall-clock stamp is ≤ `tsMs`. None
    * when no commit is that old (or only pre-stamp commits are). An
    * O(commits) metadata pass — a time-travel query path, not a hot path.
    */
  def snapshotAtTime(spark: SparkSession, tsMs: Long): Option[DataFrame] =
    commits().filter(c => c.tsMs > 0L && c.tsMs <= tsMs).lastOption
      .flatMap(ci => snapshotAt(spark, ci.version))

  /** Delta-style RESTORE: roll the table back to `version` as a NEW
    * metadata-only commit that adopts that version's file set and schema
    * pointer. History is preserved — time travel still reads the undone
    * commits, the change feed shows the restore as ordinary row diffs
    * (version head+1 vs head), and GC keeps the adopted files alive
    * because the new head references them. The head's `batchId` and
    * `watermark` are KEPT (not rewound): a redelivered stream batch that
    * the undone commits had applied stays fenced, so the rollback sticks
    * instead of being silently redone by replay. The truncate `fence`,
    * by contrast, is DATA semantics and restores with the target (a
    * truncate after the target is part of what is being undone — keeping
    * the head's fence would filter the restored rows right back out on
    * merge-on-read reads while leaving them visible on copy-on-write).
    * Restoring across a rebucket boundary adopts the old layout — this
    * handle then fails fast on next use; reopen via [[LakeTable.open]].
    */
  def restore(version: Long): CommitInfo = {
    val head = lastCommit().getOrElse(
      throw new IllegalStateException("restore on an empty table"))
    require(version < head.version,
      s"restore target $version is not before head ${head.version}")
    val target = commits().find(_.version == version).getOrElse(
      throw new IllegalArgumentException(s"no commit at version $version"))
    commit(target.copy(
      version = head.version + 1,
      batchId = head.batchId,
      watermark = head.watermark), prev = Some(head))
  }

  /** Atomically publish a commit. Single-writer (the streaming driver).
    *
    * Incremental manifests: when the predecessor is supplied, the commit
    * FILE stores only the file-set delta (added entries + removed paths) —
    * O(touched buckets), not O(table files) — with a full manifest rolled
    * up every [[LakeTable.FullManifestEvery]] versions to bound the
    * resolution chain (Iceberg manifest-list analog). Keeps the driver's
    * per-batch commit cost flat as the table and the batch count grow.
    */
  def commit(ci0: CommitInfo, prev: Option[CommitInfo] = None): CommitInfo = {
    // Stamp the bucket layout (callers construct CommitInfo without it;
    // rebucket passes the NEW count explicitly) and the wall-clock commit
    // time — ALWAYS now, whatever the caller carried (restore/schema
    // patches copy an old CommitInfo; their commit is still a new event).
    val ci = (if (ci0.numBuckets > 0) ci0 else ci0.copy(numBuckets = numBuckets))
      .copy(tsMs = System.currentTimeMillis())
    val json = prev match {
      case Some(p) if p.version == ci.version - 1 && ci.version % LakeTable.FullManifestEvery != 0 =>
        LakeTable.toDeltaJson(ci, p)
      case _ => LakeTable.toJson(ci)
    }
    // Publish via the store's CAS create — the backend-native
    // compare-and-swap (FileCommitStore: POSIX createLink, which
    // atomically FAILS if the version already exists), so a lost racing
    // writer (two drivers both computing version = head+1) errors loudly
    // instead of silently replacing the winner's commit.
    try store.create(f"v${ci.version}%020d.json", json)
    catch {
      case e: CommitStore.AlreadyExists =>
        throw new java.util.ConcurrentModificationException(
          s"version ${ci.version} was committed concurrently — " +
            "single-writer contract violated (this writer must re-read the head)", e)
    }
    resolved.put(ci.version, ci)
    trimMemo(ci.version)
    ci
  }

  /** Run `f` with Spark's parallel-listing threshold raised so a
    * known-file-list read is listed on the driver (serial getFileStatus
    * calls) instead of spawning a distributed listing job. Restores the
    * session's previous setting afterwards.
    *
    * The set/restore pair is serialized under a global lock: two
    * overlapping flips on one session would otherwise restore each
    * other's raised value and permanently leave the session listing
    * serially (the threshold is session conf; there is no per-read
    * option for it). Unrelated queries planned inside the (small) window
    * still see the raised threshold — acceptable: it only changes WHERE
    * a listing runs, never its result.
    */
  private def withSerialListing[T](spark: SparkSession)(f: => T): T =
    LakeTable.serialListingLock.synchronized {
      val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "1000000")
      try f
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

  /** Raw state incl. tombstone rows (op='d' retained so late out-of-order
    * events below a delete's position cannot resurrect the row).
    */
  def snapshotRaw(spark: SparkSession, buckets: Option[Set[Int]] = None): Option[DataFrame] =
    lastCommit().flatMap(ci => snapshotRaw(spark, ci, buckets))

  def snapshotRaw(spark: SparkSession, ci: CommitInfo, buckets: Option[Set[Int]]): Option[DataFrame] = {
    val wanted = ci.files.filter(f => buckets.forall(_.contains(f.bucket)))
    if (wanted.isEmpty) return None
    val target = ci.schema
    val bydSchema = wanted.groupBy(_.schemaIdx)
    val parts = bydSchema.toSeq.sortBy(_._1).map { case (idx, fs) =>
      val written = DataType.fromJson(ci.schemas(idx)).asInstanceOf[StructType]
      // The manifest already names the exact files — listing them is a
      // getFileStatus per known path, not discovery. Above the default
      // parallel-listing threshold (32 paths) Spark would otherwise launch
      // a DISTRIBUTED LISTING JOB per state read: ~0.3 s of pure
      // scheduling per microbatch here (profiled), and on an object store
      // a whole cluster job to stat files whose names we hold. Force
      // driver-side listing for this read.
      val df = withSerialListing(spark) {
        spark.read.schema(written).parquet(fs.map(f => s"$root/${f.path}"): _*)
      }
      // Align to the current table schema: default- or null-fill added
      // columns (SchemaEvolution.missingFill — a declared DEFAULT reads
      // back for pre-evolution files), upcast widened ones (Avro-style
      // promotion; Parquet mergeSchema alone does not widen types —
      // SURVEY.md §7.3).
      val cols = target.fields.map { f =>
        if (written.fieldNames.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else SchemaEvolution.missingFill(f).as(f.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
    Some(parts.reduce(_.unionAll(_)))
  }

  /** LWW-resolved raw state (tombstones retained). Copy-on-write tables
    * are resolved by construction (a merge rewrote each touched bucket to
    * one winner per key). MERGE-ON-READ tables reduce across each
    * bucket's file stack at read time: apply only appends per-batch
    * winner files (O(batch) apply, zero state scan — the Iceberg MoR
    * pattern), and the read-side reduce is shuffle-FREE through the
    * bucketed scan (its HashPartitioning satisfies the aggregate's
    * required distribution). The truncate fence, burned into the data on
    * the CoW path, applies as a read filter here.
    */
  def resolved(
      spark: SparkSession,
      ci: CommitInfo,
      buckets: Option[Set[Int]] = None,
      isHead: Boolean = true): Option[DataFrame] = {
    if (!mergeOnRead) return snapshotRaw(spark, ci, buckets)
    // Only the HEAD commit reads through the shared bucketed registration:
    // registering an older version would be torn down by the next head
    // read (gcBucketedDirs drops superseded link dirs; the catalog entry
    // is re-pointed), silently breaking lazy frames held by time travel.
    // Historical commits take the layout-independent aligned read — the
    // LWW reduce then shuffles, which is the right trade for a rare
    // time-travel read. Head-ness is the CALLER's knowledge (every caller
    // already resolved the head commit to get `ci`): re-listing _commits
    // here added an O(commits) directory scan to hot paths like lookup()
    // (round-2 ADVICE).
    // Zone-map fence pruning: the fence keeps only rows with
    // commit ≥ fence.commit, so a file whose max(commit) bound is below it
    // holds zero surviving rows — drop it from the read list entirely (no
    // task scheduled). Post-truncate MoR reads then scan O(post-truncate
    // files), not O(stack history), even before compaction physically
    // drops the dead files. Per bucket, one file is kept when pruning
    // would empty it, so Option/emptiness semantics match the unpruned
    // read exactly (the fence row filter still applies either way).
    val scanCi = ci.fence.fold(ci) { f =>
      ci.copy(files = ci.files.groupBy(_.bucket).values.flatMap { fs =>
        val kept = fs.filter(_.stats.get("commit").forall(_._2 >= f.commit))
        if (kept.isEmpty) fs.take(1) else kept
      }.toSeq)
    }
    val raw = (if (isHead) bucketedState(spark, scanCi, buckets, ci.schema) else None)
      .orElse(snapshotRaw(spark, scanCi, buckets))
    raw.map { df =>
      // The struct comparison is the exact fence but does NOT push to
      // parquet; the redundant `commit >= fence.commit` conjunct is
      // implied by it (struct > ⟹ first component ≥) and IS pushable, so
      // row-group/file min-max stats skip everything wholly before the
      // truncate — post-truncate reads scan O(post-truncate data), not
      // O(table history), until compaction physically drops the dead rows.
      val fenced = ci.fence.fold(df)(f =>
        df.where(col("commit") >= lit(f.commit) &&
          struct(col("commit"), col("lsn")) > struct(lit(f.commit), lit(f.lsn))))
      graft.operators.Lww.reduce(fenced, keyCols)
    }
  }

  /** Live rows: tombstones filtered out, ordering/meta columns retained. */
  def snapshot(spark: SparkSession): Option[DataFrame] =
    lastCommit().flatMap(ci => resolved(spark, ci, None))
      .map(_.where(col("op") =!= Envelope.OpDelete))

  /** Time travel (Iceberg `VERSION AS OF` analog): live rows as of a past
    * commit version. Free by construction — every commit is a complete,
    * immutable manifest; data files are only removed by compaction GC, so
    * any retained version resolves exactly like the head did.
    */
  def snapshotAt(spark: SparkSession, version: Long): Option[DataFrame] = {
    val cs = commits()
    val head = cs.lastOption.map(_.version)
    cs.find(_.version == version)
      .flatMap(ci => resolved(spark, ci, None, isHead = head.contains(version)))
      .map(_.where(col("op") =!= Envelope.OpDelete))
  }

  /** Change-data-feed read (Delta CDF / Iceberg changelog-scan analog):
    * the row-level changes the table went through in versions
    * `(fromVersion, toVersion]`, tagged `_change_type`
    * ('insert' | 'delete' | 'update_preimage' | 'update_postimage') and
    * `_commit_version`. The reference exposes the same delta to
    * downstream consumers as the change-event topic itself; on a lake
    * table the feed lets an incremental consumer catch up from any
    * version without replaying the log.
    *
    * Scale shape: one live-state diff per consecutive version pair,
    * MANIFEST-PRUNED — the two commits' file lists name exactly which
    * buckets changed (file-set difference), so a pair touches
    * O(state in changed buckets), never O(table). A small incremental
    * commit on a 100 TB table diffs a few buckets; a compaction or
    * rebucket commit that only rewrote physical layout diffs to empty
    * rows (CDF reports logical changes, not rewrites). Within changed
    * buckets a full-outer join on the key classifies each transition;
    * carried-forward rows (a CoW bucket rewrite rewrites whole buckets)
    * compare equal and drop out. Versions with evolved schemas align to
    * the newest in-range schema (null-fill added, upcast widened), same
    * rules as [[snapshotRaw]].
    */
  def changeFeed(spark: SparkSession, fromVersion: Long, toVersion: Long): Option[DataFrame] = {
    // Materialize ONLY the window: versions are decoded from filenames,
    // and the JSON parse + delta-chain fold happens just for the pair
    // commits in (from, to] and each one's predecessor — a per-microbatch
    // consumer (the streaming view maintainer) stays O(window), not
    // O(total commit history), per call.
    val entries = commitNames()
    if (entries.isEmpty) return None
    def versionOf(n: String): Long = n.stripPrefix("v").stripSuffix(".json").toLong
    val vs = entries.map(versionOf)
    val headV = vs.last
    val idxInRange = vs.indices.filter(i => vs(i) > fromVersion && vs(i) <= toVersion)
    if (idxInRange.isEmpty && !vs.exists(_ <= toVersion)) return None
    val neededIdx: Set[Int] =
      idxInRange.toSet ++ idxInRange.map(_ - 1).filter(_ >= 0) ++
        // the newest commit ≤ toVersion supplies the target schema
        vs.indices.reverse.find(i => vs(i) <= toVersion).toSet
    if (neededIdx.isEmpty) return None
    val byIdx: Map[Int, CommitInfo] = neededIdx.map(i => i -> materialize(entries(i))).toMap
    val target = byIdx(vs.indices.reverse.find(i => vs(i) <= toVersion).get).schema
    val dataCols = target.fieldNames.toSeq
    val valCols = dataCols.filterNot(keyCols.contains)

    def empty: DataFrame =
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), target)
    def align(df: DataFrame): DataFrame = {
      val have = df.schema.fieldNames.toSet
      df.select(target.fields.toIndexedSeq.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else SchemaEvolution.missingFill(f).as(f.name)
      }: _*)
    }
    def live(ci: CommitInfo, buckets: Set[Int]): DataFrame =
      resolved(spark, ci, Some(buckets), isHead = ci.version == headV)
        .map(df => align(df.where(col("op") =!= Envelope.OpDelete)))
        .getOrElse(empty)
    def bucketFiles(ci: CommitInfo): Map[Int, Set[String]] =
      ci.files.groupBy(_.bucket).map { case (b, fs) => b -> fs.map(_.path).toSet }

    // (prev, cur) pairs for every commit version in (from, to]; a commit
    // whose version is the first ever diffs against nothing (all inserts).
    val pairs: Seq[(Option[CommitInfo], CommitInfo)] =
      idxInRange.map(i => (if (i == 0) None else Some(byIdx(i - 1)), byIdx(i)))
    if (pairs.isEmpty) return None

    val perPair = pairs.map { case (prevOpt, cur) =>
      val prevFiles = prevOpt.fold(Map.empty[Int, Set[String]])(bucketFiles)
      val curFiles = bucketFiles(cur)
      val changed = (prevFiles.keySet ++ curFiles.keySet)
        .filter(b => prevFiles.getOrElse(b, Set.empty) != curFiles.getOrElse(b, Set.empty))
      val pre = prevOpt.filter(_ => changed.nonEmpty).fold(empty)(live(_, changed)).as("a")
      val post = (if (changed.nonEmpty) live(cur, changed) else empty).as("b")
      val joinCond = keyCols.map(k => col(s"a.$k") <=> col(s"b.$k")).reduce(_ && _)
      val differs = valCols.map(c => !(col(s"a.$c") <=> col(s"b.$c"))).reduce(_ || _)
      def side(s: String, ct: String) =
        struct(dataCols.map(c => col(s"$s.$c").as(c)) :+ lit(ct).as("_change_type"): _*)
      pre.join(post, joinCond, "full_outer")
        .select(
          when(col(s"a.${keyCols.head}").isNull, array(side("b", "insert")))
            .when(col(s"b.${keyCols.head}").isNull, array(side("a", "delete")))
            .when(differs, array(side("a", "update_preimage"), side("b", "update_postimage")))
            .as("ch"))
        .select(explode(col("ch")).as("c"))
        .select(dataCols.map(c => col(s"c.$c")) :+ col("c._change_type") :+
          lit(cur.version).as("_commit_version"): _*)
    }
    Some(perPair.reduce(_.unionAll(_)))
  }

  /** Point lookup: live row(s) for ONE key, reading only the key's bucket —
    * O(table-size/numBuckets) data touched regardless of table size (the
    * serving-path read; at 100 TB with buckets of a few GB this is one
    * file-stack scan, not a table scan). The bucket is computed driver-side
    * with the same Murmur3 pmod as [[bucketCol]]; within the bucket a
    * key-equality filter (pushed to parquet) selects the row.
    *
    * Option contract: None = PROVABLY absent without any scan — the table
    * is empty, or every file in the key's bucket was excluded by its zone
    * maps (a key outside all bounds cannot exist) or by per-chunk
    * membership evidence (exact dictionary pages / bloom filters — both
    * sound exclusions). Some(df) = the files
    * that may contain the key, filtered; df can still be empty. Callers
    * testing absence must use `forall(_.isEmpty)`-style checks, never
    * `.get` on a possibly-absent key.
    */
  def lookup(spark: SparkSession, key: Seq[Any]): Option[DataFrame] =
    lookupMany(spark, Seq(key))

  /** Batched point lookup: live rows for up to [[LakeTable.MaxLookupKeys]]
    * keys in ONE scan. Keys are bucketed driver-side; within each
    * targeted bucket a file survives only if SOME requested key admits it
    * (zone maps + membership evidence), so the scan reads the union of
    * the keys' admissible files — O(matching files), not O(buckets
    * touched × stack depth) — and buckets no key maps to are never read.
    * The row filter is the OR of per-key conjunctions (pushed to
    * parquet). Same Option contract as [[lookup]]: None = every requested
    * key is provably absent, with zero scan. For key sets beyond the
    * cap, join the table snapshot against a keys DataFrame instead — a
    * driver-side OR of thousands of conjunctions is a plan, not a
    * filter.
    */
  def lookupMany(spark: SparkSession, keys: Seq[Seq[Any]]): Option[DataFrame] = {
    require(keys.nonEmpty, "lookupMany needs at least one key")
    require(keys.size <= LakeTable.MaxLookupKeys,
      s"lookupMany caps at ${LakeTable.MaxLookupKeys} keys — use lookupJoin(spark, keysDf) instead")
    keys.foreach { key =>
      require(key.size == keyCols.size, s"key must match $keyCols")
      require(key.forall(_ != null), "lookup key elements must be non-null")
    }
    lastCommit().flatMap { ci =>
      // Hash with the TABLE's key column types (a caller's Int against a
      // LongType column would otherwise hash 4 bytes where bucketCol hashed
      // 8 — wrong bucket, silently empty result). Literal+Cast evaluates
      // driver-side; seed 42 = the `functions.hash` / HashPartitioning
      // seed, so the bucket equals `bucketCol` exactly. The Cast uses the
      // SESSION timezone — the same zone the row filter below resolves its
      // casts with — so a timestamp/date-typed key hashes and filters
      // consistently under any session TZ (round-2 ADVICE).
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Murmur3Hash}
      val schema = ci.schema
      val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
      def bucketOf(key: Seq[Any]): Int = {
        val exprs = keyCols.zip(key).map { case (c, v) =>
          Cast(Literal(v), schema(c).dataType, Some(sessionTz)): org.apache.spark.sql.catalyst.expressions.Expression
        }
        java.lang.Math.floorMod(
          new Murmur3Hash(exprs).eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Int],
          numBuckets)
      }
      // Per-key file admission = zone maps (range) + membership evidence
      // (dictionary pages / bloom filters — the complement for unsorted
      // MoR stacks whose files all span the key range). Both are
      // driver-side manifest/footer checks, memoized per immutable file,
      // probed only for the key's own bucket stack — never O(manifest).
      // A file without evidence is kept (absence = may contain anything).
      def admits(e: FileEntry, key: Seq[Any]): Boolean = {
        val zone = keyCols.zip(key).forall {
          case (c, s: String) => e.stats.get(c).forall { case (mn, mx) => s >= mn && s <= mx }
          case _              => true
        }
        zone && !membershipExcludes(
          e, keyCols.zip(key).collect { case (c, s: String) => c -> s }.toMap)
      }
      val byBucket: Map[Int, Seq[Seq[Any]]] = keys.groupBy(bucketOf)
      val keep: FileEntry => Boolean = e =>
        byBucket.get(e.bucket).exists(_.exists(k => admits(e, k)))
      val scanCi = ci.copy(files = ci.files.filter(keep))
      // isHead=false: the point lookup must NOT route through the shared
      // bucketed-state registration — its per-key pruned file set would
      // evict the merge path's cached registration (single slot) and pay
      // a DROP/CREATE catalog round trip per lookup. The aligned read +
      // LWW reduce over the pruned stacks is a few small files.
      resolved(spark, scanCi, Some(byBucket.keySet), isHead = false)
        .map(_.where(keys.map(key =>
            keyCols.zip(key).map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))
          .reduce(_ || _))
          .where(col("op") =!= Envelope.OpDelete))
    }
  }

  /** Above-cap batched lookup — the tool [[lookupMany]]'s cap points at
    * (round-3 VERDICT item 6): live rows for an ARBITRARY keys DataFrame
    * (distributed, any size), via a bucket-pruned state semi-join.
    *
    * `keys` must carry exactly the table's key columns (castable types;
    * rows with null key elements are dropped — the engine quarantines
    * null keys, so state cannot hold them). Bucket pruning: each key's
    * bucket is computed EXECUTOR-side with the same Murmur3-pmod as
    * [[bucketCol]] (after casting to the table's key types, so the hash
    * bytes match), and the DISTINCT buckets collected — a bounded
    * ≤ numBuckets-element driver list, independent of key count — so
    * buckets no key maps to are never scanned. Within the touched
    * buckets the LWW-resolved state SEMI-joins the keys frame: only
    * matching live rows survive, nothing from the keys side widens the
    * output, duplicates in `keys` are free. Catalyst/AQE picks the join
    * strategy (a small keys frame broadcasts; a huge one shuffles
    * O(touched buckets' state + keys) — the right cost for a
    * million-key backfill probe).
    *
    * Per-key FILE-level admission (zone maps + membership evidence)
    * needs driver-known key values and does not apply here — at
    * ≤ [[LakeTable.MaxLookupKeys]] keys [[lookupMany]] remains the
    * sharper (zero-scan-capable) tool. Option contract: None = the
    * table is empty or no requested bucket holds any file; Some(df) may
    * still be empty.
    */
  def lookupJoin(spark: SparkSession, keys: DataFrame): Option[DataFrame] = {
    require(keys.columns.sorted.toSeq == keyCols.sorted,
      s"keys frame must carry exactly the key columns $keyCols, got ${keys.columns.toSeq}")
    lastCommit().flatMap { ci =>
      val schema = ci.schema
      val cast = keys.na.drop(keyCols)
        .select(keyCols.map(c => col(c).cast(schema(c).dataType).as(c)): _*)
      val buckets = cast
        .select(pmod(hash(keyCols.map(col): _*), lit(numBuckets)).as("__b"))
        .distinct().collect().map(_.getInt(0)).toSet
      if (buckets.isEmpty) None
      else {
        val scanCi = ci.copy(files = ci.files.filter(f => buckets.contains(f.bucket)))
        // isHead=false for the same reason as lookupMany: a pruned file
        // set must not evict the merge path's shared bucketed-state
        // registration.
        resolved(spark, scanCi, Some(buckets), isHead = false)
          .map(_.where(col("op") =!= Envelope.OpDelete)
            .join(cast, keyCols, "left_semi"))
      }
    }
  }

  /** Per-row-group key-membership evidence of one immutable staged file,
    * loaded from the parquet footer (driver-side metadata reads, no data
    * pages scanned):
    *
    *  - a chunk whose pages are ALL dictionary-encoded yields its
    *    dictionary page as EXACT membership (this is why parquet drops
    *    the bloom there — the dictionary subsumes it);
    *  - otherwise the chunk's bloom filter, when written
    *    ([[bloomKeyNdv]]), yields sound probabilistic exclusion (no
    *    false negatives);
    *  - anything else (legacy files, oversized dictionaries, missing
    *    column) is unknown and must be treated as "may contain anything".
    *
    * Memoized per relative path: files never mutate under a commit, so
    * loaded evidence stays valid for the file's lifetime; the memo is
    * bounded and cleared on overflow, and dictionaries above
    * [[LakeTable.MaxDictProbe]] entries are not materialized (memo memory
    * stays bounded; such chunks fall back to the bloom).
    */
  private sealed trait ChunkEvidence
  private final case class ExactMembers(values: Set[String]) extends ChunkEvidence
  private final case class BloomMembers(bloom: ParquetBloom) extends ChunkEvidence
  private case object UnknownMembers extends ChunkEvidence

  private val evidenceMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Seq[ChunkEvidence]]]()
  private val evidenceMemoBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  private def evidenceBytes(m: Map[String, Seq[ChunkEvidence]]): Long =
    m.valuesIterator.flatten.map {
      case ExactMembers(vs) => vs.iterator.map(_.length * 2L + 40L).sum
      case BloomMembers(bf) => bf.getBitsetSize.toLong
      case UnknownMembers   => 8L
    }.sum

  private def membershipEvidence(rel: String, cols: Set[String]): Map[String, Seq[ChunkEvidence]] = {
    val cached = evidenceMemo.get(rel)
    if (cached != null && cols.subsetOf(cached.keySet)) cached
    else {
      // dictionaries materialized per FILE are capped (the memo bound is
      // BYTES, not entries — a multi-row-group, multi-key file would
      // otherwise hold several near-1MB dictionaries)
      var dictBudget = LakeTable.MaxDictProbe
      val loaded: Map[String, Seq[ChunkEvidence]] =
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(Paths.get(root, rel).toUri), LakeTable.hadoopConf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val fileSchema = r.getFooter.getFileMetaData.getSchema
            val blocks = r.getRowGroups.asScala.toSeq
            cols.map { c =>
              c -> blocks.map { b =>
                b.getColumns.asScala.find(_.getPath.toDotString == c) match {
                  case None => UnknownMembers: ChunkEvidence
                  // evidence is sound only for BINARY (string) chunks: the
                  // probe hashes/compares UTF-8 bytes of the lookup value,
                  // and an int/long chunk (pre-widen legacy files, numeric
                  // keys) hashed that way would "prove" absence of keys
                  // the file holds — the same physical-type gate the zone
                  // maps apply to their stats
                  case Some(cc) if cc.getPrimitiveType.getPrimitiveTypeName !=
                      org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BINARY =>
                    UnknownMembers: ChunkEvidence
                  case Some(cc) =>
                    def bloomOr: ChunkEvidence =
                      Option(r.readBloomFilter(cc)).fold(UnknownMembers: ChunkEvidence)(BloomMembers(_))
                    val es = cc.getEncodingStats
                    val fullDict = es != null && !es.hasNonDictionaryEncodedPages
                    if (!fullDict) bloomOr
                    else {
                      val desc = fileSchema.getColumnDescription(cc.getPath.toArray)
                      val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                        r.getDictionaryReader(b)
                      Option(store.readDictionaryPage(desc)) match {
                        case Some(page) =>
                          val dict = page.getEncoding.initDictionary(desc, page)
                          val n = dict.getMaxId + 1
                          if (n > dictBudget) bloomOr
                          else {
                            dictBudget -= n
                            ExactMembers(
                              (0 until n).map(i => dict.decodeToBinary(i).toStringUsingUTF8).toSet)
                          }
                        case None => bloomOr
                      }
                    }
                }
              }
            }.toMap
          } finally r.close()
        } catch {
          // unreadable footer → no evidence → every probe keeps the file
          case _: Exception => cols.map(c => c -> Seq.empty[ChunkEvidence]).toMap
        }
      // bound the memo by retained BYTES (dictionary sets dominate); a
      // clear resets both counters — evidence reloads on demand
      if (evidenceMemo.size > 512 ||
          evidenceMemoBytes.get() > LakeTable.MaxEvidenceMemoBytes) {
        evidenceMemo.clear()
        evidenceMemoBytes.set(0L)
      }
      // replacement-aware accounting (round-3 ADVICE): a reload with a
      // superset of columns REPLACES the entry — subtract the old entry's
      // bytes and add the new one's, or the counter drifts below reality
      // and the MaxEvidenceMemoBytes bound silently weakens
      val prev = evidenceMemo.put(rel, loaded)
      evidenceMemoBytes.addAndGet(
        evidenceBytes(loaded) - (if (prev == null) 0L else evidenceBytes(prev)))
      loaded
    }
  }

  /** True iff the file PROVABLY lacks the key: some key column has
    * evidence in every row group and every group's evidence excludes the
    * value (exact dictionaries decide membership outright; blooms have no
    * false negatives). Any unknown chunk keeps the file.
    */
  private def membershipExcludes(e: FileEntry, stringKey: Map[String, String]): Boolean =
    stringKey.nonEmpty && {
      val evidence = membershipEvidence(e.path, stringKey.keySet)
      stringKey.exists { case (c, v) =>
        val perGroup = evidence.getOrElse(c, Seq.empty)
        perGroup.nonEmpty && perGroup.forall {
          case ExactMembers(values) => !values.contains(v)
          case BloomMembers(bf) =>
            !bf.findHash(bf.hash(org.apache.parquet.io.api.Binary.fromString(v)))
          case UnknownMembers => false
        }
      }
    }

  // ---------------------------------------------------------------------
  // Storage-partitioned state read (round-2 fix for VERDICT "What's wrong"
  // #3): expose the on-disk hash-bucket layout to Catalyst so the merge
  // shuffles ONLY the batch side. Spark-first mechanism: register the
  // commit's live files as a native BUCKETED external parquet table
  // (`CLUSTERED BY (key) INTO numBuckets BUCKETS`) — the scan then reports
  // `HashPartitioning(keyCols, numBuckets)`, which is by construction the
  // same Murmur3 pmod layout `stage()` wrote, so a key-equi join against a
  // `repartition(numBuckets, key)`-shaped batch plans ZERO extra exchanges.
  // The Iceberg analog is a storage-partitioned join over a bucket
  // partition transform (SPARK-37375).
  // ---------------------------------------------------------------------

  /** Type promotions Spark 4's parquet reader performs natively when the
    * requested schema is wider than the file schema (probed in-sandbox;
    * notably →String is NOT native). Wider promotions fall back to the
    * per-schema-group aligned read ([[snapshotRaw]]).
    */
  private val nativeWiden: Set[(DataType, DataType)] = Set(
    (ByteType, IntegerType), (ShortType, IntegerType), (IntegerType, LongType),
    (IntegerType, DoubleType), (FloatType, DoubleType))

  private def nativelyReadable(written: StructType, target: StructType): Boolean =
    written.fields.forall { wf =>
      target.fields.find(_.name == wf.name).exists { tf =>
        tf.dataType == wf.dataType || nativeWiden((wf.dataType, tf.dataType))
      }
    }

  /** Catalog identifier for this table's state registration (stable per
    * root; re-registered per batch).
    */
  private val catalogName: String =
    "graft_state_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** The commit's live files for `buckets`, as a DataFrame whose scan
    * reports the bucket layout (`Bucketed: true` in explain). Returns None
    * when there are no matching files OR an old file schema needs a
    * non-native widening (rare: a →String widen this commit; the caller
    * falls back to [[snapshotRaw]], and the next merge rewrites touched
    * buckets to the current schema putting it back on the fast path).
    *
    * Mechanics: hardlink the files into `_bucketed/v<version>-<sel>/` under
    * Spark's bucketed-file naming (`..._<bucketId>.parquet` — the reader
    * derives the bucket id from the file name), then register an external
    * bucketed table over that directory. Hardlinks: O(files) driver-side
    * metadata ops, no data copied; the analog of an Iceberg manifest
    * pinning a snapshot's file set.
    */
  def bucketedState(
      spark: SparkSession,
      ci: CommitInfo,
      buckets: Option[Set[Int]],
      readSchema: StructType): Option[DataFrame] = {
    // A commit written under a DIFFERENT bucket layout (pre-rebucket
    // history) cannot be registered against this instance's bucket count —
    // the caller falls back to the layout-independent aligned read.
    if (ci.numBuckets > 0 && ci.numBuckets != numBuckets) return None
    val wanted = ci.files.filter(f => buckets.forall(_.contains(f.bucket)))
    if (wanted.isEmpty) return None
    val compatible = wanted.map(_.schemaIdx).distinct.forall { idx =>
      nativelyReadable(DataType.fromJson(ci.schemas(idx)).asInstanceOf[StructType], readSchema)
    }
    if (!compatible) return None

    // Selection = the exact FILE SET (not just the bucket set): callers
    // may hand a manifest-pruned ci (fence zone maps), and two different
    // prunings of one version must never share a registration. The short
    // hash only names the link DIR; reuse compares the full path list —
    // a truncated-hash collision then re-registers (correct, just
    // unmemoized) instead of silently serving the other pruning's files.
    val selPaths = wanted.map(_.path).sorted
    val sel = f"${selPaths.hashCode & 0xffffff}%06x"
    // Same commit + file set + schema + session as the last registration:
    // the link dir and catalog entry are still valid — skip the O(files)
    // hardlink pass and the DROP/CREATE round trip (SURVEY §9 round-2
    // item: repeated reads of one version, e.g. merge-on-read `resolved`
    // calls, pay the registration once per commit instead of per read).
    val cacheKey = (ci.version, selPaths, readSchema.catalogString, System.identityHashCode(spark))
    val dir = Paths.get(root, "_bucketed", f"v${ci.version}%020d-$sel")
    if (registeredState.contains(cacheKey) && Files.isDirectory(dir) &&
        spark.catalog.tableExists(catalogName)) {
      return Some(spark.table(catalogName))
    }
    registeredState = None
    if (Files.exists(dir)) deleteTree(dir) // leftover from a failed attempt
    Files.createDirectories(dir)
    // Hardlinks are O(files) METADATA ops — the whole point of the
    // registration. If the filesystem refuses them (object store,
    // cross-device _bucketed dir), NEVER fall back to copying data:
    // a silent per-merge copy of every touched bucket is O(state) I/O
    // per microbatch — exactly the amplification the storage-partitioned
    // merge exists to avoid (round-2 VERDICT #1). Warn loudly and return
    // None; the caller takes the union+reduce merge path instead.
    try {
      wanted.zipWithIndex.foreach { case (f, i) =>
        val src = Paths.get(root, f.path)
        val dst = dir.resolve(f"part-$i%05d-graft_${f.bucket}%05d.parquet")
        Files.createLink(dst, src)
      }
    } catch {
      case e: Exception =>
        System.err.println(
          s"[graft] WARN bucketedState: hardlink failed (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}) — skipping the storage-partitioned state read for " +
            s"$root v${ci.version}; callers fall back to the aligned read / " +
            "union+reduce merge. Fix: keep _bucketed on the same device as data/.")
        deleteTree(dir)
        return None
    }
    gcBucketedDirs(keepFrom = ci.version)

    spark.sql(s"DROP TABLE IF EXISTS $catalogName")
    // SORTED BY: with sortedBuckets, stage() wrote every bucket file sorted
    // by the key, and CoW keeps ≤1 file per bucket, so the scan also
    // reports per-bucket outputOrdering — an SMJ against it needs neither
    // an exchange NOR a sort on the state side (SURVEY §9 item 3: trades
    // the SHJ hash-build memory for a one-time sort at write). Scan-side
    // ordering is gated behind a conf (off by default since SPARK-28632
    // because it costs a files-per-bucket check at planning); Spark still
    // independently verifies exactly-one-file-per-bucket before trusting
    // the order, so enabling it is safe — and free for non-sorted tables.
    val sortedClause =
      if (sortedBuckets) {
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        s"SORTED BY (${keyCols.map(k => s"`$k`").mkString(", ")}) "
      } else ""
    spark.sql(
      s"""CREATE TABLE $catalogName (${StructType(readSchema.fields.map(_.copy(nullable = true))).toDDL})
         |USING parquet
         |CLUSTERED BY (${keyCols.map(k => s"`$k`").mkString(", ")}) ${sortedClause}INTO $numBuckets BUCKETS
         |LOCATION '${dir.toAbsolutePath}'""".stripMargin)
    registrations += 1
    registeredState = Some(cacheKey)
    Some(spark.table(catalogName))
  }

  /** Last (version, file set, schema, session) registered as the bucketed
    * external table — see the reuse check in [[bucketedState]].
    */
  @volatile private var registeredState: Option[(Long, Seq[String], String, Int)] = None

  /** Count of bucketed-table registrations actually performed (spec hook). */
  @volatile private[graft] var registrations: Long = 0L

  /** Drop bucketed-link dirs of superseded versions (cheap: link entries
    * only; the data files they point at live under data/ and are governed
    * by the manifest).
    */
  private def gcBucketedDirs(keepFrom: Long): Unit = {
    val base = Paths.get(root, "_bucketed")
    if (!Files.isDirectory(base)) return
    val keep = f"v$keepFrom%020d"
    listDir(base)
      .filter(p => p.getFileName.toString < keep)
      .foreach(deleteTree)
  }

  private def deleteTree(p: Path): Unit = graft.core.Fs.deleteTree(p)

  /** Maintenance compaction (Iceberg rewrite-data-files analog): rewrite
    * every bucket to the CURRENT table schema (old-schema files disappear)
    * and drop delete tombstones at-or-below `tombstoneRetention` — safe
    * once no replay below that position can arrive (the Kafka
    * log-compaction-delay analog of Debezium's tombstone contract,
    * `EventDispatcher.java:546-559`). Metadata (batchId, watermark, fence)
    * is carried over unchanged, so exactly-once fencing is unaffected.
    *
    * The merge path already keeps ≤1 file per bucket (copy-on-write of
    * touched buckets), so this is about tombstone GC + schema
    * canonicalization, not file counts; on a multi-file-per-bucket layout
    * (100 TB: bucket = a directory of size-bounded files) the same
    * repartition-by-key rewrite applies.
    */
  def compact(spark: SparkSession, tombstoneRetention: Option[LogPos] = None): Option[CommitInfo] =
    compactBuckets(spark, (0 until numBuckets).toSet, tombstoneRetention)

  /** Files per bucket in a commit — the MoR stack depth a reader must
    * LWW-reduce across (driver-side manifest fold, no data touched).
    */
  def stackDepths(ci: CommitInfo): Map[Int, Int] =
    ci.files.groupBy(_.bucket).view.mapValues(_.size).toMap

  /** PARTIAL compaction (Iceberg rewrite-data-files-with-filter analog):
    * rewrite only `buckets`, carrying every other bucket's manifest
    * entries over untouched. The rewrite resolves LWW across each
    * selected bucket's file stack and lands one file per bucket at the
    * current table schema; tombstones at-or-below `tombstoneRetention`
    * are dropped in the REWRITTEN buckets only. At 100 TB this is the
    * difference between a maintenance pass sized to the hot buckets and
    * one sized to the table.
    */
  def compactBuckets(
      spark: SparkSession,
      buckets: Set[Int],
      tombstoneRetention: Option[LogPos] = None): Option[CommitInfo] =
    lastCommit().flatMap { ci =>
      resolved(spark, ci, Some(buckets).filter(_.size < numBuckets)).map { df =>
        val pruned = tombstoneRetention.fold(df) { p =>
          df.where(col("op") =!= Envelope.OpDelete ||
            struct(col("commit"), col("lsn")) > struct(lit(p.commit), lit(p.lsn)))
        }
        val laid0 = pruned.repartition(numBuckets, keyCols.map(col): _*)
        // Clustered rewrite (Iceberg sort-order rewrite analog): with
        // size-bounded multi-file buckets, maxRecordsPerFile splits each
        // partition SEQUENTIALLY — sorting the partition by key first
        // gives the bucket's files disjoint key ranges, so the manifest
        // zone maps prune a point lookup to ~one file per stack instead
        // of admitting every split file. Order never affects correctness
        // (bucket membership and LWW are order-independent); skipped when
        // no consumer of the order exists — single-file buckets have
        // whole-bucket bounds regardless. (sortedBuckets sorts in stage()
        // and is mutually exclusive with maxFileRows per the constructor
        // require, so this branch is the only sorting writer here.)
        val laid =
          if (maxFileRows > 0) laid0.sortWithinPartitions(keyCols.map(col): _*)
          else laid0
        val staged = stage(laid, ci.batchId, ci.schemaIdx, attempt = ci.version + 1)
        val untouched = ci.files.filterNot(f => buckets.contains(f.bucket))
        val next = ci.copy(version = ci.version + 1, files = untouched ++ staged)
        commit(next, prev = Some(ci))
        next
      }
    }

  /** Depth-TRIGGERED stack maintenance (SURVEY §9 round-3 item): compact
    * only the buckets whose file stack exceeds `maxDepth`, bounding the
    * read-side LWW fan-in of a merge-on-read table while rewriting the
    * minimum set of buckets. No-op (None) when every stack is shallow.
    * Scheduling: the single-writer invariant (one commit log) means
    * maintenance serializes with applies — [[graft.merge.CdcApply]] runs
    * it between microbatches when [[autoCompactDepth]] > 0, which on a
    * cluster is exactly where Structured Streaming foreachBatch puts
    * table maintenance.
    */
  def compactDeepBuckets(
      spark: SparkSession,
      maxDepth: Int,
      tombstoneRetention: Option[LogPos] = None): Option[CommitInfo] =
    lastCommit().flatMap { ci =>
      val deep = stackDepths(ci).collect { case (b, d) if d > maxDepth => b }.toSet
      if (deep.isEmpty) None else compactBuckets(spark, deep, tombstoneRetention)
    }

  /** Snapshot EXPIRY (Iceberg `expire_snapshots` analog): drop all but the
    * last `keepLast` commits from the log and DELETE every data file no
    * retained manifest references. Time travel below the new horizon is
    * gone (that is the point — bounded history, bounded storage); the head
    * and everything at-or-above the horizon resolve unchanged. Returns
    * (commits dropped, data files deleted).
    *
    * Single-writer like compaction (run in the between-batch maintenance
    * slot). The horizon commit is rewritten as a FULL manifest first when
    * it was a delta (its base may be expiring), so retained history never
    * dangles. Driver cost: O(retained manifests + files) metadata; data
    * deletion is one pass over unreferenced paths.
    */
  // ---------------------------------------------------------------------
  // Named refs (Iceberg tag analog): a tag pins a commit version under a
  // human name, time travel resolves it, and snapshot expiry will not
  // drop a tagged version (nor the manifest chain needed to read it —
  // commits are incremental, so retention is a horizon clamp, never a
  // hole). Refs are tiny JSON files under `_refs/`, written atomically;
  // they are METADATA about the commit log, so no data path changes.
  // ---------------------------------------------------------------------

  private def refsDir: Path = Paths.get(root, "_refs")
  private val refName = "[A-Za-z0-9][A-Za-z0-9._-]*".r

  /** Refs go through the SAME storage seam as the commit log (round-5
    * review finding: a non-file backend otherwise left retention-affecting
    * metadata — the tagged-version expiry clamp reads [[tags]] — on local
    * disk where other hosts cannot see it). With an injected backend the
    * entries live alongside the commits, namespaced `ref_<name>.json`
    * (the commit-name filter `v\d+\.json` cannot collide); the file
    * default keeps its own `_refs/` directory.
    */
  private val refsStore: CommitStore = commitStore.getOrElse(new FileCommitStore(refsDir))
  private def refEntry(name: String): String = s"ref_$name.json"

  /** Pin `version` under `name`. Tags are immutable by default — retagging
    * an existing name requires `replace = true` (the Iceberg
    * replace-tag distinction).
    */
  def tag(name: String, version: Long, replace: Boolean = false): Unit = {
    require(refName.matches(name), s"invalid tag name '$name'")
    require(commitVersions().contains(version), s"no commit at version $version")
    val json = s"""{"name":"$name","version":$version,"tsMs":${System.currentTimeMillis()}}"""
    if (replace) refsStore.replace(refEntry(name), json)
    else
      try refsStore.create(refEntry(name), json)
      catch {
        case e: CommitStore.AlreadyExists =>
          throw new IllegalArgumentException(
            s"requirement failed: tag '$name' exists (use replace = true)", e)
      }
  }

  def tags(): Map[String, Long] =
    refsStore.listNames()
      .filter(n => n.startsWith("ref_") && n.endsWith(".json"))
      .map { n =>
        val o = LakeTable.mapper.readTree(refsStore.read(n))
        o.get("name").asText() -> o.get("version").asLong()
      }.toMap

  def dropTag(name: String): Boolean = {
    // same validation as tag(): a separator-bearing name would resolve
    // outside the ref namespace and delete arbitrary json (e.g. a commit)
    require(refName.matches(name), s"invalid tag name '$name'")
    val existed = refsStore.listNames().contains(refEntry(name))
    refsStore.delete(refEntry(name))
    existed
  }

  /** Time travel by name: `VERSION AS OF '<tag>'`. */
  def snapshotAtTag(spark: SparkSession, name: String): Option[DataFrame] =
    tags().get(name).flatMap(v => snapshotAt(spark, v))

  def expireSnapshots(keepLast: Int = 1): (Int, Int) = {
    require(keepLast >= 1, "must retain at least the head commit")
    val names = commitNames()
    // Tagged versions clamp the expiry horizon: everything from the oldest
    // tag forward is retained, so a tag keeps its commit readable (and the
    // incremental-manifest chain above it intact) for as long as it lives.
    val vOf: String => Long =
      n => "v(\\d+)".r.findFirstMatchIn(n).get.group(1).toLong
    val taggedFloor = tags().values.minOption
    val keepCount = taggedFloor match {
      case Some(fl) => math.max(keepLast, names.count(n => vOf(n) >= fl))
      case None     => keepLast
    }
    if (names.size <= keepCount) return (0, 0)
    val (drop, keep) = names.splitAt(names.size - keepCount)
    // Materialize the horizon commit and persist it as a full manifest so
    // it no longer depends on an expiring base (atomic replace — readers
    // may resolve commits concurrently).
    val horizon = materialize(keep.head)
    store.replace(keep.head, LakeTable.toJson(horizon))
    val retained: Set[String] =
      keep.map(materialize).flatMap(_.files.map(_.path)).toSet
    val dropped = drop.map(materialize)
    val dead = dropped.flatMap(_.files.map(_.path)).toSet -- retained
    // Commit entries FIRST, data second: a crash in between leaves orphan
    // data (cleaned by removeOrphanFiles) — never a resolvable commit
    // pointing at deleted parquet.
    drop.foreach(store.delete)
    dead.foreach(p => Files.deleteIfExists(Paths.get(root, p)))
    resolved.clear() // memo may hold expired versions
    (drop.size, dead.size)
  }

  /** Orphan-file cleanup (Iceberg `remove_orphan_files` analog): delete
    * data files under `data/` that NO commit references — leftovers of
    * crashed writers and failed/speculative task attempts, which the
    * atomic-commit protocol makes invisible but not free. Only touches
    * files older than `olderThanMs` (default 0 = everything), the same
    * in-flight-writer guard as the reference procedure. Returns the
    * number of files deleted.
    */
  def removeOrphanFiles(olderThanMs: Long = 0L): Int = {
    val dataDir = Paths.get(root, "data")
    if (!Files.isDirectory(dataDir)) return 0
    val referenced: Set[String] = commitNames().map(materialize)
      .flatMap(_.files.map(_.path)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    var n = 0
    val walk = Files.walk(dataDir)
    val orphans =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
        .filter(p => !referenced.contains(Paths.get(root).relativize(p).toString))
        .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
        .toSeq
      finally walk.close()
    orphans.foreach { p => Files.deleteIfExists(p); n += 1 }
    // drop now-empty batch dirs (cosmetic; keeps the layout readable)
    listDir(dataDir).foreach { d =>
      if (Files.isDirectory(d) && listDir(d).isEmpty) Files.deleteIfExists(d)
    }
    n
  }

  /** Bucket-layout EVOLUTION (Iceberg `REPLACE PARTITION FIELD bucket(N,k)`
    * analog): rewrite the whole table into `newNumBuckets` hash buckets and
    * record the new layout in the commit — the 100 TB answer to "the
    * original bucket count is now too small" (buckets should stay a few GB;
    * a table that grew 100× needs more of them, not bigger ones). One
    * repartition of the resolved state (the same single-shuffle shape as a
    * full compaction), full manifest, exactly-once metadata carried over.
    *
    * Returns a NEW LakeTable bound to the new layout; THIS instance's
    * `bucketCol` no longer matches the table, so its next read fails fast
    * ([[validateLayout]]) instead of silently mis-bucketing. Single-writer:
    * run it in the between-batch maintenance slot like compaction.
    */
  def rebucket(spark: SparkSession, newNumBuckets: Int): Option[LakeTable] =
    lastCommit().flatMap { ci =>
      resolved(spark, ci, None).map { df =>
        val next = new LakeTable(root, newNumBuckets, keyCols, mergeOnRead,
          sortedBuckets, autoCompactDepth, maxFileRows, bloomKeyNdv, writerOptions)
        val laid = df.repartition(newNumBuckets, keyCols.map(col): _*)
        val staged = next.stage(laid, ci.batchId, ci.schemaIdx, attempt = ci.version + 1)
        next.commit(ci.copy(version = ci.version + 1, files = staged,
          numBuckets = newNumBuckets))
        next
      }
    }

  /** Stage a DataFrame under data/, returning the manifest entries.
    *
    * CONTRACT: the input must be laid out one-partition-per-bucket —
    * physical partition id == `pmod(hash(repo, path), numBuckets)` — which
    * is exactly what `Lww.reducePartitioned(_, numBuckets)` produces
    * (Spark's HashPartitioning partition-id expression IS the bucket
    * function). The bucket of each file is then recovered from its
    * `part-NNNNN` index, so the write is a plain parquet write: no
    * `partitionBy` dynamic-partition commit (a per-bucket driver-side
    * rename pass that serializes the batch tail), no bucket column stored.
    *
    * Executors write the files; only the driver publishes the manifest, so
    * task retries/speculation leave orphans that readers never see. Empty
    * partitions write no file → absent buckets simply have no entry.
    */
  def stage(df: DataFrame, batchId: Long, schemaIdx: Int, attempt: Long = 0L): Seq[FileEntry] = {
    val dir = f"data/b$batchId%06d-a$attempt"
    val abs = s"$root/$dir"
    // sortedBuckets: each bucket file is written key-sorted (a narrow
    // per-partition sort — the bucket layout is untouched) so the bucketed
    // scan can declare SORTED BY. When the input is already key-ordered
    // (e.g. the output of a sort-merge join), Catalyst's EliminateSorts
    // drops this node.
    val out = if (sortedBuckets) df.sortWithinPartitions(keyCols.map(col): _*) else df
    // maxFileRows > 0: size-bounded files per bucket (SURVEY §9 round-3
    // item — at 100 TB one bucket is many GB; one multi-GB parquet file
    // per bucket makes every downstream task, retry, and compaction move
    // that whole file). Spark splits a partition's write at the row bound
    // into part-NNNNN-…-c000/c001/… files that all keep the partition
    // index — so the partition-id==bucket contract, the manifest, and the
    // bucketed-state registration (which already reads multi-file buckets
    // for MoR stacks) are unchanged; there are just ≥1 entries per bucket.
    // writerOptions first, engine-owned options after (engine wins).
    val writerU = writerOptions.foldLeft(out.write) { case (w, (k, v)) => w.option(k, v) }
    val writer0 = if (maxFileRows > 0) writerU.option("maxRecordsPerFile", maxFileRows) else writerU
    // bloomKeyNdv > 0: every staged file carries a parquet BLOOM FILTER
    // per key column (standard parquet metadata, written by the normal
    // writer — no second pass over the data). Zone maps prune by RANGE,
    // which is blind inside an unsorted merge-on-read stack whose files
    // all span the full key range; per-chunk membership evidence answers
    // the orthogonal question — which keys a file CANNOT contain. For
    // dictionary-encoded chunks that evidence is free (the dictionary
    // page, exact — parquet deliberately drops the bloom there); the
    // bloom covers the dictionary-FALLBACK regime, i.e. files whose
    // per-chunk key cardinality outgrew the dictionary page. [[lookup]]
    // probes both driver-side, and executor scans additionally skip
    // whole row groups for the pushed key-equality filter (parquet-mr
    // dictionary/bloom row-group filtering, on by default).
    // `ndv` sizes the filter for the expected distinct keys PER FILE.
    val writer = if (bloomKeyNdv > 0) {
      keyCols.filter(c => df.schema.fieldNames.contains(c)).foldLeft(writer0) { (w, c) =>
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", bloomKeyNdv.toString)
      }
    } else writer0
    writer.mode("overwrite").parquet(abs)
    val part = "part-(\\d{5})".r
    val staged: Seq[(String, Int, Path)] = listDir(Paths.get(abs))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .flatMap { p =>
        val rel = Paths.get(root).relativize(p).toString
        part.findFirstMatchIn(p.getFileName.toString).map(m => (rel, m.group(1).toInt, p))
      }
    // Footer reads in PARALLEL on the driver: done serially they are
    // ~20 ms × numBuckets of pure driver time BETWEEN the write job and
    // the commit — a serial stage per microbatch that Amdahl-caps the
    // measured core-count scaling (profiled: ~1.3 s of the ~1.4 s
    // post-write driver gap at 64 buckets). The pool is shared and
    // daemon-threaded (one per JVM, like [[LakeTable.hadoopConf]]):
    // creating/tearing down a pool per microbatch is thread churn on the
    // exact driver hot path this parallelism exists to shorten.
    // Zone-map columns: the key + ordering (fence) string columns. Stats
    // come from the SAME footer open as the row count — metadata only.
    val statsCols: Set[String] =
      (keyCols :+ "commit").distinct.filter { c =>
        df.schema.fields.exists(f => f.name == c && f.dataType == StringType)
      }.toSet
    val futs = staged.map { case (rel, idx, p) =>
      (rel, idx, LakeTable.footerPool.submit(
        new java.util.concurrent.Callable[(Long, Map[String, (String, String)])] {
          override def call(): (Long, Map[String, (String, String)]) = fileMeta(p, statsCols)
        }))
    }
    futs.map { case (rel, idx, f) =>
      val (rows, stats) = f.get()
      FileEntry(rel, idx, schemaIdx, rows, stats)
    }
  }

  /** Exact row count + per-column zone maps from the parquet FOOTER
    * (metadata-only — no data read). The row count lets the merge choose
    * its physical path from exact state-vs-batch cardinality; the zone
    * maps let reads prune whole files driver-side (fence lower bounds,
    * point-lookup key ranges) before any task is scheduled. A column's
    * bounds are kept only when every row group has non-null stats and the
    * extremes survive [[LakeTable.boundMin]]/[[LakeTable.boundMax]]
    * (ASCII + truncation soundness). Uses the shared
    * [[LakeTable.hadoopConf]]: constructing a Configuration per file is
    * the dominant cost of a footer read.
    */
  private def fileMeta(p: Path, statsCols: Set[String]): (Long, Map[String, (String, String)]) =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), LakeTable.hadoopConf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val rows = r.getRecordCount
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        val stats = statsCols.flatMap { c =>
          val perBlock = blocks.map(_.getColumns.asScala
            .find(_.getPath.toDotString == c).map(_.getStatistics))
          val usable = perBlock.nonEmpty && perBlock.forall(o =>
            o.exists(s => s != null && !s.isEmpty && s.hasNonNullValue))
          if (!usable) None
          else {
            val vals = perBlock.map(_.get).map { s =>
              (s.genericGetMin, s.genericGetMax) match {
                case (mn: org.apache.parquet.io.api.Binary, mx: org.apache.parquet.io.api.Binary) =>
                  Some((mn.toStringUsingUTF8, mx.toStringUsingUTF8))
                case _ => None
              }
            }
            if (vals.exists(_.isEmpty)) None
            else for {
              mn <- LakeTable.boundMin(vals.flatten.map(_._1).min)
              mx <- LakeTable.boundMax(vals.flatten.map(_._2).max)
            } yield c -> (mn, mx)
          }
        }.toMap
        (rows, stats)
      } finally r.close()
    } catch { case _: Exception => (-1L, Map.empty) }
}

/** Explicit tree-model JSON codec for the commit log (Jackson's Scala
  * binding erases Map key/value types; the commit file is the table's
  * source of truth, so the codec is deliberately explicit).
  */
object LakeTable {
  private val mapper = new ObjectMapper()

  /** One shared read-only Hadoop conf for footer reads (XML parsing per
    * `new Configuration()` costs more than the read itself).
    */
  private[table] lazy val hadoopConf = new org.apache.hadoop.conf.Configuration()

  /** Shared daemon pool for driver-side parquet-footer reads (see
    * [[LakeTable.stage]]). Daemon threads so an idle pool never blocks
    * JVM exit.
    */
  private[table] lazy val footerPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      math.max(4, math.min(16, Runtime.getRuntime.availableProcessors())),
      (r: Runnable) => {
        val t = new Thread(r, "graft-footer-read")
        t.setDaemon(true)
        t
      })

  /** Zone-map bound truncation (Iceberg truncate(16) analog, 64 chars).
    * Only pure-ASCII strings produce bounds — there Java string order,
    * UTF-16 order and parquet's unsigned-UTF-8 stats order coincide, so
    * driver-side comparisons against the bounds are sound (see
    * [[FileEntry.stats]]). A lower bound may be prefix-truncated as-is
    * (a prefix is ≤ the original); an upper bound must round UP: keep the
    * prefix with its last incrementable char bumped and the tail dropped
    * — strictly greater than every string sharing the prefix. None = no
    * sound bound exists; the caller stores no stat for the column.
    */
  private[graft] val BoundLen = 64

  /** Largest dictionary (distinct values per column chunk) the membership
    * probe will materialize as an exact set — above this the chunk falls
    * back to its bloom filter, keeping the per-file evidence memo bounded.
    */
  private[graft] val MaxDictProbe = 32768

  /** Driver-heap ceiling for memoized membership evidence (bytes,
    * estimated) — dictionary sets dominate; the memo clears and reloads
    * on demand past this.
    */
  private[graft] val MaxEvidenceMemoBytes = 64L << 20

  /** Cap on [[LakeTable.lookupMany]] batch size — beyond this the OR-of-
    * conjunctions filter stops being a pushdown and the right tool is
    * [[LakeTable.lookupJoin]]'s bucket-pruned state semi-join against
    * the keys DataFrame.
    */
  val MaxLookupKeys = 1024
  private[graft] def boundMin(s: String): Option[String] =
    if (s.exists(_ >= 0x80)) None else Some(s.take(BoundLen))
  private[graft] def boundMax(s: String): Option[String] =
    if (s.exists(_ >= 0x80)) None
    else if (s.length <= BoundLen) Some(s)
    else {
      val t = s.substring(0, BoundLen).toCharArray
      var i = t.length - 1
      while (i >= 0 && t(i) >= 0x7e) i -= 1 // keep the bumped char ASCII
      if (i < 0) None
      else { t(i) = (t(i) + 1).toChar; Some(new String(t, 0, i + 1)) }
    }

  /** Serializes [[withSerialListing]] conf flips (see its doc). */
  private[table] val serialListingLock = new Object

  /** Open an existing table, ADOPTING the bucket layout recorded in its
    * commit log (safe across [[LakeTable.rebucket]] evolutions — a
    * hardcoded count would fail validation after one).
    */
  def open(
      root: String,
      keyCols: Seq[String] = Envelope.keyCols,
      mergeOnRead: Boolean = false,
      sortedBuckets: Boolean = false,
      autoCompactDepth: Int = 0,
      maxFileRows: Long = 0L,
      bloomKeyNdv: Int = 0,
      writerOptions: Map[String, String] = Map.empty): LakeTable = {
    val dir = Paths.get(root, "_commits")
    require(Files.isDirectory(dir), s"no commit log at $root")
    val listing = Files.list(dir)
    val last =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.matches("v\\d+\\.json"))
        .toSeq.sortBy(_.getFileName.toString).lastOption
        .getOrElse(throw new IllegalStateException(s"empty commit log at $root"))
      finally listing.close()
    val n = parse(Files.readString(last)) match {
      case Right(full) => full.numBuckets
      case Left(d)     => d.numBuckets
    }
    require(n > 0, s"commit log at $root predates bucket-layout tracking")
    new LakeTable(root, n, keyCols, mergeOnRead, sortedBuckets, autoCompactDepth, maxFileRows,
      bloomKeyNdv, writerOptions)
  }

  /** Full-manifest roll-up period: a commit whose version is a multiple of
    * this always stores the complete file list, bounding the delta chain a
    * reader must fold.
    */
  val FullManifestEvery = 16

  /** On-disk delta form of a commit (file-set change vs `base`). */
  final case class DeltaCommit(
      version: Long,
      batchId: Long,
      watermark: Map[Int, Long],
      fence: Option[LogPos],
      schemas: Seq[String],
      schemaIdx: Int,
      base: Long,
      added: Seq[FileEntry],
      removedPaths: Set[String],
      numBuckets: Int = 0,
      tsMs: Long = 0L)

  /** Parse a commit file: Right = full manifest, Left = delta. */
  def parse(s: String): Either[DeltaCommit, CommitInfo] = {
    val o = mapper.readTree(s)
    if (o.has("delta")) Left(fromDeltaJson(o)) else Right(fromJson(s))
  }

  def toDeltaJson(ci: CommitInfo, prev: CommitInfo): String = {
    val prevByPath = prev.files.map(f => f.path -> f).toMap
    val added = ci.files.filterNot(f => prevByPath.contains(f.path))
    val curPaths = ci.files.map(_.path).toSet
    val removed = prev.files.map(_.path).filterNot(curPaths.contains)
    val o = mapper.createObjectNode()
    o.put("version", ci.version)
    o.put("batchId", ci.batchId)
    val wm = o.putObject("watermark")
    ci.watermark.toSeq.sortBy(_._1).foreach { case (p, l) => wm.put(p.toString, l) }
    ci.fence match {
      case Some(f) =>
        val fn = o.putObject("fence"); fn.put("commit", f.commit); fn.put("lsn", f.lsn)
      case None => o.putNull("fence")
    }
    val ss = o.putArray("schemas")
    ci.schemas.foreach(ss.add)
    o.put("schemaIdx", ci.schemaIdx)
    o.put("numBuckets", ci.numBuckets)
    o.put("tsMs", ci.tsMs)
    val d = o.putObject("delta")
    d.put("base", prev.version)
    val fs = d.putArray("added")
    added.foreach(f => putFile(fs.addObject(), f))
    val rm = d.putArray("removed")
    removed.foreach(rm.add)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  private def fromDeltaJson(o: JsonNode): DeltaCommit = {
    def arr(n: JsonNode): Iterator[JsonNode] = n.asInstanceOf[ArrayNode].elements().asScala
    val wm = o.get("watermark").asInstanceOf[ObjectNode]
    val watermark = wm.fields().asScala.map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
    val fence = Option(o.get("fence")).filterNot(_.isNull)
      .map(f => LogPos(f.get("commit").asText(), f.get("lsn").asLong()))
    val d = o.get("delta")
    DeltaCommit(
      version = o.get("version").asLong(),
      batchId = o.get("batchId").asLong(),
      watermark = watermark,
      fence = fence,
      schemas = arr(o.get("schemas")).map(_.asText()).toSeq,
      schemaIdx = o.get("schemaIdx").asInt(),
      base = d.get("base").asLong(),
      added = arr(d.get("added")).map(readFile).toSeq,
      removedPaths = arr(d.get("removed")).map(_.asText()).toSet,
      numBuckets = Option(o.get("numBuckets")).map(_.asInt()).getOrElse(0),
      tsMs = Option(o.get("tsMs")).map(_.asLong()).getOrElse(0L))
  }

  def toJson(ci: CommitInfo): String = {
    val o = mapper.createObjectNode()
    o.put("version", ci.version)
    o.put("batchId", ci.batchId)
    val wm = o.putObject("watermark")
    ci.watermark.toSeq.sortBy(_._1).foreach { case (p, l) => wm.put(p.toString, l) }
    ci.fence match {
      case Some(f) =>
        val fn = o.putObject("fence"); fn.put("commit", f.commit); fn.put("lsn", f.lsn)
      case None => o.putNull("fence")
    }
    val ss = o.putArray("schemas")
    ci.schemas.foreach(ss.add)
    o.put("schemaIdx", ci.schemaIdx)
    o.put("numBuckets", ci.numBuckets)
    o.put("tsMs", ci.tsMs)
    val fs = o.putArray("files")
    ci.files.foreach(f => putFile(fs.addObject(), f))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  private def putFile(fo: ObjectNode, f: FileEntry): Unit = {
    fo.put("path", f.path); fo.put("bucket", f.bucket)
    fo.put("schemaIdx", f.schemaIdx); fo.put("rows", f.rows)
    if (f.stats.nonEmpty) {
      val st = fo.putObject("stats")
      f.stats.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
        val a = st.putArray(c); a.add(mn); a.add(mx)
      }
    }
  }

  private def readFile(f: JsonNode): FileEntry = {
    val stats = Option(f.get("stats")).collect { case o: ObjectNode =>
      o.fields().asScala.map { e =>
        val a = e.getValue.asInstanceOf[ArrayNode]
        e.getKey -> (a.get(0).asText(), a.get(1).asText())
      }.toMap
    }.getOrElse(Map.empty[String, (String, String)])
    FileEntry(f.get("path").asText(), f.get("bucket").asInt(),
      f.get("schemaIdx").asInt(), f.get("rows").asLong(), stats)
  }

  def fromJson(s: String): CommitInfo = {
    val o = mapper.readTree(s)
    def arr(n: JsonNode): Iterator[JsonNode] = n.asInstanceOf[ArrayNode].elements().asScala
    val wm = o.get("watermark").asInstanceOf[ObjectNode]
    val watermark = wm.fields().asScala.map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
    val fence = Option(o.get("fence")).filterNot(_.isNull)
      .map(f => LogPos(f.get("commit").asText(), f.get("lsn").asLong()))
    CommitInfo(
      version = o.get("version").asLong(),
      batchId = o.get("batchId").asLong(),
      watermark = watermark,
      fence = fence,
      schemas = arr(o.get("schemas")).map(_.asText()).toSeq,
      schemaIdx = o.get("schemaIdx").asInt(),
      files = arr(o.get("files")).map(readFile).toSeq,
      numBuckets = Option(o.get("numBuckets")).map(_.asInt()).getOrElse(0),
      tsMs = Option(o.get("tsMs")).map(_.asLong()).getOrElse(0L))
  }
}
