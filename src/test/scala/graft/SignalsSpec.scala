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

    // backfill snapshot: 9 keys; chunk membership = KEY RANGES (the
    // ChunkBoundaryCalculator analog — the signal handler re-clusters the
    // source once into __chunk=N range dirs, so each chunk read prunes to
    // its own slice)
    val snapRows = (0 until 9)
      .map(i => (s"snap$i", s"f$i.txt", "c0000000001", "scala", s"backfill $i"))
      .toDF("repo", "path", "commit", "lang", "content")
    val snapPath = s"$sigDir/snap.parquet"
    snapRows.write.parquet(snapPath)
    def applied(): Set[String] =
      table.snapshot(spark).map(_.where(col("repo").startsWith("snap"))
        .select("repo").as[String].collect().toSet).getOrElse(Set.empty)

    runBatch() // baseline stream only
    assert(applied() === Set.empty)

    Signals.send(channel, Signals.SignalRecord("s1", Signals.ExecuteSnapshot, s"$snapPath#3"))
    runBatch() // consumes the signal (stages the range layout) AND applies chunk 0
    // membership from the staged layout itself (it is the contract)
    val chunkOf = spark.read.parquet(s"$channel.snapshot-staged")
      .select(col("repo"), col("__chunk").cast("int").as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(chunkOf.values.toSet === Set(0, 1, 2), "all three range chunks populated")
    // range semantics: chunks are contiguous key slices — max(key) of chunk
    // i precedes min(key) of chunk i+1
    val ordered = chunkOf.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    (0 until 2).foreach(i => assert(ordered(i).max < ordered(i + 1).min,
      s"chunk $i must be a key range below chunk ${i + 1}"))
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

    // Notification feed (NotificationService analog): the whole lifecycle
    // is visible — started, chunk progress, pause/resume, abort; COMPLETED
    // never fires for a stopped snapshot.
    import graft.sources.Notifications
    val notes = Notifications.feed(spark, table.root)
      .select(col("type"), col("chunk"), col("rows_applied")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val types = notes.map(_._1)
    assert(types.count(_ == Notifications.Started) === 1)
    assert(types.contains(Notifications.Paused) && types.contains(Notifications.Resumed))
    assert(types.count(_ == Notifications.Aborted) === 1)
    assert(!types.contains(Notifications.Completed), "stopped snapshot must not claim completion")
    val progress = notes.filter(_._1 == Notifications.InProgress)
    assert(progress.map(_._2).sorted === Seq(0, 1), "progress rows for exactly chunks 0 and 1")
    progress.foreach { case (_, c, rows) =>
      assert(rows === chunkOf.count(_._2 == c).toLong, s"chunk $c rows_applied")
    }
  }

  test("execute-snapshot additional-conditions restrict the backfill (ExecuteSnapshot.java:61-70)") {
    val inDir = tmp(); val ckpt = tmp(); val sigDir = tmp()
    val channel = s"$sigDir/signals.jsonl"
    val table = new LakeTable(tmp(), numBuckets = 4)
    var tick = 0L
    def runBatch(): Unit = {
      tick += 1
      val ev = Seq(FlatEvent.mk(("repoT", "tick.txt"), tick, "u")).toDF()
      graft.core.Envelope.wrap(ev).coalesce(1).write.mode("append").parquet(inDir)
      CdcPipeline.start(spark, inDir, ckpt, table, signalChannel = Some(channel)).awaitTermination()
    }
    val snapRows = (0 until 9)
      .map(i => (s"snap$i", s"f$i.txt", "c0000000001", if (i % 2 == 0) "scala" else "java", s"backfill $i"))
      .toDF("repo", "path", "commit", "lang", "content")
    val snapPath = s"$sigDir/snap.parquet"
    snapRows.write.parquet(snapPath)
    def applied(): Set[String] =
      table.snapshot(spark).map(_.where(col("repo").startsWith("snap"))
        .select("repo").as[String].collect().toSet).getOrElse(Set.empty)

    // conditioned + range-chunked: the condition applies BEFORE staging,
    // so the 2-chunk train backfills only the scala rows
    Signals.send(channel, Signals.SignalRecord("c1", Signals.ExecuteSnapshot,
      s"$snapPath#2##lang = 'scala' AND repo >= 'snap2'"))
    runBatch(); runBatch() // stage + chunk 0, then chunk 1
    assert(applied() === Set("snap2", "snap4", "snap6", "snap8"),
      "only rows matching the additional condition may backfill")
    assert(Signals.snapshotState(channel).isEmpty, "train drained")

    // conditioned single-chunk (no staging path): condition on the read
    Signals.send(channel, Signals.SignalRecord("c2", Signals.ExecuteSnapshot,
      s"$snapPath#1##repo = 'snap1'"))
    runBatch()
    assert(applied() === Set("snap1", "snap2", "snap4", "snap6", "snap8"))
  }

  test("surrogate-key staging (key:<col>) range-clusters by a non-PK column; missing column fails loudly") {
    val inDir = tmp(); val ckpt = tmp(); val sigDir = tmp()
    val channel = s"$sigDir/signals.jsonl"
    val table = new LakeTable(tmp(), numBuckets = 4)
    var tick = 0L
    def runBatch(): Unit = {
      tick += 1
      val ev = Seq(FlatEvent.mk(("repoT", "tick.txt"), tick, "u")).toDF()
      graft.core.Envelope.wrap(ev).coalesce(1).write.mode("append").parquet(inDir)
      CdcPipeline.start(spark, inDir, ckpt, table, signalChannel = Some(channel)).awaitTermination()
    }
    // content sorts OPPOSITE to the PK (repo): surrogate ranges must follow
    // content order, not key order — proves the staging really keys on it
    val snapRows = (0 until 9)
      .map(i => (s"snap$i", s"f$i.txt", "c0000000001", "scala", s"v${8 - i} backfill"))
      .toDF("repo", "path", "commit", "lang", "content")
    val snapPath = s"$sigDir/snap.parquet"
    snapRows.write.parquet(snapPath)
    Signals.send(channel, Signals.SignalRecord("k1", Signals.ExecuteSnapshot,
      s"$snapPath#3#key:content"))
    runBatch() // stage by surrogate range + apply chunk 0
    val staged = spark.read.parquet(s"$channel.snapshot-staged")
      .select(col("content"), col("__chunk").cast("int").as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(staged.values.toSet === Set(0, 1, 2), "all three surrogate range chunks populated")
    val ordered = staged.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    (0 until 2).foreach(i => assert(ordered(i).max < ordered(i + 1).min,
      s"chunk $i must be a content range below chunk ${i + 1}"))
    runBatch(); runBatch() // drain chunks 1..2
    assert(table.snapshot(spark).get.where(col("repo").startsWith("snap")).count() === 9L,
      "surrogate-chunked backfill covers every row exactly once")

    // reference: a surrogate key naming a non-existent column is a config
    // error, not a silent PK fallback (AbstractChunkQueryBuilder.java:264-269)
    Signals.send(channel, Signals.SignalRecord("k2", Signals.ExecuteSnapshot,
      s"$snapPath#3#key:no_such_col"))
    val err = intercept[Exception] { runBatch() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("no_such_col")), s"got: ${messages(err)}")
  }

  test("schema-changes signal patches the schema history; incompatible payloads fail loudly") {
    import org.apache.spark.sql.types._
    val inDir = tmp(); val ckpt = tmp(); val sigDir = tmp()
    val channel = s"$sigDir/signals.jsonl"
    val table = new LakeTable(tmp(), numBuckets = 4)
    var tick = 0L
    def runBatch(): Unit = {
      tick += 1
      val ev = Seq(FlatEvent.mk(("repoT", "tick.txt"), tick, "u")).toDF()
      graft.core.Envelope.wrap(ev).coalesce(1).write.mode("append").parquet(inDir)
      CdcPipeline.start(spark, inDir, ckpt, table, signalChannel = Some(channel)).awaitTermination()
    }
    runBatch() // establish the table schema
    val before = table.lastCommit().get
    // patch: add a nullable int column the stream has never carried
    val patched = StructType(before.schema.fields :+ StructField("review_score", IntegerType))
    Signals.send(channel, Signals.SignalRecord("sc1", Signals.SchemaChanges, patched.json))
    runBatch()
    val after = table.lastCommit().get
    assert(after.schema.fieldNames.contains("review_score"),
      "schema history patched by the signal")
    // regression: the patch commit must NOT stamp the in-flight batch's id
    // — that would batchId-fence the same batch's own data apply and drop it
    assert(table.snapshot(spark).get.where(col("path") === "tick.txt")
      .select("content").as[String].head().endsWith("@2"),
      "the signal batch's own data events still apply after the schema patch")
    assert(after.files.map(_.path) === before.files.map(_.path) ||
      table.snapshot(spark).get.count() >= 1, "metadata patch moved no data")
    // old rows read back null-filled under the patched schema
    assert(table.snapshot(spark).get.where(col("review_score").isNull).count() ===
      table.snapshot(spark).get.count())
    // schemaLog shows the patch as a schema-change event
    val log = table.schemaLog(spark).orderBy("version").collect()
    assert(log.length >= 2 && log.last.getAs[String]("schemaJson").contains("review_score"))
    // re-registering the SAME schema is a no-op commit-wise
    val v = table.lastCommit().get.version
    table.registerSchema(patched.json)
    assert(table.lastCommit().get.version === v, "idempotent re-registration")
    // an incompatible change (a numeric column to boolean — outside the
    // widening chain and not string-absorbable) is a loud error
    val numeric = before.schema.fields.find(f => f.dataType != StringType).get
    val bad = StructType(before.schema.fields.map(f =>
      if (f.name == numeric.name) f.copy(dataType = BooleanType) else f))
    Signals.send(channel, Signals.SignalRecord("sc2", Signals.SchemaChanges, bad.json))
    val err = intercept[Exception] { runBatch() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("incompatible")), s"got: ${messages(err)}")
  }

  test("byte-based admission (maxBytesPerTrigger) streams and converges") {
    val inDir = tmp(); val ckpt = tmp()
    val table = new LakeTable(tmp(), numBuckets = 4)
    val evs = (1 to 40).map(i => FlatEvent.mk((s"r${i % 5}", s"f${i % 7}.txt"), i.toLong, "u"))
    graft.core.Envelope.wrap(evs.toDF()).repartition(8).write.mode("overwrite").parquet(inDir)
    // byte cap REPLACES the file cap (Spark's file source rejects both)
    CdcPipeline.start(spark, inDir, ckpt, table, maxBytesPerTrigger = Some("10000"))
      .awaitTermination()
    val got = table.snapshot(spark).get.count()
    assert(got === evs.map(e => (e.repo, e.path)).distinct.size.toLong)
  }

  test("snapshot state roundtrips values with backslashes, quotes, newlines") {
    // regression: chained-replace unescaping turned a literal
    // backslash+n (e.g. inside a regex chunkExpr) into a newline
    val channel = java.nio.file.Files.createTempDirectory("graft-sig-esc")
      .resolve("ch").toString
    val nasty = Seq(
      """pmod(hash(path), 4)""",
      """regexp_like(path, 'a\nb')""", // literal \ then n
      "quote\" and \\ and\nnewline",
      """trailing backslash \""",
      """","chunks":9,"next":0""") // field-delimiter lookalike
    nasty.foreach { s =>
      Signals.initSnapshot(channel, data = s, chunks = 3, staged = s, expr = s, cond = s)
      val st = Signals.snapshotState(channel).get
      assert(st.data === s, "data")
      assert(st.staged === s, "staged")
      assert(st.expr === s, "expr")
      assert(st.cond === s, "cond")
      Signals.clearSnapshot(channel)
    }
  }
}
