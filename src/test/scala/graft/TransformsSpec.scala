package graft

import org.apache.spark.sql.functions._
import graft.core.Envelope
import graft.operators.{Lww, Transforms}

/** SMT semantics (SURVEY.md §2.2), mirroring the reference's
  * BinlogConnectorIT scenario names where applicable.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    // (repo, path, commit, lang, content, op, part, lsn, ts_ms)
    ("r1", "a", "c01", "en", "v1", "c", 0, 1L, 1000L),
    ("r1", "a", "c02", "en", "v2", "u", 0, 2L, 2000L),
    ("r1", "b", "c03", "fr", "w1", "c", 1, 3L, 3000L),
    ("r1", "b", "c04", "fr", null, "d", 1, 4L, 4000L),
    ("r2", "a", "c05", "de", "x1", "r", 0, 5L, 5000L)
  ).toDF("repo", "path", "commit", "lang", "content", "op", "part", "lsn", "ts_ms")

  test("skipOperations drops configured ops (shouldEmitNoEventsForSkippedCreateOperations)") {
    val out = Transforms.skipOperations(log, Seq("c")).select("op").as[String].collect()
    assert(!out.contains("c") && out.length === 3)
  }

  test("mask/hash/truncate column mappers") {
    val masked = Transforms.maskColumn(log, "content").select("content").as[String].collect()
    assert(masked.toSet === Set("***", null))
    val hashed = Transforms.hashColumn(log, "lang", "s1")
      .select("lang").as[String].collect()
    assert(hashed.forall(h => h.length === 64))
    // deterministic + salted
    val again = Transforms.hashColumn(log, "lang", "s1").select("lang").as[String].collect()
    assert(hashed.sameElements(again))
    val trunc = Transforms.truncateColumn(log, "content", 1).select("content").as[String].collect()
    assert(trunc.filter(_ != null).forall(_.length === 1))
  }

  test("projectColumns keeps meta cols, applies include/exclude") {
    val out = Transforms.projectColumns(log, exclude = Seq("content"))
    assert(out.columns.toSet === Set("repo", "path", "commit", "lang", "op", "part", "lsn", "ts_ms"))
    val only = Transforms.projectColumns(log, include = Some(Seq("repo", "path")))
    assert(only.columns.toSet === Set("repo", "path", "op", "part", "lsn", "ts_ms"))
  }

  test("readToInsert rewrites r to c only") {
    val ops = Transforms.readToInsert(log).select("op").as[String].collect().sorted
    assert(ops.count(_ == "c") === 3 && !ops.contains("r"))
  }

  test("enforceRecordSize drops oversized payloads") {
    val out = Transforms.enforceRecordSize(log, col("content"), maxBytes = 1)
    // "v1","v2","w1","x1" are 2 bytes -> dropped; null passes the guard
    assert(out.count() === 1)
  }

  test("partitionRouting is stable and in range") {
    val a = Transforms.partitionRouting(log, Seq("repo", "path"), 4).select("__partition").as[Int].collect()
    val b = Transforms.partitionRouting(log, Seq("repo", "path"), 4).select("__partition").as[Int].collect()
    assert(a.sameElements(b) && a.forall(p => p >= 0 && p < 4))
    // same key -> same partition
    val byKey = Transforms.partitionRouting(log, Seq("repo", "path"), 4)
      .groupBy("repo", "path").agg(countDistinct("__partition").as("n"))
      .select("n").as[Long].collect()
    assert(byKey.forall(_ === 1L))
  }

  test("stableRoute matches a hand-computed md5 char-sum") {
    val route = log.limit(1)
      .select(Transforms.stableRoute(lit("k1"), 16).as("r")).as[Long].head()
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("k1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(route === md5hex.map(_.toLong).sum % 16)
  }

  test("emitTombstones: delete followed by null-payload marker; reducer drops it (shouldEmitTombstoneOnDeleteByDefault)") {
    val out = Transforms.emitTombstones(log)
    assert(out.count() === 6)
    val tomb = out.where(col("op") === Envelope.OpTombstone).collect()
    assert(tomb.length === 1)
    val t = tomb.head
    assert(t.getAs[String]("repo") === "r1" && t.getAs[String]("path") === "b")
    assert(t.getAs[String]("content") == null && t.getAs[String]("lang") == null)
    // LWW apply ignores tombstones: r1/b stays deleted, nothing resurrected
    val state = Lww.applyState(out)
    assert(state.where(col("repo") === "r1" && col("path") === "b").count() === 0)
    assert(state.count() === 2)
  }

  test("byLogicalTableRouter collapses shards and keeps discriminator") {
    val out = Transforms.byLogicalTableRouter(log, col("repo"), "[0-9]+", "")
    val rows = out.select("__logical_table", "__shard").distinct().as[(String, String)].collect().toSet
    assert(rows === Set(("r", "r1"), ("r", "r2")))
  }

  test("changedFields lists null-safe differing fields, sorted") {
    val env2 = Seq(
      ("c01", "en", "v1", "c02", "en", "v2"),
      ("c03", "fr", null, "c03", "fr", null)
    ).toDF("bc", "bl", "bv", "ac", "al", "av")
      .select(
        struct(lit("r1").as("repo"), lit("a").as("path"), col("bc").as("commit"), col("bl").as("lang"), col("bv").as("content")).as("before"),
        struct(lit("r1").as("repo"), lit("a").as("path"), col("ac").as("commit"), col("al").as("lang"), col("av").as("content")).as("after"))
    val out = env2.select(Transforms.changedFields(env2).as("ch")).as[String].collect()
    assert(out.toSet === Set("commit,content", ""))
  }

  test("contentBasedRouter + filterExpr (scripting SMT analogs)") {
    val routed = Transforms.contentBasedRouter(log, "concat('sink_', lang)", "route")
    assert(routed.where(col("route") === "sink_en").count() === 2)
    assert(Transforms.filterExpr(log, "lsn > 3").count() === 2)
  }

  test("reselectColumns patches placeholder values from sink state (ReselectColumnsPostProcessor)") {
    val state = Seq(("r1", "a", "live-a"), ("r1", "b", "live-b"))
      .toDF("repo", "path", "content")
    val events = Seq(
      ("r1", "a", "__toast__"), // placeholder -> patched from state
      ("r1", "b", "fresh"),     // real value -> kept
      ("r9", "z", "__toast__")  // no state row -> null
    ).toDF("repo", "path", "content")
    val out = Transforms.reselectColumns(events, state, Seq("content"), "__toast__")
      .select("repo", "path", "content").as[(String, String, String)].collect().toSet
    assert(out === Set(("r1", "a", "live-a"), ("r1", "b", "fresh"), ("r9", "z", null)))
  }

  test("headerToValue copies map headers into value columns") {
    val df = log.withColumn("headers", map(lit("db"), lit("repos"), lit("l"), col("lang")))
    val out = Transforms.headerToValue(df, Seq("db", "l"), drop = true)
    assert(!out.columns.contains("headers"))
    assert(out.select("db").distinct().as[String].collect().toSeq === Seq("repos"))
    assert(out.where(col("l") === col("lang")).count() === 5)
  }

  test("extractSchemaToNewRecord adds column-type metadata") {
    val out = Transforms.extractSchemaToNewRecord(log, Seq("content", "lsn"))
    assert(out.select("__content_type").distinct().as[String].head() === "STRING")
    assert(out.select("__lsn_type").distinct().as[String].head() === "BIGINT")
  }

  test("vectorToJson renders fixed-point JSON arrays") {
    val df = Seq((1L, Seq(0.1234f, -1.5f, 0f))).toDF("id", "v")
    val out = df.select(Transforms.vectorToJson(col("v")).as("j")).as[String].head()
    assert(out === "[123,-1500,0]")
  }

  test("sink insert/update modes (JdbcSinkConnectorConfig.insert_mode)") {
    // insert: every upsert-op event survives as its own row
    val ins = merge.SinkModes.insert(log)
    assert(ins.count() === 4 && ins.where(col("op") === "d").count() === 0)
    // update: only keys already in state; new keys dropped
    val state = Seq(("r1", "a")).toDF("repo", "path")
    val upd = merge.SinkModes.update(log, state)
    assert(upd.select("repo", "path").as[(String, String)].collect().toSet === Set(("r1", "a")))
    // the winner for (r1,a) is the lsn=2 update
    assert(upd.select("lsn").as[Long].head() === 2L)
  }

  test("sink primary-key modes derive the upsert key (primary.key.mode + fields)") {
    import merge.SinkModes
    assert(SinkModes.primaryKeyCols("record_key") === Seq("repo", "path"))
    assert(SinkModes.primaryKeyCols("record_key", fields = Seq("repo")) === Seq("repo"))
    assert(SinkModes.primaryKeyCols("record_value", fields = Seq("repo", "lang")) === Seq("repo", "lang"))
    assert(SinkModes.primaryKeyCols("kafka") === Seq("part", "lsn"))
    assert(SinkModes.primaryKeyCols("none") === Nil)
    assertThrows[IllegalArgumentException](SinkModes.primaryKeyCols("record_value"))
    assertThrows[IllegalArgumentException](SinkModes.primaryKeyCols("bogus"))
    // unknown primary.key.fields are a config error, not a silent
    // intersect (an emptied key set would degrade upsert to insert)
    assertThrows[IllegalArgumentException](
      SinkModes.primaryKeyCols("record_key", fields = Seq("repoo")))
    // record_value keyed on (repo, lang): (r1,en) collapses to the lsn=2
    // winner; (r1,fr) keeps its create (the delete is not an upsert op)
    val byValue = SinkModes.upsertKeyed(log, "record_value", fields = Seq("repo", "lang"))
    assert(byValue.count() === 3)
    assert(byValue.where(col("repo") === "r1" && col("lang") === "en")
      .select("lsn").as[Long].head() === 2L)
    // kafka mode: transport coordinates are unique — nothing collapses
    assert(SinkModes.upsertKeyed(log, "kafka").count() === 4)
    // none: keyless append (insert semantics)
    assert(SinkModes.upsertKeyed(log, "none").count() === 4)
  }

  test("outbox additional fields route into value/header/envelope placements") {
    val outbox = Seq(
      ("order", "41", "OrderCreated", "{}", "c", 1L, 1000L, 7L, "eu"),
      ("order", "42", "OrderCreated", "{}", "d", 2L, 2000L, 8L, "us") // delete: filtered
    ).toDF("aggregatetype", "aggregateid", "event_type", "payload", "op", "lsn", "ts_ms",
      "n_items", "region")
    val routed = Transforms.outboxRouter(outbox, additionalFields = Seq(
      ("n_items", "value"), ("region", "header"), ("region", "envelope")))
    assert(routed.count() === 1)
    val r = routed.head()
    assert(r.getAs[Long]("n_items") === 7L)
    assert(r.getAs[Map[String, String]]("headers") === Map("region" -> "eu"))
    assert(r.getAs[org.apache.spark.sql.Row]("additional").getAs[String]("region") === "eu")
    assertThrows[IllegalArgumentException](
      Transforms.outboxRouter(outbox, additionalFields = Seq(("region", "nowhere"))))
  }

  test("cloud event serialization is a valid CloudEvents-shaped JSON string") {
    val ce = log.select(Transforms.toCloudEvent(Seq("repo", "path", "commit", "lang")).as("j"))
      .as[String].head()
    assert(ce.startsWith("""{"id":"graft-""") && ce.contains(""""specversion":"1.0""""))
    assert(ce.contains(""""data":{"repo":"r1""""))
  }

  test("convertTimezones honors include/exclude field lists (TimezoneConverter)") {
    val df = Seq((1700000000000L, 1700000000000L, 1700000000000L))
      .toDF("ts_ms", "ts_created", "other")
    val out = Transforms.convertTimezones(df, "America/New_York", exclude = Seq("ts_created"))
    assert(out.schema("ts_ms").dataType.typeName === "timestamp")
    assert(out.schema("ts_created").dataType.typeName === "long", "excluded field untouched")
    assert(out.schema("other").dataType.typeName === "long", "non-ts field untouched by default list")
    val inc = Transforms.convertTimezones(df, "UTC", include = Some(Seq("other")))
    assert(inc.schema("other").dataType.typeName === "timestamp")
    assert(inc.schema("ts_ms").dataType.typeName === "long", "include list overrides the default set")
  }

  test("transactionEvents: interleaved BEGIN/END markers with per-event tx block") {
    val ev = Transforms.transactionEvents(log, (col("lsn") / 10).cast("long"), col("repo")).cache()
    val perTx = ev.groupBy("tx_id").agg(
      sum(when(col("kind") === "begin", 1).otherwise(0)).as("b"),
      sum(when(col("kind") === "end", 1).otherwise(0)).as("e"),
      sum(when(col("kind") === "event", 1).otherwise(0)).as("n"),
      max(when(col("kind") === "end", col("event_count"))).as("cnt")).collect()
    perTx.foreach { r =>
      assert(r.getAs[Long]("b") === 1L && r.getAs[Long]("e") === 1L)
      assert(r.getAs[Long]("cnt") === r.getAs[Long]("n"), "END carries the event count")
    }
    // total_order is dense 1..n per tx
    val orders = ev.where(col("kind") === "event").groupBy("tx_id")
      .agg(max("total_order").as("mx"), count(lit(1)).as("n"), min("total_order").as("mn")).collect()
    orders.foreach(r => assert(r.getAs[Long]("mx") === r.getAs[Long]("n") && r.getAs[Long]("mn") === 1L))
  }

  test("guardrails: violations fail at bootstrap unless warnOnly") {
    import graft.core.Guardrails
    val g = Guardrails(maxTables = 2)
    assertThrows[IllegalStateException] {
      Guardrails.validate(g, Seq("a" -> 4, "b" -> 4, "c" -> 4))
    }
    val warnings = Guardrails.validate(g.copy(warnOnly = true), Seq("a" -> 4, "b" -> 4, "c" -> 4))
    assert(warnings.size === 1)
    assert(Guardrails.validate(g, Seq("a" -> 4, "b" -> 4)) === Nil)
    assertThrows[IllegalStateException] {
      new merge.MultiTable.Registry(
        java.nio.file.Files.createTempDirectory("guard").toString,
        Seq(merge.MultiTable.TableDef("x", numBuckets = 999999)))
    }
  }

  test("tableFilter include/exclude on envelope source.table") {
    val env = core.Envelope.wrap(log)
    assert(Transforms.tableFilter(env, include = Some("repo_.*")).count() === 5)
    assert(Transforms.tableFilter(env, exclude = Some("repo_.*")).count() === 0)
  }

  test("decodeMessageContent: JSON content becomes a structured after, op becomes c") {
    val msgs = Seq(
      ("m", 1L, """{"aggregatetype":"en","aggregateid":"r1","event_type":"t","payload":"p"}"""),
      ("u", 2L, """{"x":1}""") // not a message event — routed away
    ).toDF("op", "lsn", "json")
      .select(col("op"), col("lsn"),
        struct(lit("outbox").as("prefix"), col("json").cast("binary").as("content")).as("message"))
    val out = Transforms.decodeMessageContent(msgs,
      "aggregatetype string, aggregateid string, event_type string, payload string")
    assert(out.columns.toSeq === Seq("lsn", "op", "after"), "message dropped, after added")
    val r = out.collect()
    assert(r.length === 1, "non-message ops are not decoded here (route them separately)")
    assert(r(0).getAs[String]("op") === "c", "decoded record looks like an INSERT")
    assert(r(0).getAs[org.apache.spark.sql.Row]("after").getAs[String]("aggregateid") === "r1")

    // FAILFAST mirrors the reference's DebeziumException on junk content
    val junk = Seq(("m", 3L)).toDF("op", "lsn")
      .select(col("op"), col("lsn"),
        struct(lit("x").as("prefix"), lit("not json").cast("binary").as("content")).as("message"))
    intercept[Exception] {
      Transforms.decodeMessageContent(junk, "a string").collect()
    }
    val lenient = Transforms.decodeMessageContent(junk, "a string", failOnError = false).collect()
    assert(lenient.length === 1 &&
      lenient(0).getAs[org.apache.spark.sql.Row]("after").getAs[String]("a") == null,
      "PERMISSIVE decodes junk to an all-null struct instead of throwing")
  }

  test("naming styles match the reference's documented examples") {
    assert(Transforms.toSnakeCase("camelCaseName") === "camel_case_name")
    assert(Transforms.toSnakeCase("NameWith123Numbers") === "name_with_123_numbers")
    assert(Transforms.toSnakeCase("123NumbersExample") === "123_numbers_example")
    assert(Transforms.toSnakeCase("dotted.name") === "dotted_name")
    assert(Transforms.toCamelCase("snake_case_name") === "snakeCaseName")
    assert(Transforms.toCamelCase("dotted.name") === "dottedName")
    assert(Transforms.toCamelCase("__x__") === "x")
  }

  test("avro name adjustment: invalid chars to _ or _uXXXX; leading digit invalid") {
    assert(Transforms.adjustAvroName("a-b c", "avro") === "a_b_c")
    assert(Transforms.adjustAvroName("a-b", "avro_unicode") === "a_u002db")
    assert(Transforms.adjustAvroName("9lives", "avro") === "_lives")
    assert(Transforms.adjustAvroName("x9", "avro") === "x9", "non-leading digits are valid")
    assert(Transforms.adjustAvroName("a-b", "none") === "a-b")
  }

  test("renameFields: style+prefix+suffix+avro, original name kept as metadata, collisions fail") {
    import graft.core.SourceMetadata
    val df = Seq((1L, "x")).toDF("eventId", "pay.load")
    val out = Transforms.renameFields(df, style = "snake_case", prefix = "c_", avroMode = "avro")
    assert(out.columns.toSeq === Seq("c_event_id", "c_pay_load"))
    assert(SourceMetadata.sourceNameOf(out.schema("c_event_id")) === Some("eventId"))
    // chained rename keeps the FIRST origin
    val again = Transforms.renameFields(out, style = "UPPER_CASE")
    assert(again.columns.toSeq === Seq("C_EVENT_ID", "C_PAY_LOAD"))
    assert(SourceMetadata.sourceNameOf(again.schema("C_EVENT_ID")) === Some("eventId"))
    intercept[IllegalArgumentException] {
      Transforms.renameFields(Seq((1, 2)).toDF("a_b", "aB"), style = "snake_case")
    }
  }

  test("activateTracingSpan: traceparent header, context propagation, pass-through rules") {
    // row lsn=1 carries an application span context; lsn=2 does not;
    // lsn=9 is a non-CDC message event and must pass through untouched.
    val appTrace = "0123456789abcdef0123456789abcdef"
    val appSpan = "00f067aa0ba902b7"
    val ctx = s"#written by the app\ntraceparent=00-$appTrace-$appSpan-01\n"
    val ev = Seq(
      ("r1", "a", "c01", "c", 1L, 1000L, ctx),
      ("r1", "b", "c02", "u", 2L, 2000L, null),
      ("r1", "c", "c03", "m", 9L, 9000L, null)
    ).toDF("repo", "path", "commit", "op", "lsn", "ts_ms", "tracingspancontext")

    val traced = Transforms.activateTracingSpan(ev)
    val byLsn = traced.select(col("lsn"), element_at(col("headers"), "traceparent"))
      .as[(Long, String)].collect().toMap
    // propagated context keeps the application's trace id
    assert(byLsn(1L).startsWith(s"00-$appTrace-"))
    assert(byLsn(1L).matches("00-[0-9a-f]{32}-[0-9a-f]{16}-01"))
    // no context: a new deterministic trace rooted at the log position
    assert(byLsn(2L) != null && !byLsn(2L).contains(appTrace))
    // deterministic across runs (speculative-task safety)
    val again = Transforms.activateTracingSpan(ev)
      .select(col("lsn"), element_at(col("headers"), "traceparent"))
      .as[(Long, String)].collect().toMap
    assert(byLsn === again)
    // non-CDC event: untraced
    assert(byLsn(9L) == null)
    // requireContextField: only the context-carrying row is traced
    val strict = Transforms.activateTracingSpan(ev, requireContextField = true)
      .select(col("lsn"), element_at(col("headers"), "traceparent"))
      .as[(Long, String)].collect().toMap
    assert(strict(1L) != null && strict(2L) == null)

    // span feed: two spans per traced event, child under parent, and the
    // db-log-write span parents to the propagated application span.
    val spans = Transforms.tracingSpans(ev)
    assert(spans.count() === 4)
    val s1 = spans.where(col("lsn") === 1).collect()
      .map(r => r.getAs[String]("operation") ->
        (r.getAs[String]("span_id"), r.getAs[String]("parent_span_id"),
          r.getAs[String]("trace_id"))).toMap
    assert(s1("db-log-write")._2 === appSpan)
    assert(s1("db-log-write")._3 === appTrace)
    assert(s1("debezium-read")._2 === s1("db-log-write")._1, "processing span is the child")
    val s2 = spans.where(col("lsn") === 2 && col("operation") === "db-log-write").head()
    assert(s2.getAs[String]("parent_span_id") == null, "no context: root span")
  }
}
