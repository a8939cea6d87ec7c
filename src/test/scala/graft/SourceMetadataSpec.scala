package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SourceMetadata
import graft.core.SourceMetadata.SourceColumn

/** Source-column metadata propagation (PropagateSourceMetadataToSchema-
  * Parameter analog) and the sink-side type-resolution consumer.
  */
class SourceMetadataSpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq((1L, "signup", "alpha", 12.5), (2L, "purchase", "beta", 3.25))
      .toDF("id", "kind", "tag", "amount")

  private val catalog = Map(
    "id" -> SourceColumn("bigserial"),
    "kind" -> SourceColumn("varchar", length = 6, comment = "event kind"),
    "amount" -> SourceColumn("numeric", length = 10, scale = 2))

  test("propagate attaches upper-cased type + length/scale/comment/name metadata") {
    val out = SourceMetadata.propagate(base, catalog)
    val kind = out.schema("kind")
    assert(kind.metadata.getString(SourceMetadata.TypeKey) === "VARCHAR")
    assert(kind.metadata.getLong(SourceMetadata.LengthKey) === 6L)
    assert(!kind.metadata.contains(SourceMetadata.ScaleKey), "unset scale omitted")
    assert(kind.metadata.getString(SourceMetadata.CommentKey) === "event kind")
    assert(kind.metadata.getString(SourceMetadata.NameKey) === "kind")
    assert(out.schema("tag").metadata === base.schema("tag").metadata,
      "uncatalogued column untouched")
    val sc = SourceMetadata.sourceOf(out.schema("amount")).get
    assert(sc.typeName === "NUMERIC" && sc.lengthOpt === Some(10) && sc.scaleOpt === Some(2))
  }

  test("columnMatch / propagateByType restrict which columns are tagged") {
    val only = SourceMetadata.propagate(base, catalog, columnMatch = Seq("k.*"))
    assert(SourceMetadata.sourceOf(only.schema("kind")).isDefined)
    assert(SourceMetadata.sourceOf(only.schema("id")).isEmpty)

    val byType = SourceMetadata.propagateByType(base, catalog, Seq("NUMERIC", "DECIMAL"))
    assert(SourceMetadata.sourceOf(byType.schema("amount")).isDefined)
    assert(SourceMetadata.sourceOf(byType.schema("kind")).isEmpty)
  }

  test("metadata survives renames and projections; source_name keeps the origin") {
    val out = SourceMetadata.propagate(base, catalog)
      .withColumnRenamed("kind", "event_kind")
      .select("event_kind", "amount")
      .where(col("amount") > 0)
    assert(SourceMetadata.sourceOf(out.schema("event_kind")).map(_.typeName) === Some("VARCHAR"))
    assert(SourceMetadata.sourceNameOf(out.schema("event_kind")) === Some("kind"),
      "original source column name rides through the rename")
  }

  test("sinkType: propagated length/precision win; Spark-type fallback otherwise") {
    val out = SourceMetadata.propagate(base, catalog)
    def st(n: String) = SourceMetadata.sinkType(out.schema(n))
    assert(st("kind") === "VARCHAR(6)")
    assert(st("amount") === "DECIMAL(10,2)")
    assert(st("id") === "BIGINT", "BIGSERIAL is neither char nor decimal -> Spark fallback")
    assert(st("tag") === "TEXT")
    val noLen = SourceMetadata.propagate(base, Map("tag" -> SourceColumn("text")))
    assert(SourceMetadata.sinkType(noLen.schema("tag")) === "TEXT",
      "character type without declared length -> unbounded TEXT")
  }

  test("describe audits declared VARCHAR lengths in one pass") {
    val rep = SourceMetadata.describe(SourceMetadata.propagate(base, catalog))
      .collect().map(r => r.getAs[String]("col_name") ->
        (Option(r.getAs[String]("source_type")), r.getAs[String]("sink_type"),
          r.getAs[Long]("len_violations"))).toMap
    assert(rep.keySet === Set("id", "kind", "tag", "amount"))
    assert(rep("kind") === ((Some("VARCHAR"), "VARCHAR(6)", 1L)), "'purchase' exceeds 6")
    assert(rep("tag") === ((None, "TEXT", 0L)))
    assert(rep("amount")._3 === 0L, "non-character columns never audited")
  }

  test("describe with no audited columns still reports every column") {
    val rep = SourceMetadata.describe(base)
    assert(rep.count() === 4)
    assert(rep.where(col("len_violations") =!= 0).count() === 0)
  }

  test("columns literally named a.b resolve by exact name, not struct access") {
    val dotted = Seq(("x", "toolong")).toDF("id", "payload")
      .withColumnRenamed("payload", "pay.load")
    val out = SourceMetadata.propagate(dotted, Map("pay.load" -> SourceColumn("varchar", length = 4)))
    assert(SourceMetadata.sourceOf(out.schema("pay.load")).map(_.typeName) === Some("VARCHAR"))
    val rep = SourceMetadata.describe(out).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("len_violations")).toMap
    assert(rep("pay.load") === 1L, "'toolong' exceeds 4 — audited through the quoted reference")
    assert(rep("id") === 0L)
  }

  // ---- CustomConverter SPI analog (ColumnConverters) ----

  import graft.core.ColumnConverters
  import graft.core.ColumnConverters.{Registration, byDeclaredType, byName}

  test("column converter chain: first registration wins, unmatched columns pass through") {
    val tagged = SourceMetadata.propagate(base, catalog)
    val out = ColumnConverters.convert(tagged, "db.events", Seq(
      // claims `kind` (declared VARCHAR) — wins over the byName below
      byDeclaredType("VARCHAR")(_ => Registration(StringType, v => upper(v))),
      byName("db\\.events\\.kind")(_ => Registration(StringType, v => lower(v))),
      // numeric → rounded long, with the source-type fact rewritten
      byDeclaredType("NUMERIC|DECIMAL")(_ =>
        Registration(LongType, v => round(v).cast("long"), sourceType = Some("BIGINT")))))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("kind")).toSeq === Seq("SIGNUP", "PURCHASE"),
      "first converter in the chain wins")
    assert(rows.map(_.getAs[Long]("amount")).toSeq === Seq(13L, 3L))
    assert(out.schema("amount").dataType === LongType, "registered schema applied")
    assert(SourceMetadata.sourceOf(out.schema("amount")).get.typeName === "BIGINT",
      "sourceType registration rewrites the propagated fact")
    assert(out.schema("tag").dataType === StringType)
    assert(out.select("tag").as[String].collect().toSet === Set("alpha", "beta"),
      "unmatched column passes through")
  }

  test("column converter descriptor exposes relational facts; declared-type mismatch is loud") {
    val tagged = SourceMetadata.propagate(base, catalog)
    // length-aware matching (RelationalColumn.length analog)
    val out = ColumnConverters.convert(tagged, "db.events", Seq(
      new ColumnConverters.ColumnConverter {
        def converterFor(c: ColumnConverters.ConvertedColumn) =
          if (c.typeName.contains("VARCHAR") && c.length.exists(_ <= 6))
            Some(Registration(StringType, v => concat(v, lit("!")))) else None
      }))
    assert(out.where(col("id") === 1L).select("kind").as[String].head() === "signup!")
    // a registration whose expression doesn't produce the declared type
    // is a config error at registration, not a downstream serialization one
    val err = intercept[IllegalArgumentException] {
      ColumnConverters.convert(tagged, "db.events", Seq(
        byName(".*\\.kind")(_ => Registration(LongType, v => upper(v)))))
    }
    assert(err.getMessage.contains("kind"))
  }
}
