package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic DOCUMENT change-event log (MongoDB-connector
  * shape) derived from the driver's `documents` parquet, in lock-step
  * with [[ChangeLog.base]]'s version/op grid so the scenario coverage
  * (create → update/delete → update/re-create) carries over.
  *
  * A document event is (id, op, part, lsn, ts_ms, after, before,
  * update_updated, update_removed):
  *
  *  - `after` is the FULL document as JSON text — present for inserts,
  *    re-creates, and full-document-capture updates (even `lsn`), the
  *    reference's `capture.mode=change_streams_update_full`;
  *  - odd-`lsn` updates model plain `change_streams` capture: `after` is
  *    null and `updateDescription` carries `updatedFields` (JSON text of
  *    the changed top-level fields) + `removedFields` (every 4th event
  *    drops `tags`), exactly the shape
  *    `ExtractNewDocumentState.getPartialUpdateDocument` consumes;
  *  - deletes carry neither (`after`/`updatedFields` both null — the
  *    reference's structural delete test).
  *
  * Document fields are emitted with keys already sorted at every level
  * (`_id` < `commit` < `lang` < `meta{head,len}` < `tags`) so the
  * DuckDB oracle can rebuild the same canonical text; see
  * `SparkEntry.oracleSql` q98/q99.
  */
object DocumentLog {

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val versions = spark.range(1, 4).select(col("id").cast("int").as("v"))
    val dId = col("doc_id")
    val v = col("v")
    val opCol =
      when(v === 1, "c")
        .when(v === 2, when(dId % 4 === 0, "d").otherwise("u"))
        .otherwise(when(dId % 8 === 0, "c").otherwise("u"))
    val lsn = dId * 3 + v
    val id = concat(lit("repo"), lpad((dId % 10).cast("string"), 2, "0"),
      lit("/src/f"), dId.cast("string"), lit(".txt"))
    val part = (dId % 8).cast("int")

    def contentOf(vc: Column) =
      concat(substring(col("text"), 1, 200), lit(" #v"), vc.cast("string"))
    def commitOf(vc: Column) =
      concat(lit("c"), lpad((dId * 3 + vc).cast("string"), 10, "0"))
    def metaOf(vc: Column) =
      struct(substring(contentOf(vc), 1, 12).as("head"),
        length(contentOf(vc)).as("len"))
    def docOf(vc: Column) = to_json(struct(
      id.as("_id"),
      commitOf(vc).as("commit"),
      col("lang"),
      metaOf(vc).as("meta"),
      array(concat(lit("p"), part.cast("string")),
        concat(lit("v"), vc.cast("string"))).as("tags")))

    val isPartial = opCol === "u" && lsn % 2 === 1
    docs.crossJoin(versions)
      .where(!(v === 3 && dId % 4 === 0 && dId % 8 =!= 0))
      .select(
        id.as("id"),
        opCol.as("op"),
        part.as("part"),
        lsn.as("lsn"),
        (lit(1700000000000L) + lsn * 1000L).as("ts_ms"),
        when(opCol === "d" || isPartial, lit(null).cast("string"))
          .otherwise(docOf(v)).as("after"),
        when(opCol === "u" || opCol === "d", docOf(v - 1))
          .otherwise(lit(null).cast("string")).as("before"),
        when(isPartial,
          to_json(struct(commitOf(v).as("commit"), metaOf(v).as("meta"))))
          .otherwise(lit(null).cast("string")).as("update_updated"),
        when(isPartial && lsn % 4 === 1, array(lit("tags")))
          .otherwise(lit(null).cast("array<string>")).as("update_removed"))
  }

  /** One BSON extended-JSON document per source doc (relaxed + canonical
    * wrapper forms side by side), for the MongoDataConverter scalar
    * normalization query (q100).
    */
  def extendedJsonDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val dId = col("doc_id")
    val id = concat(lit("repo"), lpad((dId % 10).cast("string"), 2, "0"),
      lit("/src/f"), dId.cast("string"), lit(".txt"))
    val tsMs = lit(1700000000000L) + dId * 1000L
    val len = length(col("text"))
    // key order (sorted): _id < blob < created < n < price
    val ext = to_json(struct(
      struct(substring(md5(id), 1, 24).as("$oid")).as("_id"),
      struct(struct(base64(substring(col("text"), 1, 8).cast("binary"))
        .as("base64"), lit("00").as("subType")).as("$binary")).as("blob"),
      struct(struct(tsMs.cast("string").as("$numberLong")).as("$date")).as("created"),
      struct((dId % 7).cast("string").as("$numberInt")).as("n"),
      struct(concat(len.cast("string"), lit(".25")).as("$numberDecimal")).as("price")))
    docs.select(dId.as("doc_id"), id.as("id"), ext.as("ext_doc"))
  }
}
