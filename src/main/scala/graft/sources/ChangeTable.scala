package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL-Server-style CHANGE-TABLE ingestion (the reference's other source
  * shape besides log tailing): SQL Server CDC materializes changes into
  * per-table capture tables whose rows carry `__$start_lsn`, `__$seqval`,
  * `__$operation`, `__$update_mask` plus the captured columns — and an
  * UPDATE arrives as TWO rows (before-image then after-image) that the
  * reader pairs back into one event.
  *
  * Reference semantics (studied, not copied):
  *  - operation codes 1=DELETE, 2=INSERT, 3=UPDATE_BEFORE, 4=UPDATE_AFTER
  *    (`debezium-connector-sqlserver/.../SqlServerChangeRecordEmitter.java:21-24`);
  *    the emitter maps 1→d (before only), 2→c (after only), 3+4→u
  *    (`:41-50`).
  *  - `__$update_mask` is a varbinary bitmask, bit `i%8` of byte `i/8`
  *    per captured column in ordinal order; a null/short mask counts as
  *    CHANGED (`SqlServerChangeTablePointer.isColumnChanged:208-218`).
  *  - max-type columns (varchar/varbinary(max)) that were NOT modified
  *    are stored as NULL in update rows; the reader uses the mask to
  *    distinguish them from real NULLs and substitutes the configured
  *    unavailable-value placeholder
  *    (`SqlServerChangeTablePointer.createResultSetMapper:120-183`) —
  *    which `Transforms.reselectColumns` (q17) later patches from sink
  *    state, the reference's documented composition.
  *
  * Spark mapping: the mask test is a codegen'd bit expression over the
  * binary column; the before/after pairing is ONE `groupBy(lsn, seqval)`
  * — the only exchange, O(batch) regardless of table size, and keyed by
  * the log position so hot business keys cannot skew it.
  */
object ChangeTable {

  val OpDelete = 1
  val OpInsert = 2
  val OpUpdateBefore = 3
  val OpUpdateAfter = 4

  /** Bit test per `isColumnChanged`: byte `idx/8`, bit `idx%8`; a null or
    * too-short mask counts as changed.
    */
  def columnChanged(mask: Column, idx: Int): Column = {
    val byteIdx = idx / 8
    val bit = idx % 8
    when(mask.isNull || length(mask) <= byteIdx, lit(true))
      .otherwise(
        conv(hex(substring(mask, byteIdx + 1, 1)), 16, 10).cast("int")
          .bitwiseAND(lit(1 << bit)) =!= 0)
  }

  /** Names of the captured columns whose mask bit is set (all of them for
    * a null mask), in captured order.
    */
  def changedColumns(mask: Column, captured: Seq[String]): Column =
    filter(
      array(captured.zipWithIndex.map { case (c, i) =>
        when(columnChanged(mask, i), lit(c))
      }: _*),
      x => x.isNotNull)

  /** Max-type NULL repair (`createResultSetMapper` semantics): in update
    * rows, a NULL max-type column whose mask bit says UNCHANGED becomes
    * the unavailable-value placeholder; real NULLs (mask bit set, or no
    * mask) stay NULL.
    */
  def repairMaxColumns(df: DataFrame, captured: Seq[String],
      maxCols: Seq[String], placeholder: String,
      opCol: String = "__op", maskCol: String = "__update_mask"): DataFrame =
    maxCols.foldLeft(df) { (d, c) =>
      val idx = captured.indexOf(c)
      require(idx >= 0, s"max column $c not captured")
      d.withColumn(c,
        when(col(opCol).isin(OpUpdateBefore, OpUpdateAfter) && col(c).isNull
          && !columnChanged(col(maskCol), idx), lit(placeholder))
          .otherwise(col(c)))
    }

  /** Deterministic synthetic change-table rows over the [[ChangeLog]]
    * version grid: inserts one op-2 row, deletes one op-1 row carrying the
    * pre-image, updates TWO rows (op-3 pre-image, op-4 post-image). The
    * `notes` column models a max-type column: NULL in update rows (SQL
    * Server stores NULL for unmodified max columns) with its mask bit
    * UNSET — every 5th event ships a null mask (mask unavailable ⇒ all
    * columns count as changed). Captured order:
    * repo, path, commit, lang, content, notes → update mask 0x14 =
    * bits {2=commit, 4=content}.
    */
  def syntheticRows(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val versions = spark.range(1, 4).select(col("id").cast("int").as("v"))
    val dId = col("doc_id")
    val v = col("v")
    val opName =
      when(v === 1, "c")
        .when(v === 2, when(dId % 4 === 0, "d").otherwise("u"))
        .otherwise(when(dId % 8 === 0, "c").otherwise("u"))
    val lsn = dId * 3 + v
    val rows = docs.crossJoin(versions)
      .where(!(v === 3 && dId % 4 === 0 && dId % 8 =!= 0))
      .select(dId, col("text"), col("lang"), v, lsn.as("__lsn"),
        explode(
          when(opName === "u", array(lit(OpUpdateBefore), lit(OpUpdateAfter)))
            .when(opName === "d", array(lit(OpDelete)))
            .otherwise(array(lit(OpInsert)))).as("__op"))
    val img = when(col("__op").isin(OpDelete, OpUpdateBefore), v - 1).otherwise(v)
    val isUpd = col("__op").isin(OpUpdateBefore, OpUpdateAfter)
    rows.select(
      col("__lsn"), col("__lsn").as("__seqval"), col("__op"),
      when(isUpd && col("__lsn") % 5 === 0, lit(null).cast("binary"))
        .when(isUpd, lit(Array[Byte](0x14.toByte)))
        .otherwise(lit(null).cast("binary")).as("__update_mask"),
      concat(lit("repo"), lpad((dId % 10).cast("string"), 2, "0")).as("repo"),
      concat(lit("src/f"), dId.cast("string"), lit(".txt")).as("path"),
      concat(lit("c"), lpad((dId * 3 + img).cast("string"), 10, "0")).as("commit"),
      col("lang"),
      concat(substring(col("text"), 1, 200), lit(" #v"), img.cast("string")).as("content"),
      when(isUpd, lit(null).cast("string"))
        .otherwise(concat(lit("note"), dId.cast("string"))).as("notes"))
  }

  /** Pair before/after rows and emit envelope-shaped events: one row per
    * (lsn, seqval) with `op` c/u/d, `before`/`after` payload structs, and
    * `changed` (the update's mask decoded to column names; null for c/d).
    */
  def toEvents(df: DataFrame, captured: Seq[String],
      lsnCol: String = "__lsn", seqCol: String = "__seqval",
      opCol: String = "__op", maskCol: String = "__update_mask"): DataFrame = {
    val payload = struct(captured.map(col): _*)
    val op = col(opCol)
    df.groupBy(col(lsnCol).as("lsn"), col(seqCol).as("seqval"))
      .agg(
        max(op).as("__opmax"),
        max(when(op.isin(OpDelete, OpUpdateBefore), payload)).as("before"),
        max(when(op.isin(OpInsert, OpUpdateAfter), payload)).as("after"),
        max(when(op === OpUpdateAfter, changedColumns(col(maskCol), captured)))
          .as("changed"))
      .select(
        when(col("__opmax") === OpInsert, "c")
          .when(col("__opmax") === OpDelete, "d")
          .otherwise("u").as("op"),
        col("lsn"), col("seqval"), col("before"), col("after"),
        when(col("__opmax") >= OpUpdateBefore, col("changed")).as("changed"))
  }
}
