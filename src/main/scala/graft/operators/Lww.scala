package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Envelope

/** Last-writer-wins reduction: keep only the latest event per key, ordered
  * by (commit DESC, lsn DESC).
  *
  * Reference semantics: `ReducedRecordBuffer.add` keeps the latest record
  * per key Struct (`debezium-connector-jdbc/.../ReducedRecordBuffer.java:48-115`);
  * the position total order is `BinlogHistoryRecordComparator.java:109-137`.
  *
  * Spark-first design: one hash-shuffle on the key + an in-partition sort
  * (window row_number). For skewed keys (hot repos at 10^10 scale, north
  * rule) the reduction is salted: a first pass reduces per (key, salt) —
  * map-side-narrowing the hot key's rows by the salt factor — then a second
  * pass reduces the per-salt winners. Both passes are whole-stage-codegen
  * window aggregates; no custom physical operator is needed.
  */
object Lww {

  private def ordering = Seq(col("commit").desc, col("lsn").desc)

  /** Reduce a flat change log (key cols + commit/lsn + payload) to the
    * winning event per key.
    *
    * @param salt number of salt buckets for the pre-reduction; <= 1 disables
    *             salting. Use > 1 when the key distribution is hot (a few
    *             repos owning most events).
    */
  def reduce(df: DataFrame, keyCols: Seq[String] = Envelope.keyCols, salt: Int = 1): DataFrame = {
    val keys = keyCols.map(col)
    val pre =
      if (salt > 1) {
        // Salt on lsn: uniform, deterministic, independent of the key.
        val w1 = Window.partitionBy(keys :+ col("__salt"): _*).orderBy(ordering: _*)
        df.withColumn("__salt", pmod(col("lsn"), lit(salt.toLong)))
          .withColumn("__rn", row_number().over(w1))
          .where(col("__rn") === 1)
          .drop("__salt", "__rn")
      } else df
    val w2 = Window.partitionBy(keys: _*).orderBy(ordering: _*)
    pre.withColumn("__rn", row_number().over(w2))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply semantics after reduction: winners with op 'd' disappear
    * (delete), everything else upserts — the declarative equivalent of the
    * reference's MERGE (`JdbcChangeEventSink.execute`,
    * `debezium-connector-jdbc/.../JdbcChangeEventSink.java:71-156`).
    *
    * Truncate ('t') is table-scoped, not key-scoped: it deletes every key
    * whose winning event is ordered before the latest truncate position
    * (SURVEY.md §7.3). Handled by filtering winners below the truncate
    * fence; a key re-created after the truncate survives.
    */
  def applyState(log: DataFrame, keyCols: Seq[String] = Envelope.keyCols, salt: Int = 1): DataFrame = {
    val hasTruncate = log.columns.contains("op")
    require(hasTruncate, "applyState expects an 'op' column")
    // Fence: max (commit, lsn) among truncate events, as a 1-row DF
    // cross-joined (broadcast, tiny) — avoids a driver collect.
    val fence = log.where(col("op") === Envelope.OpTruncate)
      .agg(max(struct(col("commit"), col("lsn"))).as("__fence"))
    val winners = reduce(log.where(col("op") =!= Envelope.OpTruncate), keyCols, salt)
    winners
      .crossJoin(broadcast(fence))
      .where(col("__fence").isNull || struct(col("commit"), col("lsn")) > col("__fence"))
      .drop("__fence")
      .where(col("op") =!= Envelope.OpDelete)
  }
}
