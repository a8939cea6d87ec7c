package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.core.Envelope

/** CRDT counters — the Spark-first re-expression of the reference's
  * conflict-free counter suite (`debezium-connector-common/src/main/java/io/
  * debezium/crdt/PNCounter.java`, `GCounter.java`, `DeltaCounter.java`,
  * `StateBasedPNDeltaCounter.java`): counters that track positive and
  * negative changes SEPARATELY so replicas can be merged in any order and
  * still converge to global increments minus decrements.
  *
  * The deep fit: a CRDT's merge must be commutative and associative — which
  * is precisely Spark's aggregate contract. A distributed Spark aggregate
  * IS a state-based CRDT evaluation: each task folds its partition into a
  * replica (partial aggregate), and Spark merges replicas in arbitrary,
  * non-deterministic order across the shuffle. Two physical forms:
  *
  *  - [[pnCounts]] / [[deltaCounts]] (default): built-in conditional sums —
  *    whole-stage-codegen'd, map-side-combined; the scale path.
  *  - [[PNCounterAgg]]: a typed `Aggregator[Long, PNCount, PNCount]` whose
  *    `merge` is literally `PNCount.merge` — the reference's
  *    `PNCounter.merge(Count)` made into a Spark aggregation function
  *    (register with `functions.udaf`). Kept for typed Dataset use and as
  *    the executable statement of the CRDT law; the spec checks it agrees
  *    with the declarative path and that merge order cannot matter.
  */
object Crdt {

  /** PN-counter state: positive and negative changes tracked apart
    * (`PNCount.java` — `getIncrement()`, `getDecrement()`, `get()`).
    */
  final case class PNCount(increments: Long, decrements: Long) {
    def value: Long = increments - decrements
    /** Order-independent merge (`PNCounter.merge(Count)`). */
    def merge(o: PNCount): PNCount =
      PNCount(increments + o.increments, decrements + o.decrements)
  }
  object PNCount { val zero: PNCount = PNCount(0L, 0L) }

  /** The typed CRDT aggregation function: fold signed deltas into a
    * PN-counter replica, merge replicas commutatively.
    */
  final class PNCounterAgg extends Aggregator[Long, PNCount, PNCount] {
    override def zero: PNCount = PNCount.zero
    // negateExact: delta == Long.MinValue would silently DECREASE
    // decrements under plain negation (round-2 ADVICE); overflow now
    // fails loudly like any other counter overflow would.
    override def reduce(b: PNCount, delta: Long): PNCount =
      if (delta >= 0L) PNCount(b.increments + delta, b.decrements)
      else PNCount(b.increments, b.decrements + Math.negateExact(delta))
    override def merge(a: PNCount, b: PNCount): PNCount = a.merge(b)
    override def finish(r: PNCount): PNCount = r
    override def bufferEncoder: Encoder[PNCount] = Encoders.product[PNCount]
    override def outputEncoder: Encoder[PNCount] = Encoders.product[PNCount]
  }

  /** Signed row delta of a change event: creates/snapshot-reads grow the
    * live-row count, deletes shrink it, updates/others leave it unchanged —
    * the CDC reading of the reference's "increments minus decrements".
    */
  def opDelta(op: Column = col("op")): Column =
    when(op.isin(Envelope.OpCreate, Envelope.OpRead), 1L)
      .when(op === Envelope.OpDelete, -1L)
      .otherwise(0L)

  /** Per-key PN counts of a signed-delta column — declarative/codegen path.
    * Output: keyCols ++ (increments, decrements, value).
    */
  def pnCounts(df: DataFrame, keyCols: Seq[String], delta: Column): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(delta > 0, delta).otherwise(0L)).as("increments"),
        sum(when(delta < 0, -delta).otherwise(0L)).as("decrements"))
      .withColumn("value", col("increments") - col("decrements"))

  /** Delta counter (`DeltaCounter.java`: PN total + changes since the last
    * `reset()`): per (key, interval) PN changes PLUS the running totals —
    * each interval row is exactly what the reference's
    * `getChanges()` / `get()` pair reads before a reset. The running sum is
    * a window over intervals of the ALREADY-AGGREGATED per-interval rows
    * (one row per key×interval — tiny), not over raw events.
    * Output: keyCols ++ (interval, inc_delta, dec_delta, change,
    * increments, decrements, value).
    */
  def deltaCounts(df: DataFrame, keyCols: Seq[String], delta: Column, interval: Column): DataFrame = {
    val perInterval = df.groupBy((keyCols.map(col) :+ interval.as("interval")): _*)
      .agg(
        sum(when(delta > 0, delta).otherwise(0L)).as("inc_delta"),
        sum(when(delta < 0, -delta).otherwise(0L)).as("dec_delta"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("interval"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perInterval
      .withColumn("change", col("inc_delta") - col("dec_delta"))
      .withColumn("increments", sum(col("inc_delta")).over(w))
      .withColumn("decrements", sum(col("dec_delta")).over(w))
      .withColumn("value", col("increments") - col("decrements"))
  }
}
