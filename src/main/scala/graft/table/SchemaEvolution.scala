package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro-style schema reconciliation at microbatch boundaries
  * (SURVEY.md §7.0 item 7; reference: sink-side schema evolution
  * `debezium-connector-jdbc/.../DefaultRecordWriter.java:213-235` —
  * `schema.evolution=basic` supports column add; we additionally support
  * type widening along the promotion chain).
  *
  * Rules:
  *  - column add: new columns append to the table schema; old data reads as
  *    null (reference `resolveMissingFields` → `alterTableIfNeeded`);
  *  - type widen: int → long → double → string (and date/ts → string);
  *    narrower incoming data upcasts to the table type; a wider incoming
  *    type widens the table schema;
  *  - column drop never happens implicitly (missing columns in a batch are
  *    null-filled, not dropped) — matches the reference's additive-only
  *    evolution.
  */
object SchemaEvolution {

  private val chain: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 4, DoubleType -> 5, StringType -> 9)

  /** Least common widened type, or None if incompatible. */
  def widen(a: DataType, b: DataType): Option[DataType] =
    if (a == b) Some(a)
    else (chain.get(a), chain.get(b)) match {
      case (Some(x), Some(y)) => Some(if (x >= y) a else b)
      case _ if a == StringType || b == StringType => Some(StringType)
      case _ => None
    }

  /** Reconcile an incoming batch schema against the table schema. Returns
    * the evolved table schema. Throws on incompatible type changes.
    */
  def reconcile(table: StructType, batch: StructType): StructType = {
    val batchByName = batch.fields.map(f => f.name -> f).toMap
    val evolved = table.fields.map { tf =>
      batchByName.get(tf.name) match {
        case Some(bf) =>
          val t = widen(tf.dataType, bf.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"incompatible type change for column ${tf.name}: ${tf.dataType} vs ${bf.dataType}"))
          tf.copy(dataType = t, nullable = tf.nullable || bf.nullable)
        case None => tf
      }
    }
    val added = batch.fields.filterNot(f => table.fieldNames.contains(f.name))
      .map(_.copy(nullable = true)) // old rows null-fill the new column
    StructType(evolved ++ added)
  }

  /** Project a DataFrame onto a target schema: cast present columns,
    * null-fill missing ones, in target field order.
    */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
