package graft.tdp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / corpus-mixing operators for training-data
  * pipelines: reproducible subsets and per-stratum mixing weights at
  * 100 TB with NO randomness state — membership is a pure function of a
  * key hash, so re-runs, retries, and different partitionings all pick
  * the same rows (and an independent engine can recompute the choice,
  * which is what the DuckDB oracle does).
  *
  * Mechanism: `md5(salt || key)` is uniform on hex strings; keeping rows
  * whose first 8 hex digits compare LEXICALLY below `rate`-scaled
  * threshold samples each row independently at `rate`. String compare =
  * engine-portable (no float rounding, no hex→int conversion quirks).
  * Disjoint salts give independent samples; disjoint RANGES of one hash
  * give disjoint splits (train/val/test).
  */
object Sampling {

  /** Threshold for a keep-rate in [0, 1]: 8 hex digits, except rate 1.0
    * (and cumulative cuts reaching 1.0) returns "g" — lexically above
    * every hex string, so `hash < threshold` keeps ALL rows. A clamped
    * "ffffffff" with strict `<` would drop rows hashing exactly to it
    * (~1 in 2^32 — real rows at 10^11-doc scale, and split fractions
    * summing to 1.0 would leave them split=NULL).
    */
  private[tdp] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0 + 1e-9, s"rate must be in [0,1]: $rate")
    val n = math.round(rate * 4294967296.0)
    if (n >= 4294967296L) "g" else f"$n%08x"
  }

  /** The sampling hash of a key — first 8 hex digits of md5(salt||key). */
  def sampleHash(key: Column, salt: String = ""): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** Keep each row independently with probability `rate`, deterministically
    * in the key. Narrow filter — no shuffle, prunes at the scan when the
    * predicate pushes.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: String = ""): DataFrame =
    df.where(sampleHash(key, salt) < lit(hexThreshold(rate)))

  /** Per-stratum keep rates (corpus MIXING weights: e.g. languages or
    * quality buckets sampled at different rates to hit a target mix).
    * One narrow filter: the stratum column selects its threshold via a
    * CASE chain; unlisted strata use `defaultRate`.
    */
  def stratifiedSample(
      df: DataFrame,
      stratum: Column,
      rates: Seq[(String, Double)],
      defaultRate: Double = 0.0,
      key: Column,
      salt: String = ""): DataFrame = {
    val threshold = rates.foldRight(lit(hexThreshold(defaultRate)): Column) {
      case ((s, r), acc) => when(stratum === s, lit(hexThreshold(r))).otherwise(acc)
    }
    df.where(sampleHash(key, salt) < threshold)
  }

  /** Disjoint deterministic splits (train/val/test): each row lands in
    * exactly one named split, by cumulative hash ranges of ONE hash —
    * fractions must sum to ≤ 1 (any remainder is dropped). Returns the
    * frame with a `split` column; filter by name for one side.
    */
  def assignSplits(
      df: DataFrame,
      key: Column,
      fractions: Seq[(String, Double)],
      salt: String = "",
      out: String = "split"): DataFrame = {
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val h = sampleHash(key, salt)
    val expr = fractions.zip(cuts).foldRight(lit(null).cast("string"): Column) {
      case (((name, _), cut), acc) => when(h < lit(hexThreshold(cut)), name).otherwise(acc)
    }
    df.withColumn(out, expr)
  }

  /** Deterministic EPOCH SHUFFLE + shard assignment — the serving step of
    * a training pipeline: each epoch needs the corpus in a fresh but
    * REPRODUCIBLE order, split into `shards` files consumed by data
    * loaders. Per (row, epoch): `order_key = md5(salt|epoch|key)` gives an
    * epoch-specific uniform order; `shard = first-8-hex(order_key) mod
    * shards` balances shards; sorting each shard by `order_key` yields
    * the within-shard read order. All pure hash expressions — any engine,
    * any partitioning, any retry reproduces the exact epoch plan; no
    * shuffle beyond the final `repartition(shards)` write the caller
    * does (`df.repartition(col("shard")).sortWithinPartitions("order_key")`).
    *
    * Output: input columns + (epoch, shard, order_key), one row per
    * (input row × epoch).
    */
  def epochShards(
      df: DataFrame,
      key: Column,
      epochs: Int,
      shards: Int,
      salt: String = ""): DataFrame = {
    require(epochs >= 1 && shards >= 1)
    val h = md5(concat(lit(salt), lit("|"), col("epoch").cast("string"), lit("|"), key.cast("string")))
    df.select(col("*"), explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("order_key", h)
      .withColumn("shard",
        pmod(conv(substring(col("order_key"), 1, 8), 16, 10).cast("long"), lit(shards.toLong)))
  }
}
