package graft.table

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental equi-JOIN view maintenance off [[LakeTable.changeFeed]] —
  * the two-table completion of [[MaterializedView]]'s aggregate IVM: the
  * view `SELECT l.*, r.* FROM left l JOIN right r ON l.on = r.on` lives
  * in its own keyed [[LakeTable]] and is kept current by folding each
  * base table's change-feed deltas against the OTHER table's snapshot,
  * never re-running the full join.
  *
  * Incremental algebra (classic delta-join / DBSP rule, applied one base
  * version at a time): with the view reflecting `left@va ⋈ right@vb`,
  * folding left's `Δ(va→va+1)` against `right@vb` (time-traveled — the
  * exact state the view reflects, even if `right` has moved on) yields
  * `left@va+1 ⋈ right@vb`; right steps then advance `vb` symmetrically.
  * Feed rows map to view events directly: `delete`/`update_preimage`
  * rows retract every join partner they had (the feed carries full
  * pre-images, so the OLD join value's partners are exactly a join
  * away); `insert`/`update_postimage` rows upsert the new partners. A
  * value-only update emits retract+upsert for the same view key in one
  * batch; within-batch ordering (retracts at `lsn = 2·step`, upserts at
  * `2·step + 1`) makes the upsert the LWW winner.
  *
  * Exactly-once: the view commit's `batchId` encodes the reflected
  * version PAIR (`va << 32 | vb`, strictly increasing across steps), so
  * a crash mid-catch-up replays exactly the missing steps and the
  * engine's batchId fence drops redelivered ones. A base version whose
  * feed is unavailable because history was EXPIRED follows
  * [[MaterializedView.maintain]]'s contract: an empty view bootstraps
  * from the horizon commit's all-insert feed; a non-empty lagging view
  * fails loudly (rebuild) rather than double-applying.
  *
  * Scale shape: each step shuffles O(Δ ⋈ partners). The counterpart
  * snapshot is NOT shuffled — the delta side is broadcast when its
  * distinct join values fit [[JoinView.MaxJoinValuePushdown]], and that
  * same driver-known value list is pushed into the counterpart scan as
  * an `isin` filter, so parquet row-group stats prune the probe to the
  * row groups that can hold a partner (a microbatch touching k join
  * values reads O(k row groups), not O(counterpart)). Reference
  * semantics (studied, not copied): Debezium ships no join operator —
  * this is the CDC-consumer "keep a joined read model in sync" pattern
  * its change feed exists to enable (outbox/read-model deployments of
  * `JdbcChangeEventSink`), made first-class on Spark.
  */
object JoinView {

  /** Push the delta's distinct join values into the counterpart scan (and
    * broadcast the delta) only below this many values — above it the scan
    * filter would bloat the plan for no pruning and the delta may not fit
    * a broadcast.
    */
  val MaxJoinValuePushdown = 1000

  /** Null-extension sentinel for `left_outer` views: the right-key slot
    * of a partnerless row (a view key column cannot be NULL — the engine
    * quarantines malformed keys). NUL sorts before every real string and
    * cannot appear in a sane key; [[DerivedJoinView.nullExtended]]
    * translates it back to SQL NULL for consumers.
    */
  val NoPartner = "\u0000"

  /** A derived join-view table: `view` must be keyed by the l_/r_-prefixed
    * base keys, and `leftCols`/`rightCols` (the carried data columns) must
    * include the respective base's key columns. `joinType`: "inner"
    * (default) or "left_outer" (unmatched left rows ride with
    * [[NoPartner]] right keys and null right payload; requires
    * string-typed right key columns for the sentinel).
    */
  final case class DerivedJoinView(
      view: LakeTable,
      left: LakeTable,
      right: LakeTable,
      leftOn: String,
      rightOn: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      applySalt: Int = 1,
      joinType: String = "inner") {
    require(joinType == "inner" || joinType == "left_outer",
      s"joinType must be inner or left_outer, got $joinType")
    val leftKeyCols: Seq[String] = left.keyCols.map("l_" + _)
    val rightKeyCols: Seq[String] = right.keyCols.map("r_" + _)
    val payloadCols: Seq[String] = leftCols.map("l_" + _) ++ rightCols.map("r_" + _)

    /** SQL-shaped read of a `left_outer` view: sentinel right keys back
      * to NULL (what a LEFT JOIN would have produced).
      */
    def nullExtended(df: DataFrame): DataFrame =
      rightKeyCols.foldLeft(df)((d, c) =>
        d.withColumn(c, when(col(c) === NoPartner, lit(null).cast("string")).otherwise(col(c))))
  }

  /** The view commit's `batchId` encodes the reflected base-version pair
    * `(left, right)` — public so operators can read how far a view lags.
    */
  def encode(va: Long, vb: Long): Long = (va << 32) | vb
  def decode(b: Long): (Long, Long) = (b >>> 32, b & 0xffffffffL)

  /** Typed empty frame — the shared fallback for reading a counterpart
    * state at a version before its first commit.
    */
  private def emptyDf(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)

  /** Catch the view up to both base heads. Left steps first (against the
    * reflected right version), then right steps (against the new left
    * head); each step is one exactly-once engine apply. No-op until both
    * bases have a first commit — which for `left_outer` means left rows
    * appear (null-extended) only once the RIGHT table exists too: the
    * sentinel payload needs the right schema, which only a commit
    * carries. A dimension expected to stay empty for a while should make
    * a schema-only first commit (an empty batch through the engine);
    * from then on an empty right behaves exactly like a LEFT JOIN.
    */
  def maintain(spark: SparkSession, jv: DerivedJoinView): Unit = {
    require(jv.view.keyCols == jv.leftKeyCols ++ jv.rightKeyCols,
      s"view must be keyed ${jv.leftKeyCols ++ jv.rightKeyCols}, got ${jv.view.keyCols}")
    require(jv.left.keyCols.forall(jv.leftCols.contains),
      s"leftCols must include the left key columns ${jv.left.keyCols}")
    require(jv.right.keyCols.forall(jv.rightCols.contains),
      s"rightCols must include the right key columns ${jv.right.keyCols}")
    val laHead = jv.left.lastCommit().map(_.version).getOrElse(0L)
    val rbHead = jv.right.lastCommit().map(_.version).getOrElse(0L)
    if (laHead == 0L || rbHead == 0L) return
    if (jv.joinType == "left_outer") {
      val rs = jv.right.lastCommit().get.schema
      jv.right.keyCols.foreach(k => require(
        rs(k).dataType == org.apache.spark.sql.types.StringType,
        s"left_outer needs string right key columns for the sentinel; $k is ${rs(k).dataType}"))
    }
    var (va, vb) = jv.view.lastCommit().map(c => decode(c.batchId)).getOrElse((0L, 0L))
    checkRetention(jv.left, "left", va, laHead)
    checkRetention(jv.right, "right", vb, rbHead)
    while (va < laHead) {
      val v = va + 1
      step(spark, jv, leftStep = true, v, otherV = vb, batchId = encode(v, vb), ord = v + vb)
      va = v
    }
    while (vb < rbHead) {
      val v = vb + 1
      step(spark, jv, leftStep = false, v, otherV = va, batchId = encode(va, v), ord = va + v)
      vb = v
    }
  }

  /** Same laggards-must-rebuild contract as [[MaterializedView.maintain]]:
    * a non-empty view whose reflected version pre-dates retained history
    * would re-fold already-applied state on top of itself.
    */
  private def checkRetention(base: LakeTable, side: String, reflected: Long, head: Long): Unit =
    if (reflected > 0L && reflected < head) {
      val have = base.commitVersions().toSet
      val missing = (reflected to head).filterNot(have)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"join view at $side version $reflected lags expired history " +
            s"(missing commits ${missing.mkString(", ")} of $head) — rebuild the view")
    }

  /** One single-base version step: fold `Δ(v-1 → v)` of the stepping base
    * against the counterpart AT THE VERSION THE VIEW REFLECTS, and apply
    * the resulting view events. An unavailable feed (expired pre-horizon
    * segment, empty view) is skipped without a commit — the horizon
    * commit's own all-insert feed carries the bootstrap.
    */
  private def step(
      spark: SparkSession,
      jv: DerivedJoinView,
      leftStep: Boolean,
      v: Long,
      otherV: Long,
      batchId: Long,
      ord: Long): Unit = {
    val (base, other) = if (leftStep) (jv.left, jv.right) else (jv.right, jv.left)
    val (baseOn, otherOn) = if (leftStep) (jv.leftOn, jv.rightOn) else (jv.rightOn, jv.leftOn)
    val (basePre, otherPre) = if (leftStep) ("l_", "r_") else ("r_", "l_")
    val (baseCols, otherCols) = if (leftStep) (jv.leftCols, jv.rightCols) else (jv.rightCols, jv.leftCols)
    base.changeFeed(spark, v - 1, v).foreach { feed =>
      val baseSel = (baseCols :+ baseOn).distinct
      val otherSel = (otherCols :+ otherOn).distinct
      // Persist the delta: the change feed is a full-outer version diff
      // recomputed on every execution, and the delta is read twice (the
      // driver-side join-value collect, then the view-event apply).
      val delta = feed.select(
        baseSel.map(c => col(c).as(s"$basePre$c")) :+ col("_change_type"): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // counterpart at the reflected version; schema from its head
        // commit when the version pre-dates the first commit (empty state)
        val cp0 = other.snapshotAt(spark, otherV).getOrElse(
          emptyDf(spark, other.lastCommit().get.schema))
        val cp = cp0.select(otherSel.map(c => col(c).as(s"$otherPre$c")): _*)
        // driver-known join values: broadcast the (small) delta and prune
        // the counterpart scan to row groups that can hold a partner
        val joinVals = delta.select(col(s"$basePre$baseOn")).distinct()
          .limit(MaxJoinValuePushdown + 1).collect().map(_.get(0)).toSeq
        val small = joinVals.size <= MaxJoinValuePushdown
        val probe = if (small) cp.where(col(s"$otherPre$otherOn").isInCollection(joinVals)) else cp
        val build = if (small) broadcast(delta) else delta
        val joined = build.join(probe, col(s"$basePre$baseOn") === col(s"$otherPre$otherOn"))
        // payload df must already carry every payload column; meta columns
        // (op/ordering/bucket) are appended here
        def ev(df: DataFrame, op: String, off: Long): DataFrame =
          df.select(jv.payloadCols.map(col) ++ Seq(
            lit(op).as("op"),
            format_string("v%012d", lit(ord)).as("commit"),
            lit(2L * ord + off).as("lsn"),
            pmod(hash(jv.view.keyCols.map(col): _*), lit(jv.view.numBuckets)).as("part"),
            lit(ord).as("ts_ms")): _*)
        val minusTypes = Seq("delete", "update_preimage")
        val plusTypes = Seq("insert", "update_postimage")
        val retracts = ev(joined.where(col("_change_type").isin(minusTypes: _*)), "d", 0L)
        val upserts = ev(joined.where(col("_change_type").isin(plusTypes: _*)), "u", 1L)

        // left_outer: null-extension events. A partnerless left row rides
        // with NoPartner right keys + null right payload; this block emits
        // the sentinel-row births and deaths the pair events don't cover.
        val outer: Seq[DataFrame] =
          if (jv.joinType != "left_outer") Nil
          else {
            val rSchema = jv.right.lastCommit().get.schema
            // a df holding l_-prefixed left columns → sentinel payload
            def sentinel(df: DataFrame, op: String, off: Long): DataFrame =
              ev(df.select(jv.leftCols.map(c => col(s"l_$c")) ++ jv.rightCols.map { c =>
                val t = rSchema(c).dataType
                if (jv.right.keyCols.contains(c)) lit(NoPartner).cast(t).as(s"r_$c")
                else lit(null).cast(t).as(s"r_$c")
              }: _*), op, off)
            if (leftStep) {
              // left rows whose (pre/post) join value has NO partner in
              // the reflected right state: preimages/deletes retract their
              // sentinel row, postimages/inserts (re)assert it. probe ⊆ cp
              // never drops a row matching the delta's own values, so the
              // anti-join is exact.
              val anti = delta.join(probe,
                col(s"$basePre$baseOn") === col(s"$otherPre$otherOn"), "left_anti")
              Seq(
                sentinel(anti.where(col("_change_type").isin(minusTypes: _*)), "d", 0L),
                sentinel(anti.where(col("_change_type").isin(plusTypes: _*)), "u", 1L))
            } else {
              // Reserved-sentinel guard: a REAL right key equal to
              // NoPartner would collide with sentinel view keys and
              // silently corrupt the view under LWW. Every right row
              // enters through a right-step delta (including the
              // bootstrap all-insert feed), so this one cheap gate
              // covers all data — fail loudly, never corrupt.
              val badSentinel = delta.where(
                jv.right.keyCols.map(k => col(s"$basePre$k") === NoPartner).reduce(_ || _))
                .limit(1).count()
              require(badSentinel == 0L,
                "right key data contains the reserved NoPartner sentinel (\\u0000) — " +
                  "a left_outer view cannot represent it")
              // partner-count TRANSITIONS of the stepping (right) base:
              // a join value gaining its FIRST partner kills its left
              // partners' sentinel rows; a value losing its LAST partner
              // re-births them. Prev/cur right states are isin-pruned to
              // the delta's values when small — O(touched values), not
              // O(right table).
              def vals(types: Seq[String]) =
                delta.where(col("_change_type").isin(types: _*))
                  .select(col(s"$basePre$baseOn").as("__jv")).distinct()
              def stateOn(version: Long): DataFrame = {
                val st = base.snapshotAt(spark, version).getOrElse(emptyDf(spark, rSchema))
                val on = st.select(col(baseOn).as("__on"))
                if (small) on.where(col("__on").isInCollection(joinVals)) else on
              }
              val firstVals = vals(plusTypes).join(stateOn(v - 1),
                col("__jv") === col("__on"), "left_anti")
              val lastVals = vals(minusTypes).join(stateOn(v),
                col("__jv") === col("__on"), "left_anti")
              // probe, not cp: first/last values ⊆ the delta's join
              // values, so the isin-pruned left read serves them exactly —
              // O(touched row groups), never a second full left scan.
              // Broadcast only under the same small-delta guard as the
              // pair join (a bootstrap right feed can carry millions of
              // distinct values).
              def leftPartners(values: DataFrame) = {
                val vs = if (small) broadcast(values) else values
                probe.join(vs, col(s"$otherPre$otherOn") === col("__jv"))
              }
              Seq(
                sentinel(leftPartners(firstVals), "d", 0L),
                sentinel(leftPartners(lastVals), "u", 1L))
            }
          }

        // applySalt > 1: a HOT join value (one dimension row matching many
        // rows) concentrates its pairs in few view keys' buckets — the
        // engine's salted pre-reduce flattens that skew before the merge.
        graft.merge.CdcApply.applyBatch(spark, jv.view,
          (Seq(retracts, upserts) ++ outer).reduce(_ unionAll _),
          batchId = batchId, salt = jv.applySalt, writeMetrics = false)
      } finally delta.unpersist()
    }
  }
}
