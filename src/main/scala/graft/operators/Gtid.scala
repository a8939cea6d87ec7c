package graft.operators

import scala.collection.immutable.TreeMap

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.GraftSqlShim.AbstractType
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GTID-set interval algebra — the reference's binlog restart-fencing /
  * LWW total order (SURVEY §1.2).
  *
  * Reference semantics (studied, not copied):
  *  - the `GtidSet` contract — `contains(gtid)`, `isContainedWithin`,
  *    `subtract`, union via `with` —
  *    `debezium-connector-binlog/src/main/java/io/debezium/connector/binlog/gtid/GtidSet.java:15-62`;
  *  - MySQL text form `uuid:1-5:7:9-12,uuid2:3` with per-server interval
  *    lists kept sorted on server id (`MySqlGtidSet.java:40`, TreeMap);
  *  - the history comparator consults GTID-set containment FIRST when
  *    deciding "is position A at-or-before B"
  *    (`BinlogHistoryRecordComparator.java:52-81`), and the read-only
  *    incremental snapshot fences its chunk windows on executed-GTID
  *    sets (`BinlogReadOnlyIncrementalSnapshotChangeEventSource.java:116-175`).
  *
  * Spark mapping: sets are their canonical STRINGS (sorted servers,
  * ascending coalesced intervals), the predicates/combiners are codegen'd
  * expressions over those strings, and executed-set ACCUMULATION is a
  * typed [[Aggregator]] whose merge is interval union — commutative /
  * associative / idempotent (a state-based CRDT join, like
  * [[Crdt.PNCounterAgg]]), so Spark's partial aggregation IS the
  * semantics and replays/reshuffles cannot change the result.
  */
object GtidOps {

  type IntervalMap = TreeMap[String, Vector[(Long, Long)]]

  /** Parse `uuid:1-5:7,uuid2:3`; tolerates unsorted/overlapping input
    * (normalized on the way in). Empty/null-ish strings → empty set.
    */
  def parse(s: String): IntervalMap = {
    if (s == null || s.trim.isEmpty) return TreeMap.empty
    var m: IntervalMap = TreeMap.empty
    s.split(',').foreach { part =>
      val p = part.trim
      if (p.nonEmpty) {
        val segs = p.split(':')
        require(segs.length >= 2, s"malformed GTID range: $p")
        val uuid = segs(0)
        val ivs = segs.iterator.drop(1).map { seg =>
          val dash = seg.indexOf('-')
          if (dash < 0) { val n = seg.trim.toLong; (n, n) }
          else (seg.substring(0, dash).trim.toLong, seg.substring(dash + 1).trim.toLong)
        }.toVector
        m = m.updated(uuid, normalize(m.getOrElse(uuid, Vector.empty) ++ ivs))
      }
    }
    m
  }

  /** Sort + coalesce overlapping/adjacent intervals ([1,3] + [4,6] = [1,6]). */
  private def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    if (ivs.isEmpty) return ivs
    val sorted = ivs.sortBy(_._1)
    val out = Vector.newBuilder[(Long, Long)]
    var (cs, ce) = sorted.head
    sorted.tail.foreach { case (s, e) =>
      if (s <= ce + 1) { if (e > ce) ce = e }
      else { out += ((cs, ce)); cs = s; ce = e }
    }
    out += ((cs, ce))
    out.result()
  }

  /** Canonical text: servers sorted, intervals ascending, `n` for
    * single-transaction intervals (the MySQL rendering).
    */
  def render(m: IntervalMap): String =
    m.iterator.map { case (uuid, ivs) =>
      uuid + ":" + ivs.map { case (s, e) => if (s == e) s.toString else s"$s-$e" }.mkString(":")
    }.mkString(",")

  def union(a: IntervalMap, b: IntervalMap): IntervalMap =
    b.foldLeft(a) { case (acc, (uuid, ivs)) =>
      acc.updated(uuid, normalize(acc.getOrElse(uuid, Vector.empty) ++ ivs))
    }

  /** GTIDs in `a` not in `b` (reference `GtidSet.subtract`). */
  def subtract(a: IntervalMap, b: IntervalMap): IntervalMap = {
    val out = a.iterator.map { case (uuid, ivs) =>
      val cuts = b.getOrElse(uuid, Vector.empty)
      val remaining = ivs.flatMap { case (s0, e0) =>
        var pieces = Vector((s0, e0))
        cuts.foreach { case (cs, ce) =>
          pieces = pieces.flatMap { case (s, e) =>
            if (ce < s || cs > e) Vector((s, e))
            else {
              val left = if (cs > s) Vector((s, cs - 1)) else Vector.empty
              val right = if (ce < e) Vector((ce + 1, e)) else Vector.empty
              left ++ right
            }
          }
        }
        pieces
      }
      uuid -> remaining
    }.filter(_._2.nonEmpty).toSeq
    TreeMap(out: _*)
  }

  /** Every interval of `a` covered by `b` (`isContainedWithin`). */
  def containedWithin(a: IntervalMap, b: IntervalMap): Boolean =
    a.forall { case (uuid, ivs) =>
      val cover = b.getOrElse(uuid, Vector.empty)
      ivs.forall { case (s, e) => cover.exists { case (cs, ce) => cs <= s && e <= ce } }
    }

  /** Single-GTID membership (`contains("uuid:txid")`). Binary search over
    * the sorted, non-overlapping interval vector — a large executed set
    * (thousands of islands per server on a fragmented log) costs
    * O(log islands) per event, not O(islands).
    */
  def containsGtid(set: IntervalMap, gtid: String): Boolean = {
    val colon = gtid.lastIndexOf(':')
    require(colon > 0, s"malformed GTID: $gtid")
    val uuid = gtid.substring(0, colon)
    val tx = gtid.substring(colon + 1).trim.toLong
    val ivs = set.getOrElse(uuid, Vector.empty)
    var lo = 0
    var hi = ivs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val (s, e) = ivs(mid)
      if (tx < s) hi = mid - 1
      else if (tx > e) lo = mid + 1
      else return true
    }
    false
  }

  // Per-thread single-entry memo of the last parsed set: the fence set is
  // a LITERAL in the plan, so every row of a task re-presents the same
  // string — without the memo `gtid_in_set` re-parses the whole executed
  // set per event (O(events × islands), measured 12 s on a 150k-row sweep
  // query at sf0.1; ~1 s with it). The UTF8String is cloned before
  // caching because Spark may reuse the backing buffer between rows.
  private val lastParsed = new ThreadLocal[(UTF8String, IntervalMap)]
  private def parseCached(s: UTF8String): IntervalMap = {
    val c = lastParsed.get()
    if (c != null && c._1 == s) c._2
    else {
      val m = parse(s.toString)
      lastParsed.set((s.clone(), m))
      m
    }
  }

  // UTF8String entry points for the codegen'd expressions. The right
  // argument (the executed/committed SET) takes the parse memo; the left
  // varies per row.
  def setContains(a: UTF8String, b: UTF8String): Boolean =
    containedWithin(parse(a.toString), parseCached(b))
  def gtidInSet(gtid: UTF8String, set: UTF8String): Boolean =
    containsGtid(parseCached(set), gtid.toString)
  def setUnion(a: UTF8String, b: UTF8String): UTF8String =
    UTF8String.fromString(render(union(parse(a.toString), parseCached(b))))
  def setSubtract(a: UTF8String, b: UTF8String): UTF8String =
    UTF8String.fromString(render(subtract(parse(a.toString), parseCached(b))))
}

object Gtid {

  case class GtidSetContains(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BooleanType
    override def inputTypes: Seq[AbstractType] = Seq(StringType, StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      GtidOps.setContains(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GtidOps.setContains($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class GtidInSet(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BooleanType
    override def inputTypes: Seq[AbstractType] = Seq(StringType, StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      GtidOps.gtidInSet(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GtidOps.gtidInSet($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class GtidSetUnion(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = StringType
    override def inputTypes: Seq[AbstractType] = Seq(StringType, StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      GtidOps.setUnion(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GtidOps.setUnion($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class GtidSetSubtract(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = StringType
    override def inputTypes: Seq[AbstractType] = Seq(StringType, StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      GtidOps.setSubtract(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GtidOps.setSubtract($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private def c(e: Expression): Column = GraftSqlShim.column(e)
  private def x(col: Column): Expression = GraftSqlShim.expression(col)

  /** `a` entirely executed within `b`? (isContainedWithin) */
  def gtid_set_contains(a: Column, b: Column): Column = c(GtidSetContains(x(a), x(b)))
  /** Is the single GTID already in the executed set? */
  def gtid_in_set(gtid: Column, set: Column): Column = c(GtidInSet(x(gtid), x(set)))
  def gtid_set_union(a: Column, b: Column): Column = c(GtidSetUnion(x(a), x(b)))
  def gtid_set_subtract(a: Column, b: Column): Column = c(GtidSetSubtract(x(a), x(b)))

  /** Executed-GTID-set accumulation: feed single GTIDs (`uuid:txid`) or
    * whole set strings; merge is interval UNION, so the partial aggregate
    * is order- and replay-insensitive (exactly how a server's
    * `gtid_executed` grows).
    */
  class GtidSetAgg extends Aggregator[String, String, String] {
    override def zero: String = ""
    override def reduce(buf: String, in: String): String =
      GtidOps.render(GtidOps.union(GtidOps.parse(buf), GtidOps.parse(in)))
    override def merge(a: String, b: String): String =
      GtidOps.render(GtidOps.union(GtidOps.parse(a), GtidOps.parse(b)))
    override def finish(r: String): String = r
    override def bufferEncoder: Encoder[String] = Encoders.STRING
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
