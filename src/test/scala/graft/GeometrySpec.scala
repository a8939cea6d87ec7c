package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}
import graft.operators.{GeometryOps, Transforms}
import graft.operators.GeometryExprs._

/** WKB/EWKB geometry kit: byte-level format conversion, axis swap over
  * every geometry type and byte order, and the SMT wrappers
  * (`GeometryFormatTransformer` / `SwapGeometryCoordinates` analogs).
  */
class GeometrySpec extends SparkSpec {
  import spark.implicits._

  private def bigEndianPoint(x: Double, y: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
    buf.put(0: Byte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  /** ISO WKB Z point (type 1001, three ordinates), little-endian. */
  private def isoZPoint(x: Double, y: Double, z: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(1001).putDouble(x).putDouble(y).putDouble(z)
    buf.array()
  }

  /** Little-endian polygon with one ring of the given xy pairs. */
  private def polygon(coords: Array[Double]): Array[Byte] = {
    val n = coords.length / 2
    val buf = ByteBuffer.allocate(13 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(3).putInt(1).putInt(n)
    coords.foreach(buf.putDouble)
    buf.array()
  }

  /** Little-endian geometry collection of the given members. */
  private def collection(members: Array[Byte]*): Array[Byte] = {
    val buf = ByteBuffer.allocate(9 + members.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(7).putInt(members.size)
    members.foreach(buf.put)
    buf.array()
  }

  test("toEwkb splices srid + flag; toWkb inverts; both idempotent") {
    val p = GeometryOps.point(3.5, -7.25)
    assert(!GeometryOps.isExtended(p))
    val e = GeometryOps.toEwkb(p, 4326)
    assert(GeometryOps.isExtended(e))
    assert(e.length === p.length + 4)
    assert(GeometryOps.sridOrElse(e, -1) === 4326)
    assert(GeometryOps.toEwkb(e, 9999).toSeq === e.toSeq) // already extended: unchanged
    assert(GeometryOps.toWkb(e).toSeq === p.toSeq)
    assert(GeometryOps.toWkb(p).toSeq === p.toSeq)
    // decoding skips the srid word
    assert(GeometryOps.pointX(e) === 3.5 && GeometryOps.pointY(e) === -7.25)
  }

  test("toEwkb/toWkb preserve big-endian payloads") {
    val p = bigEndianPoint(1.0, 2.0)
    val e = GeometryOps.toEwkb(p, 3857)
    assert(GeometryOps.isExtended(e) && GeometryOps.sridOrElse(e, -1) === 3857)
    assert(GeometryOps.toWkb(e).toSeq === p.toSeq)
  }

  test("swapXY handles point / linestring / polygon / collection, both orders") {
    assert(GeometryOps.pointX(GeometryOps.swapXY(GeometryOps.point(1, 2))) === 2.0)
    assert(GeometryOps.pointX(GeometryOps.swapXY(bigEndianPoint(8, 9))) === 9.0)

    val ls = GeometryOps.lineString(Array(1, 2, 3, 4, 5, 6))
    val lsSw = GeometryOps.swapXY(ls)
    assert(GeometryOps.coordSum(lsSw, 0) === 12.0 && GeometryOps.coordSum(lsSw, 1) === 9.0)

    val poly = polygon(Array(0, 1, 2, 3, 4, 5, 0, 1))
    val polySw = GeometryOps.swapXY(poly)
    assert(GeometryOps.coordSum(polySw, 0) === 10.0 && GeometryOps.coordSum(polySw, 1) === 6.0)

    // nested collection members keep their own byte-order marks
    val mixed = collection(bigEndianPoint(10, 20), GeometryOps.lineString(Array(1.0, 2.0)))
    val sw = GeometryOps.swapXY(mixed)
    assert(GeometryOps.coordSum(sw, 0) === 22.0 && GeometryOps.coordSum(sw, 1) === 11.0)
  }

  test("swapXY swaps only x/y of an ISO Z point and preserves z") {
    val sw = GeometryOps.swapXY(isoZPoint(1, 2, 99))
    val buf = ByteBuffer.wrap(sw).order(ByteOrder.LITTLE_ENDIAN)
    assert(buf.getDouble(5) === 2.0 && buf.getDouble(13) === 1.0 && buf.getDouble(21) === 99.0)
  }

  test("swapXY works on EWKB (skips the srid word)") {
    val e = GeometryOps.toEwkb(GeometryOps.point(5, 6), 4326)
    val sw = GeometryOps.swapXY(e)
    assert(GeometryOps.sridOrElse(sw, -1) === 4326)
    assert(GeometryOps.pointX(sw) === 6.0 && GeometryOps.pointY(sw) === 5.0)
  }

  test("property: swap is an involution; ewkb round-trips for any point") {
    val prop = Prop.forAll { (x: Double, y: Double, srid: Int) =>
      val p = GeometryOps.point(x, y)
      GeometryOps.swapXY(GeometryOps.swapXY(p)).toSeq == p.toSeq &&
        GeometryOps.toWkb(GeometryOps.toEwkb(p, srid)).toSeq == p.toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("Transforms.geometryFormat + swapGeometryCoordinates on a DataFrame") {
    val df = Seq((1L, 10.0, 20.0, 4326), (2L, 30.0, 40.0, 2154)).toDF("id", "x", "y", "s")
      .withColumn("geom", struct(wkb_point(col("x"), col("y")).as("wkb"), col("s").as("srid")))
    val out = Transforms.swapGeometryCoordinates(
      Transforms.geometryFormat(df, "geom", "ewkb"), "geom")
      .select(col("id"),
        wkb_point_x(col("geom.wkb")).as("px"),
        ewkb_srid(col("geom.wkb"), lit(-1)).as("so"),
        wkb_is_extended(col("geom.wkb")).as("ext"))
      .as[(Long, Double, Int, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // 4326 is in the default swap list → x becomes y; 2154 is not → x kept
    assert(out(1L) === ((20.0, 4326, true)))
    assert(out(2L) === ((30.0, 2154, true)))
    // round-trip back to plain wkb
    val back = Transforms.geometryFormat(
      Transforms.geometryFormat(df, "geom", "ewkb"), "geom", "wkb")
      .select(wkb_is_extended(col("geom.wkb"))).as[Boolean].collect()
    assert(back.forall(_ == false))
  }

  test("timescaleDb maps chunks to hypertables/aggregates with headers + topic") {
    val events = Seq(
      ("_timescaledb_internal", "_hyper_1_7_chunk"),
      ("_timescaledb_internal", "_hyper_3_9_chunk"),
      ("_timescaledb_internal", "_hyper_9_1_chunk"), // unknown hypertable
      ("public", "plain_table")                      // not a chunk
    ).toDF("sch", "tbl")
    val cat = Seq(
      (1, "public", "conditions", Option.empty[String], Option.empty[String]),
      (3, "_timescaledb_internal", "_materialized_hypertable_3",
        Option("public"), Option("daily_summary")))
      .toDF("hypertable_id", "hyper_schema", "hyper_table", "agg_schema", "agg_table")
    val out = Transforms.timescaleDb(events, cat, "ts",
      schemaCol = col("sch"), tableCol = col("tbl"))
      .select("__ts_chunk_table", "__ts_table", "__topic", "__ts_hypertable_table")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(out === Set(
      ("_hyper_1_7_chunk", "conditions", "ts.public.conditions", null),
      ("_hyper_3_9_chunk", "daily_summary", "ts.public.daily_summary", "_materialized_hypertable_3"),
      ("_hyper_9_1_chunk", "_hyper_9_1_chunk", null, null), // no catalog row: untouched, no topic
      ("plain_table", "plain_table", null, null)))
  }
}
