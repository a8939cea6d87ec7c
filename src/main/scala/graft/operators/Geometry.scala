package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.GraftSqlShim.AbstractType
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, IntegerType}

/** Byte-level helpers over OGC Well-Known-Binary (WKB) and PostGIS
  * Extended WKB (EWKB) geometry payloads. Format facts are the public
  * specs (OGC 06-103r4 §8; PostGIS EWKB): byte 0 is the byte-order mark
  * (0 = big-endian XDR, 1 = little-endian NDR), bytes 1-4 the geometry
  * type word in that order. EWKB packs flags into the type word —
  * 0x20000000 = SRID present (4-byte srid follows the type word),
  * 0x80000000 = Z, 0x40000000 = M; ISO WKB instead encodes Z/M/ZM as
  * type + 1000/2000/3000. Base types: 1 point, 2 linestring, 3 polygon,
  * 4 multipoint, 5 multilinestring, 6 multipolygon, 7 collection
  * (elements of 4-7 are full nested WKBs with their own byte-order mark).
  *
  * Mirrors the behavior of the reference's geometry kit
  * (`debezium-connector-common/src/main/java/io/debezium/spatial/GeometryBytes.java:67-121`,
  * its traverser/format-converter companions) re-expressed as plain
  * static byte[] functions so the Catalyst expressions below can invoke
  * them from whole-stage-generated code (Scala objects without a
  * companion class compile to static forwarders).
  */
object GeometryOps {

  final val SridFlag = 0x20000000
  final val ZFlag = 0x80000000
  final val MFlag = 0x40000000

  private def byteOrder(mark: Byte): ByteOrder =
    if (mark == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

  /** True iff the payload is EWKB (SRID flag set in the type word). */
  def isExtended(wkb: Array[Byte]): Boolean = {
    if (wkb == null || wkb.length < 5) return false
    val buf = ByteBuffer.wrap(wkb)
    buf.order(byteOrder(buf.get()))
    (buf.getInt & SridFlag) != 0
  }

  /** SRID embedded in an EWKB payload, or `dflt` for plain WKB. */
  def sridOrElse(wkb: Array[Byte], dflt: Int): Int = {
    if (wkb == null || wkb.length < 9) return dflt
    val buf = ByteBuffer.wrap(wkb)
    buf.order(byteOrder(buf.get()))
    if ((buf.getInt & SridFlag) != 0) buf.getInt else dflt
  }

  /** WKB → EWKB: set the SRID flag and splice the 4-byte srid after the
    * type word (reference: `GeometryFormatConverter.toExtendedWkb`).
    * Already-extended payloads are returned unchanged.
    */
  def toEwkb(wkb: Array[Byte], srid: Int): Array[Byte] = {
    if (wkb == null || wkb.length < 5 || isExtended(wkb)) return wkb
    val bo = byteOrder(wkb(0))
    val out = new Array[Byte](wkb.length + 4)
    out(0) = wkb(0)
    val in = ByteBuffer.wrap(wkb); in.order(bo); in.get()
    val buf = ByteBuffer.wrap(out); buf.order(bo); buf.position(1)
    buf.putInt(in.getInt | SridFlag)
    buf.putInt(srid)
    System.arraycopy(wkb, 5, out, 9, wkb.length - 5)
    out
  }

  /** EWKB → WKB: clear the SRID flag and drop the srid bytes
    * (reference: `GeometryFormatConverter.toWkb`). Plain WKB unchanged.
    */
  def toWkb(wkb: Array[Byte]): Array[Byte] = {
    if (wkb == null || wkb.length < 9 || !isExtended(wkb)) return wkb
    val bo = byteOrder(wkb(0))
    val in = ByteBuffer.wrap(wkb); in.order(bo); in.get()
    val typeWord = in.getInt & ~SridFlag
    val out = new Array[Byte](wkb.length - 4)
    out(0) = wkb(0)
    val buf = ByteBuffer.wrap(out); buf.order(bo); buf.position(1)
    buf.putInt(typeWord)
    System.arraycopy(wkb, 9, out, 5, wkb.length - 9)
    out
  }

  /** Swap x/y in every coordinate of the geometry (EPSG ↔ GIS axis
    * order), preserving byte order, SRID, and Z/M ordinates — the
    * analog of `GeometryCoordinateSwapper.swapNoCheck` reached from
    * `SwapGeometryCoordinates.java:120-135`. Returns a new array.
    */
  def swapXY(wkb: Array[Byte]): Array[Byte] = {
    if (wkb == null || wkb.length < 5) return wkb
    val out = wkb.clone()
    swapGeom(ByteBuffer.wrap(out))
    out
  }

  /** Sum of the x (which=0) or y (which=1) ordinate over every
    * coordinate in the geometry — a traversal-exercising scalar used by
    * specs and the oracle query to verify deep swaps declaratively.
    */
  def coordSum(wkb: Array[Byte], which: Int): Double = {
    if (wkb == null || wkb.length < 5) return 0d
    sumGeom(ByteBuffer.wrap(wkb), which)
  }

  // -- traversal -----------------------------------------------------------

  /** Reads the geometry header at the buffer position: returns
    * (baseType, coordinate dimension count) and leaves the position at
    * the start of the body (after any srid word).
    */
  private def header(buf: ByteBuffer): (Int, Int) = {
    buf.order(byteOrder(buf.get()))
    val typeWord = buf.getInt
    val ewkbZ = (typeWord & ZFlag) != 0
    val ewkbM = (typeWord & MFlag) != 0
    if ((typeWord & SridFlag) != 0) buf.getInt // skip srid
    val isoType = typeWord & 0x0fffffff
    val isoDims = (isoType / 1000) match {
      case 1 | 2 => 1 // Z or M
      case 3     => 2 // ZM
      case _     => 0
    }
    val dims = 2 + isoDims + (if (ewkbZ) 1 else 0) + (if (ewkbM) 1 else 0)
    (isoType % 1000, dims)
  }

  private def swapGeom(buf: ByteBuffer): Unit = {
    val (base, dims) = header(buf)
    base match {
      case 1 => swapPoint(buf, dims)
      case 2 =>
        val n = buf.getInt
        var i = 0; while (i < n) { swapPoint(buf, dims); i += 1 }
      case 3 =>
        val rings = buf.getInt
        var r = 0
        while (r < rings) {
          val n = buf.getInt
          var i = 0; while (i < n) { swapPoint(buf, dims); i += 1 }
          r += 1
        }
      case 4 | 5 | 6 | 7 =>
        val n = buf.getInt
        var i = 0; while (i < n) { swapGeom(buf); i += 1 }
      case _ => // unknown type: leave body untouched
    }
  }

  private def swapPoint(buf: ByteBuffer, dims: Int): Unit = {
    val p = buf.position()
    val x = buf.getDouble(p)
    buf.putDouble(p, buf.getDouble(p + 8))
    buf.putDouble(p + 8, x)
    buf.position(p + dims * 8)
  }

  private def sumGeom(buf: ByteBuffer, which: Int): Double = {
    val (base, dims) = header(buf)
    var acc = 0d
    def points(n: Int): Unit = {
      var i = 0
      while (i < n) {
        acc += buf.getDouble(buf.position() + which * 8)
        buf.position(buf.position() + dims * 8)
        i += 1
      }
    }
    base match {
      case 1 => points(1)
      case 2 => points(buf.getInt)
      case 3 =>
        val rings = buf.getInt
        var r = 0; while (r < rings) { points(buf.getInt); r += 1 }
      case 4 | 5 | 6 | 7 =>
        val n = buf.getInt
        var i = 0; while (i < n) { acc += sumGeom(buf, which); i += 1 }
      case _ =>
    }
    acc
  }

  // -- constructors / accessors (deterministic test + query surface) -------

  /** Little-endian 2D WKB point. */
  def point(x: Double, y: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  /** Little-endian 2D WKB linestring from interleaved x0,y0,x1,y1,… */
  def lineString(coords: Array[Double]): Array[Byte] = {
    val n = coords.length / 2
    val buf = ByteBuffer.allocate(9 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1: Byte).putInt(2).putInt(n)
    var i = 0
    while (i < 2 * n) { buf.putDouble(coords(i)); i += 1 }
    buf.array()
  }

  /** X ordinate of a (E)WKB point (first coordinate of the body). */
  def pointX(wkb: Array[Byte]): Double = coordAt(wkb, 0)

  /** Y ordinate of a (E)WKB point. */
  def pointY(wkb: Array[Byte]): Double = coordAt(wkb, 1)

  private def coordAt(wkb: Array[Byte], which: Int): Double = {
    val buf = ByteBuffer.wrap(wkb)
    header(buf)
    buf.getDouble(buf.position() + which * 8)
  }
}

/** Catalyst expressions over the helpers above. Each generates a direct
  * static call inside whole-stage codegen — the "native `Expression`
  * beats a UDF" path: no encoder boundary, null handling handled by the
  * `BinaryExpression`/`UnaryExpression` null-intolerant contract.
  */
object GeometryExprs {

  abstract class GeomUnary(fn: String, out: DataType) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = out
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
    override def nullIntolerant: Boolean = true
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.GeometryOps.$fn($c)")
  }

  case class WkbIsExtended(child: Expression) extends GeomUnary("isExtended", BooleanType) {
    override protected def nullSafeEval(v: Any): Any =
      GeometryOps.isExtended(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class EwkbToWkb(child: Expression) extends GeomUnary("toWkb", BinaryType) {
    override protected def nullSafeEval(v: Any): Any =
      GeometryOps.toWkb(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WkbSwapXY(child: Expression) extends GeomUnary("swapXY", BinaryType) {
    override protected def nullSafeEval(v: Any): Any =
      GeometryOps.swapXY(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WkbPointX(child: Expression) extends GeomUnary("pointX", DoubleType) {
    override protected def nullSafeEval(v: Any): Any =
      GeometryOps.pointX(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WkbPointY(child: Expression) extends GeomUnary("pointY", DoubleType) {
    override protected def nullSafeEval(v: Any): Any =
      GeometryOps.pointY(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  abstract class GeomBinary(fn: String, out: DataType, rightType: AbstractType)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = out
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType, rightType)
    override def nullIntolerant: Boolean = true
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GeometryOps.$fn($a, $b)")
  }

  case class WkbToEwkb(left: Expression, right: Expression)
      extends GeomBinary("toEwkb", BinaryType, IntegerType) {
    override protected def nullSafeEval(wkb: Any, srid: Any): Any =
      GeometryOps.toEwkb(wkb.asInstanceOf[Array[Byte]], srid.asInstanceOf[Int])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class EwkbSrid(left: Expression, right: Expression)
      extends GeomBinary("sridOrElse", IntegerType, IntegerType) {
    override protected def nullSafeEval(wkb: Any, dflt: Any): Any =
      GeometryOps.sridOrElse(wkb.asInstanceOf[Array[Byte]], dflt.asInstanceOf[Int])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class WkbCoordSum(left: Expression, right: Expression)
      extends GeomBinary("coordSum", DoubleType, IntegerType) {
    override protected def nullSafeEval(wkb: Any, which: Any): Any =
      GeometryOps.coordSum(wkb.asInstanceOf[Array[Byte]], which.asInstanceOf[Int])
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class WkbLineString(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BinaryType
    override def inputTypes: Seq[AbstractType] =
      Seq(org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false))
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      GeometryOps.lineString(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray())
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.GeometryOps.lineString($c.toDoubleArray())")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WkbPoint(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BinaryType
    override def inputTypes: Seq[AbstractType] = Seq(DoubleType, DoubleType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(x: Any, y: Any): Any =
      GeometryOps.point(x.asInstanceOf[Double], y.asInstanceOf[Double])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.operators.GeometryOps.point($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // Column lifts.
  private def c(e: Expression): Column = GraftSqlShim.column(e)
  private def x(col: Column): Expression = GraftSqlShim.expression(col)

  def wkb_is_extended(w: Column): Column = c(WkbIsExtended(x(w)))
  def wkb_to_ewkb(w: Column, srid: Column): Column = c(WkbToEwkb(x(w), x(srid)))
  def ewkb_to_wkb(w: Column): Column = c(EwkbToWkb(x(w)))
  def ewkb_srid(w: Column, dflt: Column): Column = c(EwkbSrid(x(w), x(dflt)))
  def wkb_swap_xy(w: Column): Column = c(WkbSwapXY(x(w)))
  def wkb_coord_sum(w: Column, which: Column): Column = c(WkbCoordSum(x(w), x(which)))
  def wkb_point(px: Column, py: Column): Column = c(WkbPoint(x(px), x(py)))
  def wkb_linestring(coords: Column): Column = c(WkbLineString(x(coords)))
  def wkb_point_x(w: Column): Column = c(WkbPointX(x(w)))
  def wkb_point_y(w: Column): Column = c(WkbPointY(x(w)))
}
