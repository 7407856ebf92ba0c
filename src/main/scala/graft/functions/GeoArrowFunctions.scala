package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, LineString, MultiLineString,
  MultiPoint, MultiPolygon, Point, Polygon}
import org.locationtech.jts.geom.{Geometry => JtsGeometry}

import graft.geom.GeomIO

/** GeoArrow coordinate-layout codec (GeoParquet 1.1 "geoarrow" column
  * encodings: point / linestring / polygon / multipoint / multilinestring
  * / multipolygon stored as nested struct/list coordinate arrays instead
  * of WKB — the layout the reference reads natively through its Arrow
  * schema, rust/sedona-schema/src/extension_type.rs + geoarrow-rs).
  *
  * Each encoding gets a conversion pair registered under internal SQL
  * names (`sd_togeoarrow_<enc>` / `sd_fromgeoarrow_<enc>`) with the
  * encoding-specific Catalyst type, so GeoParquet read/write compose them
  * as ordinary codegen-integrated expressions; users normally reach them
  * only through `GeoParquet.write(..., encoding = "...")` and reads of
  * geoarrow-encoded files.
  *
  * Layout: leaf coordinates are struct<x: double, y: double> (the spec's
  * separated layout); rings of a polygon list exterior first, holes after
  * (the shell orientation is whatever the WKB carried — GeoParquet leaves
  * winding to `orientation`, which we neither require nor rewrite).
  */
object GeoArrowFunctions {
  import ArgKind._

  val encodings: Seq[String] = Seq("point", "linestring", "polygon",
    "multipoint", "multilinestring", "multipolygon")

  val coordType: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  def dataTypeOf(enc: String): DataType = enc match {
    case "point" => coordType
    case "linestring" | "multipoint" => ArrayType(coordType, containsNull = false)
    case "polygon" | "multilinestring" =>
      ArrayType(ArrayType(coordType, containsNull = false), containsNull = false)
    case "multipolygon" => ArrayType(
      ArrayType(ArrayType(coordType, containsNull = false), containsNull = false),
      containsNull = false)
    case other => throw new IllegalArgumentException(
      s"geoarrow: unsupported encoding '$other' (${encodings.mkString(", ")})")
  }

  // ---- JTS -> Catalyst ----

  private def coordRow(c: Coordinate): InternalRow =
    new GenericInternalRow(Array[Any](c.x, c.y))
  private def coords(cs: Array[Coordinate]): GenericArrayData =
    new GenericArrayData(cs.map(coordRow).toArray[Any])
  private def rings(p: Polygon): GenericArrayData =
    new GenericArrayData((Seq(p.getExteriorRing) ++
      (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
      .map(r => coords(r.getCoordinates)).toArray[Any])

  def encode(g: JtsGeometry, enc: String): Any = (enc, g) match {
    // empty point is null; other empties are zero-length lists
    case ("point", p: Point) => if (p.isEmpty) null else coordRow(p.getCoordinate)
    case ("linestring", l: LineString) => coords(l.getCoordinates)
    case ("multipoint", m: MultiPoint) => coords(m.getCoordinates)
    case ("polygon", p: Polygon) =>
      if (p.isEmpty) new GenericArrayData(Array.empty[Any]) else rings(p)
    case ("multilinestring", m: MultiLineString) =>
      new GenericArrayData((0 until m.getNumGeometries)
        .map(i => coords(m.getGeometryN(i).getCoordinates)).toArray[Any])
    case ("multipolygon", m: MultiPolygon) =>
      new GenericArrayData((0 until m.getNumGeometries)
        .map(i => rings(m.getGeometryN(i).asInstanceOf[Polygon])).toArray[Any])
    case (e, gg) => throw new IllegalArgumentException(
      s"geoarrow: cannot store ${gg.getGeometryType} in a '$e'-encoded column")
  }

  // ---- Catalyst -> JTS ----

  private def coordOf(r: InternalRow): Coordinate =
    new Coordinate(r.getDouble(0), r.getDouble(1))
  private def coordSeq(a: ArrayData): Array[Coordinate] =
    Array.tabulate(a.numElements())(i => coordOf(a.getStruct(i, 2)))
  private def polygonOf(ringsArr: ArrayData): Polygon = {
    val f = GeomIO.factory
    if (ringsArr.numElements() == 0) return f.createPolygon()
    val shell = f.createLinearRing(coordSeq(ringsArr.getArray(0)))
    val holes = Array.tabulate(ringsArr.numElements() - 1)(i =>
      f.createLinearRing(coordSeq(ringsArr.getArray(i + 1))))
    f.createPolygon(shell, holes)
  }

  def decode(v: Any, enc: String): JtsGeometry = {
    val f = GeomIO.factory
    enc match {
      case "point" => v match {
        case null => f.createPoint()
        case r: InternalRow => f.createPoint(coordOf(r))
      }
      case "linestring" => f.createLineString(coordSeq(v.asInstanceOf[ArrayData]))
      case "multipoint" => f.createMultiPointFromCoords(coordSeq(v.asInstanceOf[ArrayData]))
      case "polygon" => polygonOf(v.asInstanceOf[ArrayData])
      case "multilinestring" =>
        val a = v.asInstanceOf[ArrayData]
        f.createMultiLineString(Array.tabulate(a.numElements())(i =>
          f.createLineString(coordSeq(a.getArray(i)))))
      case "multipolygon" =>
        val a = v.asInstanceOf[ArrayData]
        f.createMultiPolygon(Array.tabulate(a.numElements())(i =>
          polygonOf(a.getArray(i))))
      case other => throw new IllegalArgumentException(
        s"geoarrow: unsupported encoding '$other'")
    }
  }

  /** sd_togeoarrow_<enc>(geom) -> nested value; sd_fromgeoarrow_<enc>
    * (nested) -> geometry (WKB). */
  val registry: Map[String, Seq[Expression] => Expression] =
    encodings.flatMap { enc =>
      Seq(
        s"sd_togeoarrow_$enc" -> ((children: Seq[Expression]) =>
          GeomScalar(s"sd_togeoarrow_$enc", children, dataTypeOf(enc), Seq(Geom),
            a => encode(a(0).asInstanceOf[JtsGeometry], enc)): Expression),
        s"sd_fromgeoarrow_$enc" -> ((children: Seq[Expression]) =>
          GeomScalar(s"sd_fromgeoarrow_$enc", children, BinaryType, Seq(Raw),
            a => decode(a(0), enc)): Expression))
    }.toMap
}
