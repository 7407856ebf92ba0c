package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** WKB <-> JTS bridge. The engine's geometry model mirrors the reference
  * (SedonaDB `SedonaType::Wkb`, rust/sedona-schema/src/datatypes.rs:33-49):
  * geometry travels through Spark as EWKB bytes in a plain BinaryType
  * column, SRID carried in the EWKB header. No UDT — expressions decode
  * per-row exactly like the reference's per-batch WkbExecutor
  * (rust/sedona-functions/src/executor.rs:83).
  *
  * All readers/writers are thread-local: JTS parser objects are not
  * thread-safe and Spark evaluates expressions on many task threads.
  */
object GeomIO {
  val factory = new GeometryFactory(new PrecisionModel(), 0)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => {
    val r = new WKTReader(factory); r.setIsOldJtsCoordinateSyntaxAllowed(false); r
  })
  private val wkbWriter2 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2, true))
  private val wkbWriter3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3, true))
  private val wkbWriterPlain2 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2, false))
  private val wkbWriterPlain3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3, false))
  private val wktWriter2 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))
  private val wktWriter3 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(3))

  @inline def hasZ(g: Geometry): Boolean = {
    val c = g.getCoordinate
    c != null && !java.lang.Double.isNaN(c.getZ)
  }

  def read(bytes: Array[Byte]): Geometry = wkbReader.get.read(bytes)

  def write(g: Geometry): Array[Byte] =
    (if (hasZ(g)) wkbWriter3 else wkbWriter2).get.write(g)

  /** Plain ISO WKB without the EWKB SRID flag (ST_AsBinary semantics). */
  def writePlain(g: Geometry): Array[Byte] =
    (if (hasZ(g)) wkbWriterPlain3 else wkbWriterPlain2).get.write(g)

  def readWkt(s: String): Geometry = wktReader.get.read(s)

  def writeWkt(g: Geometry): String =
    (if (hasZ(g)) wktWriter3 else wktWriter2).get.write(g)

  def point(x: Double, y: Double): Geometry =
    factory.createPoint(new Coordinate(x, y))

  def pointZ(x: Double, y: Double, z: Double): Geometry =
    factory.createPoint(new Coordinate(x, y, z))

  /** Axis-aligned rectangle polygon (ST_MakeEnvelope). */
  def envelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry =
    factory.toGeometry(new Envelope(xmin, xmax, ymin, ymax))

  def setSrid(g: Geometry, srid: Int): Geometry = {
    val c = g.copy(); c.setSRID(srid); c
  }

  /** GeoJSON reader via Jackson (ships with Spark) — reference:
    * ST_GeomFromGeoJSON. Supports all seven geometry types. */
  def fromGeoJson(json: String): Geometry = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val root = new ObjectMapper().readTree(json)
    def coord(n: JsonNode): Coordinate =
      if (n.size() > 2) new Coordinate(n.get(0).asDouble, n.get(1).asDouble, n.get(2).asDouble)
      else new Coordinate(n.get(0).asDouble, n.get(1).asDouble)
    def coords(n: JsonNode): Array[Coordinate] =
      (0 until n.size()).map(i => coord(n.get(i))).toArray
    def ring(n: JsonNode): LinearRing = factory.createLinearRing(coords(n))
    def polygon(n: JsonNode): Polygon = {
      val shell = ring(n.get(0))
      val holes = (1 until n.size()).map(i => ring(n.get(i))).toArray
      factory.createPolygon(shell, holes)
    }
    def build(node: JsonNode): Geometry = {
      val c = node.get("coordinates")
      node.get("type").asText match {
        case "Point" =>
          if (c.size() == 0) factory.createPoint() else factory.createPoint(coord(c))
        case "LineString" => factory.createLineString(coords(c))
        case "Polygon" =>
          if (c.size() == 0) factory.createPolygon() else polygon(c)
        case "MultiPoint" =>
          factory.createMultiPoint(
            (0 until c.size()).map(i => factory.createPoint(coord(c.get(i)))).toArray)
        case "MultiLineString" =>
          factory.createMultiLineString(
            (0 until c.size()).map(i => factory.createLineString(coords(c.get(i)))).toArray)
        case "MultiPolygon" =>
          factory.createMultiPolygon(
            (0 until c.size()).map(i => polygon(c.get(i))).toArray)
        case "GeometryCollection" =>
          val gs = node.get("geometries")
          factory.createGeometryCollection(
            (0 until gs.size()).map(i => build(gs.get(i))).toArray)
        case other => throw new IllegalArgumentException(s"unknown GeoJSON type $other")
      }
    }
    build(root)
  }

  /** Minimal GeoJSON writer (geometry only) — reference: ST_AsGeoJSON in
    * rust/sedona-geo/src/register.rs. */
  def toGeoJson(g: Geometry): String = {
    def fmtNum(d: Double): String =
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def coord(c: Coordinate): String = s"[${fmtNum(c.x)},${fmtNum(c.y)}]"
    def coords(cs: Array[Coordinate]): String = cs.map(coord).mkString("[", ",", "]")
    g match {
      case p: Point => s"""{"type":"Point","coordinates":${coord(p.getCoordinate)}}"""
      case l: LineString => s"""{"type":"LineString","coordinates":${coords(l.getCoordinates)}}"""
      case p: Polygon =>
        val rings = (Seq(p.getExteriorRing) ++
          (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
          .map(r => coords(r.getCoordinates)).mkString("[", ",", "]")
        s"""{"type":"Polygon","coordinates":$rings}"""
      case m: MultiPoint =>
        val cs = (0 until m.getNumGeometries).map(i => coord(m.getGeometryN(i).getCoordinate))
        s"""{"type":"MultiPoint","coordinates":${cs.mkString("[", ",", "]")}}"""
      case m: MultiLineString =>
        val ls = (0 until m.getNumGeometries)
          .map(i => coords(m.getGeometryN(i).getCoordinates))
        s"""{"type":"MultiLineString","coordinates":${ls.mkString("[", ",", "]")}}"""
      case m: MultiPolygon =>
        val ps = (0 until m.getNumGeometries).map { i =>
          val p = m.getGeometryN(i).asInstanceOf[Polygon]
          (Seq(p.getExteriorRing) ++
            (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
            .map(r => coords(r.getCoordinates)).mkString("[", ",", "]")
        }
        s"""{"type":"MultiPolygon","coordinates":${ps.mkString("[", ",", "]")}}"""
      case gc: GeometryCollection =>
        val gs = (0 until gc.getNumGeometries).map(i => toGeoJson(gc.getGeometryN(i)))
        s"""{"type":"GeometryCollection","geometries":${gs.mkString("[", ",", "]")}}"""
    }
  }
}
