package graft.functions

import org.locationtech.jts.geom.{Geometry, LineString, MultiPolygon, Point, Polygon}

/** Spherical (geography) kernels — the common subset of the reference's
  * S2-backed geography functions (c/sedona-s2geography/src/kernels.rs:68-226)
  * on a mean-radius sphere. Input coordinates are lon/lat degrees
  * (EPSG:4326). No S2 offline; haversine + spherical excess cover
  * distance/dwithin/length/area/perimeter.
  */
object Spherical {
  /** IUGG mean Earth radius, meters (same constant the oracle SQL uses). */
  final val R = 6371008.8

  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dphi = math.toRadians(lat2 - lat1)
    val dlam = math.toRadians(lon2 - lon1)
    val a = math.sin(dphi / 2) * math.sin(dphi / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dlam / 2) * math.sin(dlam / 2)
    2 * R * math.asin(math.sqrt(a))
  }

  /** Great-circle distance; points only (the reference's s2 distance is
    * general — vertex-pair minimum is a v2 extension). */
  def distance(a: Geometry, b: Geometry): Any = (a, b) match {
    case (p: Point, q: Point) if !p.isEmpty && !q.isEmpty =>
      haversine(p.getX, p.getY, q.getX, q.getY)
    case _ => null
  }

  /** Sum of per-segment haversines over linear components. */
  def length(g: Geometry): Any = g match {
    case l: LineString =>
      val cs = l.getCoordinates
      var s = 0.0
      var i = 1
      while (i < cs.length) {
        s += haversine(cs(i - 1).x, cs(i - 1).y, cs(i).x, cs(i).y); i += 1
      }
      s
    case _ => null
  }

  private def ringArea(cs: Array[org.locationtech.jts.geom.Coordinate]): Double = {
    // spherical excess via the lon-difference / sin-lat sum formula
    var s = 0.0
    var i = 1
    while (i < cs.length) {
      s += math.toRadians(cs(i).x - cs(i - 1).x) *
        (2 + math.sin(math.toRadians(cs(i - 1).y)) + math.sin(math.toRadians(cs(i).y)))
      i += 1
    }
    math.abs(s) * R * R / 2
  }

  /** Spherical area of polygonal geometry (holes subtracted). */
  def area(g: Geometry): Any = g match {
    case p: Polygon =>
      ringArea(p.getExteriorRing.getCoordinates) -
        (0 until p.getNumInteriorRing).map(i => ringArea(p.getInteriorRingN(i).getCoordinates)).sum
    case m: MultiPolygon =>
      (0 until m.getNumGeometries).map(i => area(m.getGeometryN(i)).asInstanceOf[Double]).sum
    case _ => 0.0
  }

  def perimeter(g: Geometry): Any = g match {
    case p: Polygon =>
      (Seq(p.getExteriorRing) ++
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(r => length(r).asInstanceOf[Double]).sum
    case m: MultiPolygon =>
      (0 until m.getNumGeometries).map(i => perimeter(m.getGeometryN(i)).asInstanceOf[Double]).sum
    case _ => 0.0
  }
}
