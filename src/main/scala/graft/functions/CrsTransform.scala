package graft.functions

import org.locationtech.jts.geom.{CoordinateSequence, CoordinateSequenceFilter, Geometry}

/** Hand-coded CRS math replacing the reference's PROJ engine
  * (c/sedona-proj/src/transform.rs:36,258). Scope: the EPSG codes the
  * engine declares — 4326 (lon/lat), 3857 (web mercator), UTM zones
  * 326xx/327xx (WGS84). Anything else errors loudly, matching the
  * reference's lazy-error behavior (rust/sedona/src/context.rs:128-130).
  *
  * Formulas are the published spherical-mercator and Transverse Mercator
  * (Karney/Snyder series) expansions.
  */
object CrsTransform {
  private val R = 6378137.0 // WGS84 semi-major
  private val MaxMerc = 20037508.342789244
  // WGS84 ellipsoid for UTM
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val K0 = 0.9996
  private val FalseEasting = 500000.0

  sealed trait Crs
  case object LonLat extends Crs
  case object WebMercator extends Crs
  case class Utm(zone: Int, south: Boolean) extends Crs

  def parse(code: String): Crs = {
    val c = code.trim.toUpperCase.stripPrefix("EPSG:")
    c.toInt match {
      case 4326 => LonLat
      case 3857 => WebMercator
      case z if z >= 32601 && z <= 32660 => Utm(z - 32600, south = false)
      case z if z >= 32701 && z <= 32760 => Utm(z - 32700, south = true)
      case other => throw new IllegalArgumentException(
        s"Unsupported CRS EPSG:$other (supported: 4326, 3857, UTM 326xx/327xx)")
    }
  }

  private def lonLatToMerc(lon: Double, lat: Double): (Double, Double) = {
    val x = lon * MaxMerc / 180.0
    val y = math.log(math.tan((90.0 + lat) * math.Pi / 360.0)) / math.Pi * MaxMerc
    (x, y)
  }

  private def mercToLonLat(x: Double, y: Double): (Double, Double) = {
    val lon = x / MaxMerc * 180.0
    val lat = math.atan(math.exp(y * math.Pi / MaxMerc)) * 360.0 / math.Pi - 90.0
    (lon, lat)
  }

  /** Transverse Mercator forward (Snyder 8-12..8-15, ellipsoidal). */
  private def lonLatToUtm(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lam0 = math.toRadians((zone - 1) * 6 - 180 + 3)
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    val ep2 = E2 / (1 - E2)
    val n = R / math.sqrt(1 - E2 * math.sin(phi) * math.sin(phi))
    val t = math.tan(phi) * math.tan(phi)
    val c = ep2 * math.cos(phi) * math.cos(phi)
    val aa = math.cos(phi) * (lam - lam0)
    val m = R * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * phi
      - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * phi)
      + (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * phi)
      - (35 * E2 * E2 * E2 / 3072) * math.sin(6 * phi))
    val x = K0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120) + FalseEasting
    val y0 = K0 * (m + n * math.tan(phi) * (aa * aa / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720))
    val y = if (south) y0 + 10000000.0 else y0
    (x, y)
  }

  private def utmToLonLat(x: Double, y: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lam0 = math.toRadians((zone - 1) * 6 - 180 + 3)
    val ep2 = E2 / (1 - E2)
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val xm = x - FalseEasting
    val ym = if (south) y - 10000000.0 else y
    val m = ym / K0
    val mu = m / (R * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val c1 = ep2 * math.cos(phi1) * math.cos(phi1)
    val t1 = math.tan(phi1) * math.tan(phi1)
    val n1 = R / math.sqrt(1 - E2 * math.sin(phi1) * math.sin(phi1))
    val r1 = R * (1 - E2) / math.pow(1 - E2 * math.sin(phi1) * math.sin(phi1), 1.5)
    val dd = xm / (n1 * K0)
    val phi = phi1 - (n1 * math.tan(phi1) / r1) * (dd * dd / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(dd, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1)
        * math.pow(dd, 6) / 720)
    val lam = lam0 + (dd - (1 + 2 * t1 + c1) * math.pow(dd, 3) / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1)
        * math.pow(dd, 5) / 120) / math.cos(phi1)
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** Single-point transform between two parsed CRS. */
  def transformPoint(x: Double, y: Double, src: Crs, dst: Crs): (Double, Double) = {
    if (src == dst) return (x, y)
    val (lon, lat) = src match {
      case LonLat => (x, y)
      case WebMercator => mercToLonLat(x, y)
      case Utm(z, s) => utmToLonLat(x, y, z, s)
    }
    dst match {
      case LonLat => (lon, lat)
      case WebMercator => lonLatToMerc(lon, lat)
      case Utm(z, s) => lonLatToUtm(lon, lat, z, s)
    }
  }

  def transform(g: Geometry, from: String, to: String): Geometry = {
    val src = parse(from)
    val dst = parse(to)
    if (src == dst) return g
    val out = g.copy()
    out.apply(new CoordinateSequenceFilter {
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        val x = seq.getOrdinate(i, 0)
        val y = seq.getOrdinate(i, 1)
        val (nx, ny) = transformPoint(x, y, src, dst)
        seq.setOrdinate(i, 0, nx)
        seq.setOrdinate(i, 1, ny)
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = true
    })
    out.geometryChanged()
    out.setSRID(to.trim.toUpperCase.stripPrefix("EPSG:").toInt)
    out
  }
}
