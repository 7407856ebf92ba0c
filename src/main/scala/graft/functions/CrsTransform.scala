package graft.functions

import org.locationtech.jts.geom.{CoordinateSequence, CoordinateSequenceFilter, Geometry}

/** Hand-coded CRS math replacing the reference's PROJ engine
  * (c/sedona-proj/src/transform.rs:36,258). Scope: a practical subset of
  * EPSG codes on WGS84-compatible datums —
  *
  *  - 4326 (lon/lat), 3857 (spherical web mercator), 3395 (ellipsoidal
  *    world mercator)
  *  - UTM on WGS84 (326xx/327xx) and on ETRS89/GRS80 (25828-25838)
  *  - 2154 Lambert-93 (RGF93, Lambert Conformal Conic 2SP)
  *  - 3035 ETRS89-extended LAEA Europe (Lambert Azimuthal Equal Area)
  *  - 5070 NAD83 Conus Albers (Albers Equal Area)
  *
  * Anything else errors loudly, matching the reference's lazy-error
  * behavior (rust/sedona/src/context.rs:128-130). Datums here (RGF93,
  * ETRS89, NAD83) are treated as coincident with WGS84 — sub-meter for
  * the European frames, ~1 m for NAD83 — so no Helmert shift step;
  * CRS on legacy datums (e.g. OSGB36/27700) are intentionally absent.
  *
  * Formulas: spherical mercator; Transverse Mercator, LCC 2SP, Albers
  * and LAEA in their ellipsoidal forms from Snyder, *Map Projections —
  * A Working Manual* (USGS PP 1395), eqs. 7-x/8-x/14-x/15-x/24-x.
  */
object CrsTransform {
  private val MaxMerc = 20037508.342789244

  /** Reference ellipsoid (semi-major axis, flattening). GRS80 and WGS84
    * differ by 0.1 mm in semi-minor axis; kept distinct for fidelity. */
  final case class Ellipsoid(a: Double, f: Double) {
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
  }
  private val Wgs84 = Ellipsoid(6378137.0, 1.0 / 298.257223563)
  private val Grs80 = Ellipsoid(6378137.0, 1.0 / 298.257222101)

  sealed trait Crs
  case object LonLat extends Crs
  case object WebMercator extends Crs
  case class Utm(zone: Int, south: Boolean) extends Crs
  /** Any projection with closed-form forward/inverse on a WGS84-like
    * datum. */
  case class Projected(epsg: Int, proj: Projection) extends Crs {
    // identity by EPSG code, so src == dst shortcuts work
    override def equals(o: Any): Boolean = o match {
      case Projected(e, _) => e == epsg
      case _ => false
    }
    override def hashCode: Int = epsg
  }

  def parse(code: String): Crs = {
    val c = code.trim.toUpperCase.stripPrefix("EPSG:")
    c.toInt match {
      case 4326 => LonLat
      case 3857 => WebMercator
      case z if z >= 32601 && z <= 32660 => Utm(z - 32600, south = false)
      case z if z >= 32701 && z <= 32760 => Utm(z - 32700, south = true)
      case z if z >= 25828 && z <= 25838 => // ETRS89 / UTM zone 28N-38N
        Projected(z, TransverseMercator(Grs80, lon0 = (z - 25800 - 1) * 6 - 180 + 3,
          k0 = 0.9996, fe = 500000.0, fn = 0.0))
      case 3395 => Projected(3395, EllipsoidalMercator(Wgs84))
      case 2154 => Projected(2154, LambertConformal2SP(Grs80,
        lat0 = 46.5, lon0 = 3.0, sp1 = 49.0, sp2 = 44.0, fe = 700000.0, fn = 6600000.0))
      case 3035 => Projected(3035, LambertAzimuthalEqualArea(Grs80,
        lat0 = 52.0, lon0 = 10.0, fe = 4321000.0, fn = 3210000.0))
      case 5070 => Projected(5070, AlbersEqualArea(Grs80,
        lat0 = 23.0, lon0 = -96.0, sp1 = 29.5, sp2 = 45.5, fe = 0.0, fn = 0.0))
      case other => throw new IllegalArgumentException(
        s"Unsupported CRS EPSG:$other (supported: 4326, 3857, 3395, UTM 326xx/327xx, " +
          "ETRS89 UTM 258xx, 2154, 3035, 5070)")
    }
  }

  /** Projection contract: degrees lon/lat ↔ projected metres. */
  sealed trait Projection {
    def fwd(lon: Double, lat: Double): (Double, Double)
    def inv(x: Double, y: Double): (Double, Double)
  }

  // ---- shared ellipsoidal helpers (Snyder notation) ----

  /** m(φ) = cosφ / sqrt(1 - e² sin²φ) (Snyder 14-15). */
  @inline private def mFn(el: Ellipsoid, phi: Double): Double =
    math.cos(phi) / math.sqrt(1 - el.e2 * math.sin(phi) * math.sin(phi))

  /** t(φ) for conformal projections (Snyder 15-9). */
  @inline private def tFn(el: Ellipsoid, phi: Double): Double = {
    val es = el.e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - es) / (1 + es), el.e / 2)
  }

  /** Inverse of t(φ) by fixed-point iteration (Snyder 7-9). */
  private def phiFromT(el: Ellipsoid, t: Double): Double = {
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    while (i < 15) {
      val es = el.e * math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - es) / (1 + es), el.e / 2))
      if (math.abs(next - phi) < 1e-13) { phi = next; i = 15 } else { phi = next; i += 1 }
    }
    phi
  }

  /** q(φ) for equal-area projections (Snyder 3-12). */
  @inline private def qFn(el: Ellipsoid, phi: Double): Double = {
    val s = math.sin(phi)
    val es = el.e * s
    (1 - el.e2) * (s / (1 - es * es) -
      (1 / (2 * el.e)) * math.log((1 - es) / (1 + es)))
  }

  /** φ from q by Newton iteration (Snyder 3-16). */
  private def phiFromQ(el: Ellipsoid, q: Double): Double = {
    val qp = qFn(el, math.Pi / 2)
    if (math.abs(math.abs(q) - math.abs(qp)) < 1e-12) {
      return if (q >= 0) math.Pi / 2 else -math.Pi / 2
    }
    var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    var i = 0
    while (i < 15) {
      val s = math.sin(phi)
      val es = el.e * s
      val one = 1 - es * es
      val d = (one * one) / (2 * math.cos(phi)) *
        (q / (1 - el.e2) - s / one + (1 / (2 * el.e)) * math.log((1 - es) / (1 + es)))
      phi += d
      if (math.abs(d) < 1e-13) i = 15 else i += 1
    }
    phi
  }

  /** Ellipsoidal Mercator (EPSG 3395; Snyder 7-6..7-8, k0 = 1). */
  final case class EllipsoidalMercator(el: Ellipsoid) extends Projection {
    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val x = el.a * math.toRadians(lon)
      val y = -el.a * math.log(tFn(el, math.toRadians(lat)))
      (x, y)
    }
    def inv(x: Double, y: Double): (Double, Double) = {
      val lon = math.toDegrees(x / el.a)
      val phi = phiFromT(el, math.exp(-y / el.a))
      (lon, math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Transverse Mercator (Snyder 8-9..8-25); backs the
    * ETRS89 UTM zones. */
  final case class TransverseMercator(el: Ellipsoid, lon0: Double, k0: Double,
      fe: Double, fn: Double) extends Projection {
    private val e2 = el.e2
    private val ep2 = e2 / (1 - e2)
    private def mArc(phi: Double): Double =
      el.a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val lam0 = math.toRadians(lon0)
      val n = el.a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val t = math.tan(phi) * math.tan(phi)
      val c = ep2 * math.cos(phi) * math.cos(phi)
      val aa = math.cos(phi) * (lam - lam0)
      val x = k0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120) + fe
      val y = k0 * (mArc(phi) + n * math.tan(phi) * (aa * aa / 2
        + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
        + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720)) + fn
      (x, y)
    }
    def inv(x: Double, y: Double): (Double, Double) = {
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val m = (y - fn) / k0
      val mu = m / (el.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val c1 = ep2 * math.cos(phi1) * math.cos(phi1)
      val t1 = math.tan(phi1) * math.tan(phi1)
      val sin1 = math.sin(phi1)
      val n1 = el.a / math.sqrt(1 - e2 * sin1 * sin1)
      val r1 = el.a * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
      val dd = (x - fe) / (n1 * k0)
      val phi = phi1 - (n1 * math.tan(phi1) / r1) * (dd * dd / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(dd, 4) / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1)
          * math.pow(dd, 6) / 720)
      val lam = math.toRadians(lon0) + (dd - (1 + 2 * t1 + c1) * math.pow(dd, 3) / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1)
          * math.pow(dd, 5) / 120) / math.cos(phi1)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Lambert Conformal Conic, two standard parallels (Snyder
    * 15-1..15-11); EPSG 2154 Lambert-93. */
  final case class LambertConformal2SP(el: Ellipsoid, lat0: Double, lon0: Double,
      sp1: Double, sp2: Double, fe: Double, fn: Double) extends Projection {
    private val phi1 = math.toRadians(sp1)
    private val phi2 = math.toRadians(sp2)
    private val phi0 = math.toRadians(lat0)
    private val n = (math.log(mFn(el, phi1)) - math.log(mFn(el, phi2))) /
      (math.log(tFn(el, phi1)) - math.log(tFn(el, phi2)))
    private val bigF = mFn(el, phi1) / (n * math.pow(tFn(el, phi1), n))
    private val rho0 = el.a * bigF * math.pow(tFn(el, phi0), n)
    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val rho = el.a * bigF * math.pow(tFn(el, math.toRadians(lat)), n)
      val theta = n * math.toRadians(lon - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }
    def inv(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val t = math.pow(rho / (el.a * bigF), 1 / n)
      (lon0 + math.toDegrees(theta / n), math.toDegrees(phiFromT(el, t)))
    }
  }

  /** Albers Equal Area conic (Snyder 14-1..14-21); EPSG 5070. */
  final case class AlbersEqualArea(el: Ellipsoid, lat0: Double, lon0: Double,
      sp1: Double, sp2: Double, fe: Double, fn: Double) extends Projection {
    private val phi1 = math.toRadians(sp1)
    private val phi2 = math.toRadians(sp2)
    private val phi0 = math.toRadians(lat0)
    private val m1 = mFn(el, phi1)
    private val m2 = mFn(el, phi2)
    private val q1 = qFn(el, phi1)
    private val q2 = qFn(el, phi2)
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val c = m1 * m1 + n * q1
    private val rho0 = el.a * math.sqrt(c - n * qFn(el, phi0)) / n
    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val rho = el.a * math.sqrt(c - n * qFn(el, math.toRadians(lat))) / n
      val theta = n * math.toRadians(lon - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }
    def inv(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val q = (c - math.pow(rho * n / el.a, 2)) / n
      (lon0 + math.toDegrees(theta / n), math.toDegrees(phiFromQ(el, q)))
    }
  }

  /** Lambert Azimuthal Equal Area, oblique aspect (Snyder 24-2..24-20,
    * 3-11..3-18); EPSG 3035. */
  final case class LambertAzimuthalEqualArea(el: Ellipsoid, lat0: Double, lon0: Double,
      fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0)
    private val qp = qFn(el, math.Pi / 2)
    private val q0 = qFn(el, phi0)
    private val beta0 = math.asin(q0 / qp)
    private val rq = el.a * math.sqrt(qp / 2)
    private val d = el.a * mFn(el, phi0) / (rq * math.cos(beta0))
    def fwd(lon: Double, lat: Double): (Double, Double) = {
      val beta = math.asin(qFn(el, math.toRadians(lat)) / qp)
      val dl = math.toRadians(lon - lon0)
      val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
        math.cos(beta0) * math.cos(beta) * math.cos(dl)))
      val x = fe + b * d * math.cos(beta) * math.sin(dl)
      val y = fn + (b / d) * (math.cos(beta0) * math.sin(beta) -
        math.sin(beta0) * math.cos(beta) * math.cos(dl))
      (x, y)
    }
    def inv(x: Double, y: Double): (Double, Double) = {
      val xp = x - fe
      val yp = y - fn
      val rho = math.sqrt(math.pow(xp / d, 2) + math.pow(d * yp, 2))
      if (rho < 1e-9) return (lon0, math.toDegrees(phiFromQ(el, qp * math.sin(beta0))))
      val ce = 2 * math.asin(rho / (2 * rq))
      val q = qp * (math.cos(ce) * math.sin(beta0) +
        d * yp * math.sin(ce) * math.cos(beta0) / rho)
      val lam = math.atan2(xp * math.sin(ce),
        d * rho * math.cos(beta0) * math.cos(ce) - d * d * yp * math.sin(beta0) * math.sin(ce))
      (lon0 + math.toDegrees(lam), math.toDegrees(phiFromQ(el, q)))
    }
  }

  // ---- legacy spherical web-mercator + WGS84 UTM paths ----

  private val utmProj: Int => TransverseMercator = {
    val cache = new java.util.concurrent.ConcurrentHashMap[Int, TransverseMercator]()
    zone => cache.computeIfAbsent(zone,
      z => TransverseMercator(Wgs84, lon0 = (z - 1) * 6 - 180 + 3,
        k0 = 0.9996, fe = 500000.0, fn = 0.0))
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

  /** Single-point transform between two parsed CRS. */
  def transformPoint(x: Double, y: Double, src: Crs, dst: Crs): (Double, Double) = {
    if (src == dst) return (x, y)
    val (lon, lat) = src match {
      case LonLat => (x, y)
      case WebMercator => mercToLonLat(x, y)
      case Utm(z, s) => utmProj(z).inv(x, if (s) y - 10000000.0 else y)
      case Projected(_, p) => p.inv(x, y)
    }
    dst match {
      case LonLat => (lon, lat)
      case WebMercator => lonLatToMerc(lon, lat)
      case Utm(z, s) =>
        val (px, py) = utmProj(z).fwd(lon, lat)
        (px, if (s) py + 10000000.0 else py)
      case Projected(_, p) => p.fwd(lon, lat)
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
