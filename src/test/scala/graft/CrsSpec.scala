package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CrsTransform
import graft.functions.CrsTransform._

/** Projection math checks: exact false-origin anchors, known-point
  * envelopes, and forward∘inverse identity across the supported EPSG
  * set. */
class CrsSpec extends AnyFunSuite {

  private def pt(x: Double, y: Double, from: String, to: String): (Double, Double) =
    CrsTransform.transformPoint(x, y, CrsTransform.parse(from), CrsTransform.parse(to))

  private def roundtrip(epsg: String, lon: Double, lat: Double, tol: Double = 1e-8): Unit = {
    val (x, y) = pt(lon, lat, "EPSG:4326", epsg)
    val (lon2, lat2) = pt(x, y, epsg, "EPSG:4326")
    assert(math.abs(lon2 - lon) < tol && math.abs(lat2 - lat) < tol,
      s"$epsg roundtrip ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
  }

  private def near(a: (Double, Double), b: (Double, Double), tol: Double = 1e-6): Boolean =
    math.abs(a._1 - b._1) < tol && math.abs(a._2 - b._2) < tol

  test("projection centers map to their false origins exactly") {
    assert(near(pt(3.0, 46.5, "EPSG:4326", "EPSG:2154"), (700000.0, 6600000.0)))
    assert(near(pt(10.0, 52.0, "EPSG:4326", "EPSG:3035"), (4321000.0, 3210000.0)))
    val (ax, ay) = pt(-96.0, 23.0, "EPSG:4326", "EPSG:5070")
    assert(math.abs(ax) < 1e-6 && math.abs(ay) < 1e-6)
    assert(near(pt(0.0, 0.0, "EPSG:4326", "EPSG:3395"), (0.0, 0.0)))
    val (ux, _) = pt(9.0, 52.0, "EPSG:4326", "EPSG:25832")
    assert(math.abs(ux - 500000.0) < 1e-6)
  }

  test("known points land where published maps put them") {
    // Paris in Lambert-93: ~(652 km, 6 862 km)
    val (px, py) = pt(2.3522, 48.8566, "EPSG:4326", "EPSG:2154")
    assert(math.abs(px - 652000) < 4000 && math.abs(py - 6862000) < 4000, s"L93 Paris ($px,$py)")
    // one degree north of the LAEA center: on-meridian, ~111.3 km
    val (lx, ly) = pt(10.0, 53.0, "EPSG:4326", "EPSG:3035")
    assert(math.abs(lx - 4321000.0) < 1e-6)
    assert(ly - 3210000.0 > 110000 && ly - 3210000.0 < 112500, s"LAEA dy ${ly - 3210000.0}")
    // 22 degrees along the Albers central meridian: ~2.43e6 m
    val (bx, by) = pt(-96.0, 45.0, "EPSG:4326", "EPSG:5070")
    assert(math.abs(bx) < 1e-6 && by > 2.40e6 && by < 2.47e6, s"Albers ($bx,$by)")
    // ellipsoidal mercator: x is a*λ; y at 50N below the spherical value
    val (ex, ey) = pt(1.0, 50.0, "EPSG:4326", "EPSG:3395")
    assert(math.abs(ex - 111319.4908) < 0.01)
    assert(ey > 6.40e6 && ey < 6.42e6, s"3395 y=$ey")
    val (_, sy) = pt(1.0, 50.0, "EPSG:4326", "EPSG:3857")
    assert(ey < sy) // conformal ellipsoidal northing < spherical northing
    // ETRS89 UTM32: northing ≈ meridian arc * k0
    val (_, uy) = pt(9.0, 52.0, "EPSG:4326", "EPSG:25832")
    assert(uy > 5.75e6 && uy < 5.78e6, s"25832 y=$uy")
  }

  test("forward-inverse identity across the supported set") {
    for (lon <- Seq(0.5, 2.0, 5.5); lat <- Seq(42.0, 46.5, 50.9))
      roundtrip("EPSG:2154", lon, lat)
    for (lon <- Seq(-10.0, 10.0, 30.0); lat <- Seq(35.0, 52.0, 68.0))
      roundtrip("EPSG:3035", lon, lat)
    for (lon <- Seq(-120.0, -96.0, -75.0); lat <- Seq(25.0, 37.0, 48.0))
      roundtrip("EPSG:5070", lon, lat)
    for (lon <- Seq(-170.0, 0.0, 120.0); lat <- Seq(-70.0, 0.0, 70.0))
      roundtrip("EPSG:3395", lon, lat)
    for (lon <- Seq(7.0, 9.0, 11.0); lat <- Seq(40.0, 52.0, 64.0))
      roundtrip("EPSG:25832", lon, lat)
    for (lon <- Seq(7.0, 9.0); lat <- Seq(-40.0, 10.0))
      roundtrip("EPSG:32732", lon, lat)
  }

  test("projected-to-projected goes through the shared geographic hub") {
    val (x, y) = pt(2.3522, 48.8566, "EPSG:4326", "EPSG:2154")
    val (ex, ey) = pt(2.3522, 48.8566, "EPSG:4326", "EPSG:3035")
    val (hx, hy) = pt(x, y, "EPSG:2154", "EPSG:3035")
    assert(math.abs(hx - ex) < 1e-6 && math.abs(hy - ey) < 1e-6)
  }

  test("equal-area property: LAEA preserves a small cell's area") {
    // 0.1° x 0.1° cell near (10,52): planar area in 3035 must match the
    // ellipsoid-ish area estimate within 0.2%
    val pts = Seq((10.0, 52.0), (10.1, 52.0), (10.1, 52.1), (10.0, 52.1))
    val proj = pts.map { case (lo, la) => pt(lo, la, "EPSG:4326", "EPSG:3035") }
    def shoelace(ps: Seq[(Double, Double)]): Double = {
      val n = ps.length
      math.abs((0 until n).map { i =>
        val (x1, y1) = ps(i); val (x2, y2) = ps((i + 1) % n)
        x1 * y2 - x2 * y1
      }.sum / 2)
    }
    val area = shoelace(proj)
    val lat = math.toRadians(52.05)
    val expect = math.toRadians(0.1) * 6378137.0 * math.cos(lat) *
      math.toRadians(0.1) * 6356752.314 * 1.0045 // crude ellipsoidal patch estimate
    assert(math.abs(area / expect - 1) < 0.01, s"area=$area expect~$expect")
  }
}
