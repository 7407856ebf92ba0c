package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CrsTransform
import graft.functions.CrsTransform._
import graft.geom.GeomIO

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

  test("polar stereographic: poles, standard-parallel radius, UPS, roundtrips") {
    // poles land on the (false) origin
    assert(near(pt(0.0, -90.0, "EPSG:4326", "EPSG:3031"), (0.0, 0.0), 1e-6))
    assert(near(pt(0.0, 90.0, "EPSG:4326", "EPSG:3413"), (0.0, 0.0), 1e-6))
    assert(near(pt(0.0, 90.0, "EPSG:4326", "EPSG:5041"), (2000000.0, 2000000.0), 1e-6))
    assert(near(pt(0.0, -90.0, "EPSG:4326", "EPSG:5042"), (2000000.0, 2000000.0), 1e-6))
    // variant B is true at its standard parallel: the pole distance there
    // equals a·m(φ1) (the parallel's true radius)
    def m(lat: Double): Double = {
      val e2 = 0.00669437999014; val phi = math.toRadians(lat)
      6378137.0 * math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    }
    val (x71, y71) = pt(0.0, -71.0, "EPSG:4326", "EPSG:3031")
    assert(math.abs(x71) < 1e-6 && math.abs(math.hypot(x71, y71) - m(-71.0)) < 0.5,
      s"3031 std-parallel radius ($x71,$y71)")
    val (x70, y70) = pt(-45.0, 70.0, "EPSG:4326", "EPSG:3413")
    assert(math.abs(x70) < 1e-6 && math.abs(math.hypot(x70, y70) - m(70.0)) < 0.5,
      s"3413 std-parallel radius ($x70,$y70)")
    // south aspect orientation: lon0+90E maps to +x in 3031 (EPSG 9829)
    val (qx, qy) = pt(90.0, -75.0, "EPSG:4326", "EPSG:3031")
    assert(qx > 0 && math.abs(qy) < 1e-6, s"3031 90E ($qx,$qy)")
    // north aspect: on the lon0 meridian, y is negative (grid north up)
    val (nx, ny) = pt(-45.0, 80.0, "EPSG:4326", "EPSG:3413")
    assert(math.abs(nx) < 1e-6 && ny < 0, s"3413 lon0 ($nx,$ny)")
    // roundtrips across each grid's domain
    for (lon <- Seq(-170.0, -45.0, 0.0, 120.0); lat <- Seq(-88.0, -75.0, -65.0))
      roundtrip("EPSG:3031", lon, lat)
    for (lon <- Seq(-170.0, -45.0, 0.0, 120.0); lat <- Seq(60.0, 75.0, 88.0))
      roundtrip("EPSG:3413", lon, lat)
    for (lon <- Seq(-90.0, 10.0); lat <- Seq(-80.0, -60.0))
      roundtrip("EPSG:3976", lon, lat)
    for (lon <- Seq(-120.0, 45.0); lat <- Seq(84.5, 89.5))
      roundtrip("EPSG:5041", lon, lat)
    for (lon <- Seq(-120.0, 45.0); lat <- Seq(-89.5, -84.5))
      roundtrip("EPSG:5042", lon, lat)
  }

  test("geocentric EPSG:4978: 3D anchor + roundtrip (test_transforms.py)") {
    // reference anchor: ST_Transform(POINT Z (1 1 1), 'EPSG:4979',
    // 'EPSG:4978') = POINT Z (6376201.805927448 111297.016517882
    // 110568.792276973)
    val p = GeomIO.readWkt("POINT Z (1 1 1)")
    val xyz = CrsTransform.transform(p, "EPSG:4979", "EPSG:4978")
    val c = xyz.getCoordinate
    assert(math.abs(c.x - 6376201.805927448) < 1e-6, s"x ${c.x}")
    assert(math.abs(c.y - 111297.016517882) < 1e-6, s"y ${c.y}")
    assert(math.abs(c.getZ - 110568.792276973) < 1e-6, s"z ${c.getZ}")
    assert(xyz.getSRID == 4978)
    // inverse recovers lon/lat/h
    val back = CrsTransform.transform(xyz, "EPSG:4978", "EPSG:4979").getCoordinate
    assert(math.abs(back.x - 1.0) < 1e-9 && math.abs(back.y - 1.0) < 1e-9)
    assert(math.abs(back.getZ - 1.0) < 1e-6)
    // 2D 4326 input: height 0, same surface point
    val flat = CrsTransform.transform(GeomIO.point(1.0, 1.0),
      "EPSG:4326", "EPSG:4978").getCoordinate
    // h=0 differs from the h=1 anchor by exactly cos(1°)·cos(1°) in X
    assert(math.abs(flat.x - (6376201.805927448 -
      math.cos(math.toRadians(1)) * math.cos(math.toRadians(1)))) < 1e-6)
    // 4978 into a 2D projection is rejected loudly
    intercept[IllegalArgumentException] {
      CrsTransform.transform(p, "EPSG:4978", "EPSG:3857")
    }
  }

  test("projected-to-projected goes through the shared geographic hub") {
    val (x, y) = pt(2.3522, 48.8566, "EPSG:4326", "EPSG:2154")
    val (ex, ey) = pt(2.3522, 48.8566, "EPSG:4326", "EPSG:3035")
    val (hx, hy) = pt(x, y, "EPSG:2154", "EPSG:3035")
    assert(math.abs(hx - ex) < 1e-6 && math.abs(hy - ey) < 1e-6)
  }

  test("OSGB36 / British National Grid: Airy TM + Helmert datum leg") {
    // OS worked example (datum-native, no Helmert involved): OSGB36
    // geographic 52°39'27.2531"N 1°43'4.5177"E -> E 651409.903
    // N 313177.270 ("A guide to coordinate systems in GB", annex C)
    val phi = 52.0 + 39.0 / 60 + 27.2531 / 3600
    val lam = 1.0 + 43.0 / 60 + 4.5177 / 3600
    val (e, n) = pt(lam, phi, "EPSG:4277", "EPSG:27700")
    assert(math.abs(e - 651409.903) < 0.01 && math.abs(n - 313177.270) < 0.01,
      s"OS worked example: ($e,$n)")
    // same station's ETRS89 coordinates: the full WGS84 -> geocentric
    // Helmert -> Airy TM chain must land within the single-set Helmert
    // contract (~3.5 m vs the OSTN grid truth)
    val phiW = 52.0 + 39.0 / 60 + 28.8282 / 3600
    val lamW = 1.0 + 42.0 / 60 + 57.8663 / 3600
    val (ew, nw) = pt(lamW, phiW, "EPSG:4326", "EPSG:27700")
    assert(math.abs(ew - 651409.903) < 6.0 && math.abs(nw - 313177.270) < 6.0,
      s"Helmert chain: ($ew,$nw)")
    // datum shift is a real displacement: ~100+ m between OSGB36 and
    // WGS84 geographic coordinates of the same point in the southeast
    val (dLon, dLat) = pt(-0.1276, 51.5072, "EPSG:4326", "EPSG:4277")
    val shiftM = graft.functions.Spherical.haversine(-0.1276, 51.5072, dLon, dLat)
    assert(shiftM > 80 && shiftM < 200, s"OSGB36 shift magnitude $shiftM m")
    // forward-inverse identity through the datum leg. The 2D contract
    // discards ellipsoidal height on each geocentric leg, which moves
    // latitude a few mm (~5e-8 deg) — that is the standard 2D Helmert
    // behavior, not accumulating error.
    roundtrip("EPSG:27700", -0.1276, 51.5072, tol = 1e-6)
    roundtrip("EPSG:27700", -3.2, 55.95, tol = 1e-6)
    roundtrip("EPSG:4277", -5.0, 50.1, tol = 1e-6)
  }

  test("NAD83 family: geographic passthrough, UTM zones, state plane") {
    // 4269 and 4258 are metre-coincident passthroughs
    assert(near(pt(-74.0, 40.7, "EPSG:4269", "EPSG:4326"), (-74.0, 40.7)))
    assert(near(pt(9.0, 52.0, "EPSG:4258", "EPSG:4326"), (9.0, 52.0)))
    // NAD83 UTM matches WGS84 UTM under the coincident-datum treatment
    // but keeps its own EPSG identity
    val a = pt(-79.387139, 43.642567, "EPSG:4326", "EPSG:26917")
    val b = pt(-79.387139, 43.642567, "EPSG:4326", "EPSG:32617")
    assert(near(a, b, tol = 1e-3)) // GRS80 vs WGS84 flattening: ~0.1 mm
    // SPCS83 false origins exact: NY Long Island (32118), Texas Central
    // (32139) project their grid origins to (FE, FN)
    assert(near(pt(-74.0, 40.0 + 10.0 / 60, "EPSG:4326", "EPSG:32118"),
      (300000.0, 0.0), tol = 1e-5))
    assert(near(pt(-98.5, 29.0 + 40.0 / 60, "EPSG:4326", "EPSG:32139"),
      (700000.0, 3000000.0), tol = 1e-5))
    // LCC scale factor ~1 along a standard parallel (32118 sp1 41°02'N)
    val sp1 = 41.0 + 2.0 / 60
    val (x1, y1) = pt(-74.05, sp1, "EPSG:4326", "EPSG:32118")
    val (x2, y2) = pt(-73.95, sp1, "EPSG:4326", "EPSG:32118")
    val planar = math.hypot(x2 - x1, y2 - y1)
    val ground = graft.functions.Spherical.haversine(-74.05, sp1, -73.95, sp1)
    assert(math.abs(planar / ground - 1.0) < 5e-3,
      s"SP scale ${planar / ground}") // haversine is spherical: ~0.3% slack
    roundtrip("EPSG:32118", -73.7, 40.8)
    roundtrip("EPSG:32139", -97.7, 30.3)
    roundtrip("EPSG:26918", -75.2, 39.9)
  }

  test("PROJJSON-parameterized transforms drive the projection kernels " +
      "(c/sedona-proj transform.rs behavior: definition, not id table)") {
    def geogWgs84 =
      """"base_crs":{"type":"GeographicCRS","name":"WGS 84","datum":{"type":
        |"GeodeticReferenceFrame","name":"World Geodetic System 1984",
        |"ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,
        |"inverse_flattening":298.257223563}}}""".stripMargin.replace("\n", "")
    def geogNad83 =
      """"base_crs":{"type":"GeographicCRS","name":"NAD83","datum":{"type":
        |"GeodeticReferenceFrame","name":"North American Datum 1983",
        |"ellipsoid":{"name":"GRS 1980","semi_major_axis":6378137,
        |"inverse_flattening":298.257222101}}}""".stripMargin.replace("\n", "")
    // UTM zone 31N expressed ONLY as parameters — no id anywhere: must
    // agree with the enumerated EPSG:32631 to sub-mm
    val utm31 =
      s"""{"type":"ProjectedCRS","name":"anonymous TM",$geogWgs84,
         |"conversion":{"name":"c","method":{"name":"Transverse Mercator"},
         |"parameters":[
         |{"name":"Latitude of natural origin","value":0,"unit":"degree"},
         |{"name":"Longitude of natural origin","value":3,"unit":"degree"},
         |{"name":"Scale factor at natural origin","value":0.9996,"unit":"unity"},
         |{"name":"False easting","value":500000,"unit":"metre"},
         |{"name":"False northing","value":0,"unit":"metre"}]}}"""
        .stripMargin.replace("\n", "")
    for ((lon, lat) <- Seq((2.2945, 48.858), (3.0, 0.0), (5.5, 60.0))) {
      val viaJson = pt(lon, lat, "EPSG:4326", utm31)
      val viaCode = pt(lon, lat, "EPSG:4326", "EPSG:32631")
      assert(math.abs(viaJson._1 - viaCode._1) < 1e-4 &&
        math.abs(viaJson._2 - viaCode._2) < 1e-4,
        s"($lon,$lat): projjson $viaJson vs 32631 $viaCode")
    }
    // Texas South Central parameters (32139) without the id: identical
    // to the enumerated state-plane entry
    val tx =
      s"""{"type":"ProjectedCRS","name":"anonymous LCC",$geogNad83,
         |"conversion":{"name":"c","method":{"name":"Lambert Conic Conformal (2SP)"},
         |"parameters":[
         |{"name":"Latitude of false origin","value":29.666666666666668,"unit":"degree"},
         |{"name":"Longitude of false origin","value":-98.5,"unit":"degree"},
         |{"name":"Latitude of 1st standard parallel","value":31.883333333333333,"unit":"degree"},
         |{"name":"Latitude of 2nd standard parallel","value":30.116666666666667,"unit":"degree"},
         |{"name":"Easting at false origin","value":700000,"unit":"metre"},
         |{"name":"Northing at false origin","value":3000000,"unit":"metre"}]}}"""
        .stripMargin.replace("\n", "")
    val viaTx = pt(-97.7, 30.3, "EPSG:4326", tx)
    val viaTxCode = pt(-97.7, 30.3, "EPSG:4326", "EPSG:32139")
    assert(math.abs(viaTx._1 - viaTxCode._1) < 1e-4 &&
      math.abs(viaTx._2 - viaTxCode._2) < 1e-4, s"$viaTx vs $viaTxCode")
    // a zone NOT in the table at all: NAD83 / California zone 5
    // (EPSG:26945 parameters). False origin -> (eF, nF) EXACTLY by the
    // projection definition; roundtrip sub-mm; id recorded but unlisted.
    val ca5 =
      s"""{"type":"ProjectedCRS","name":"NAD83 / California zone 5",$geogNad83,
         |"conversion":{"name":"c","method":{"name":"Lambert Conic Conformal (2SP)",
         |"id":{"authority":"EPSG","code":9802}},
         |"parameters":[
         |{"name":"Latitude of false origin","value":33.5,"unit":"degree"},
         |{"name":"Longitude of false origin","value":-118,"unit":"degree"},
         |{"name":"Latitude of 1st standard parallel","value":35.46666666666667,"unit":"degree"},
         |{"name":"Latitude of 2nd standard parallel","value":34.03333333333333,"unit":"degree"},
         |{"name":"Easting at false origin","value":2000000,"unit":"metre"},
         |{"name":"Northing at false origin","value":500000,"unit":"metre"}]},
         |"id":{"authority":"EPSG","code":26945}}"""
        .stripMargin.replace("\n", "")
    assert(near(pt(-118.0, 33.5, "EPSG:4326", ca5), (2000000.0, 500000.0), 1e-5))
    val (cx, cy) = pt(-118.2437, 34.0522, "EPSG:4326", ca5) // LA city hall area
    val (lonB, latB) = pt(cx, cy, ca5, "EPSG:4326")
    assert(math.abs(lonB + 118.2437) < 1e-8 && math.abs(latB - 34.0522) < 1e-8,
      s"CA5 roundtrip ($lonB,$latB)")
    // scale ~1 along a standard parallel (34°02'N)
    val spLat = 34.03333333333333
    val (sx1, sy1) = pt(-118.05, spLat, "EPSG:4326", ca5)
    val (sx2, sy2) = pt(-117.95, spLat, "EPSG:4326", ca5)
    val planar = math.hypot(sx2 - sx1, sy2 - sy1)
    val ground = graft.functions.Spherical.haversine(-118.05, spLat, -117.95, spLat)
    assert(math.abs(planar / ground - 1.0) < 5e-3, s"CA5 sp scale ${planar / ground}")
    // a PROJJSON carrying a LISTED id routes through the enumerated path
    val l93 = graft.sources.ProjJson.forCrs("EPSG:2154").get
    assert(near(pt(2.3522, 48.8566, "EPSG:4326", l93),
      pt(2.3522, 48.8566, "EPSG:4326", "EPSG:2154"), 1e-9))
    // unit given as a {conversion_factor} object (PROJ writes these for
    // non-degree angular units) normalizes correctly: 0.62 grad = 0.558°
    val gradTm = utm31.replace(
      """{"name":"Longitude of natural origin","value":3,"unit":"degree"}""",
      """{"name":"Longitude of natural origin","value":3.3333333333333335,"unit":{"type":"AngularUnit","name":"grad","conversion_factor":0.015707963267948967}}""")
    assert(near(pt(5.5, 60.0, "EPSG:4326", gradTm),
      pt(5.5, 60.0, "EPSG:4326", utm31), 1e-6))
    // unknown method errors loudly
    val bad = utm31.replace("Transverse Mercator", "Krovak")
    intercept[IllegalArgumentException] { CrsTransform.parse(bad) }
  }

  test("oblique Mercator / Krovak / LCC-1SP: EPSG Guidance Note 7-2 anchors") {
    // Timbalai 1948 / RSO Borneo (m) — Hotine variant B (method 9815),
    // Everest 1830 (1967 definition). GN7-2 worked example.
    val rso = ObliqueMercator(Ellipsoid(6377298.556, 1.0 / 300.8017),
      latC = 4.0, lonC = 115.0,
      azimuth = 53.0 + 18.0 / 60 + 56.9537 / 3600,
      gridAngle = 53.0 + 7.0 / 60 + 48.3685 / 3600, k0 = 0.99984,
      fe = 590476.87, fn = 442857.65, variantB = true)
    val in = (115.0 + 48.0 / 60 + 19.8196 / 3600, 5.0 + 23.0 / 60 + 14.1129 / 3600)
    val (re, rn) = rso.fwd(in._1, in._2)
    assert(math.abs(re - 679245.73) < 0.05 && math.abs(rn - 596562.78) < 0.05,
      s"RSO Borneo ($re,$rn)")
    // inverse of the published cm-rounded E/N: ~1e-7 deg of roundoff
    val (rlo, rla) = rso.inv(679245.73, 596562.78)
    assert(math.abs(rlo - in._1) < 5e-7 && math.abs(rla - in._2) < 5e-7)
    // Krovak (method 9819, native Southing/Westing) — GN7-2 worked
    // example on S-JTSK (Bessel 1841), longitudes East of Greenwich
    val kro = Krovak(Ellipsoid(6377397.155, 1.0 / 299.1528128),
      latC = 49.5, lonO = 24.0 + 50.0 / 60,
      coLat = 30.0 + 17.0 / 60 + 17.3031 / 3600,
      latP = 78.5, kP = 0.9999, fe = 0.0, fn = 0.0, eastNorth = false)
    val kin = (16.0 + 50.0 / 60 + 59.179 / 3600, 50.0 + 12.0 / 60 + 32.4416 / 3600)
    val (kx, ky) = kro.fwd(kin._1, kin._2)
    assert(math.abs(kx - 1050538.63) < 0.05 && math.abs(ky - 568991.0) < 0.05,
      s"Krovak southing/westing ($kx,$ky)")
    val (klo, kla) = kro.inv(1050538.63, 568991.0)
    assert(math.abs(klo - kin._1) < 5e-7 && math.abs(kla - kin._2) < 5e-7)
    // Jamaica 1969 / Jamaica National Grid — LCC-1SP (method 9801) on
    // Clarke 1866. GN7-2 worked example.
    val jam = LambertConformal1SP(Ellipsoid(6378206.4, 1.0 / 294.9786982),
      lat0 = 18.0, lon0 = -77.0, k0 = 1.0, fe = 250000.0, fn = 150000.0)
    val (je, jn) = jam.fwd(-(76.0 + 56.0 / 60 + 37.26 / 3600),
      17.0 + 55.0 / 60 + 55.8 / 3600)
    assert(math.abs(je - 255966.58) < 0.05 && math.abs(jn - 142493.51) < 0.05,
      s"Jamaica ($je,$jn)")
  }

  test("Swiss LV95/LV03, Czech 5514, Malaysia 3375: centers, axes, roundtrips") {
    // the Swiss projection centre (Bern old observatory, CH1903+ datum)
    // maps exactly to the LV95/LV03 false origins at the kernel level
    val latC = 46.0 + 57.0 / 60 + 8.66 / 3600
    val lonC = 7.0 + 26.0 / 60 + 22.5 / 3600
    val lv95 = ObliqueMercator(Ellipsoid(6377397.155, 1.0 / 299.1528128),
      latC, lonC, azimuth = 90.0, gridAngle = 90.0, k0 = 1.0,
      fe = 2600000.0, fn = 1200000.0, variantB = true)
    assert(near(lv95.fwd(lonC, latC), (2600000.0, 1200000.0), 1e-6))
    // swisstopo worked example (WGS84/ETRS89 input, full datum chain):
    // φ=46°02'38.87" λ=8°43'49.79" -> LV95 (2700000.005, 1100000.000);
    // the translation-only Helmert reproduces it to ~4 cm
    val (se, sn) = pt(8.0 + 43.0 / 60 + 49.79 / 3600,
      46.0 + 2.0 / 60 + 38.87 / 3600, "EPSG:4326", "EPSG:2056")
    assert(math.abs(se - 2700000.005) < 0.2 && math.abs(sn - 1100000.0) < 0.2,
      s"LV95 swisstopo example ($se,$sn)")
    // full-chain roundtrips through the datum legs (the Helmert
    // geodetic<->geocentric legs carry ~1e-8 deg of iteration roundoff)
    for (lon <- Seq(6.2, 7.5, 9.8); lat <- Seq(46.0, 47.0, 47.7)) {
      roundtrip("EPSG:2056", lon, lat, 1e-7)
      roundtrip("EPSG:21781", lon, lat, 1e-7)
    }
    for (lon <- Seq(12.5, 15.0, 18.5); lat <- Seq(48.7, 49.8, 50.9))
      roundtrip("EPSG:5514", lon, lat, 1e-7)
    for (lon <- Seq(100.5, 102.0, 103.5); lat <- Seq(1.5, 4.0, 6.5))
      roundtrip("EPSG:3375", lon, lat, 1e-7)
    // 5514 East-North axes: both coordinates negative in-country, and
    // equal to the negated native southing/westing
    val (e5514, n5514) = pt(14.42, 50.09, "EPSG:4326", "EPSG:5514") // Prague
    assert(e5514 < -700000 && e5514 > -760000, s"5514 easting $e5514")
    assert(n5514 < -1030000 && n5514 > -1070000, s"5514 northing $n5514")
    // LV95 = LV03 + (2000000, 1000000) by construction
    val (e95, n95) = pt(8.54, 47.38, "EPSG:4326", "EPSG:2056") // Zurich
    val (e03, n03) = pt(8.54, 47.38, "EPSG:4326", "EPSG:21781")
    assert(math.abs(e95 - e03 - 2000000.0) < 1e-6 &&
      math.abs(n95 - n03 - 1000000.0) < 1e-6)
    // Zurich lands in the published LV95 neighborhood (~2683000, 1248000)
    assert(math.abs(e95 - 2683200) < 2000 && math.abs(n95 - 1247800) < 2000,
      s"LV95 Zurich ($e95,$n95)")
    // PROJJSON Krovak parameters (no id) must match the enumerated 5514
    val k5514 =
      """{"type":"ProjectedCRS","name":"anon krovak","base_crs":{
        |"type":"GeographicCRS","name":"S-JTSK","datum":{"type":
        |"GeodeticReferenceFrame","name":"System of the Unified Trigonometrical Cadastral Network",
        |"ellipsoid":{"name":"Bessel 1841","semi_major_axis":6377397.155,
        |"inverse_flattening":299.1528128}}},
        |"conversion":{"name":"c","method":{"name":"Krovak (North Orientated)"},
        |"parameters":[
        |{"name":"Latitude of projection centre","value":49.5,"unit":"degree"},
        |{"name":"Longitude of origin","value":24.833333333333333,"unit":"degree"},
        |{"name":"Co-latitude of cone axis","value":30.288139749999998,"unit":"degree"},
        |{"name":"Latitude of pseudo standard parallel","value":78.5,"unit":"degree"},
        |{"name":"Scale factor on pseudo standard parallel","value":0.9999,"unit":"unity"},
        |{"name":"False easting","value":0,"unit":"metre"},
        |{"name":"False northing","value":0,"unit":"metre"}]}}"""
        .stripMargin.replace("\n", "")
    assert(near(pt(14.42, 50.09, "EPSG:4326", k5514),
      pt(14.42, 50.09, "EPSG:4326", "EPSG:5514"), 1e-4))
  }

  test("WKT1/WKT2 parameter extraction: no authority id needed") {
    // WKT2 TM definition with NO id anywhere (GeoTIFF-style custom CRS):
    // must agree with the enumerated EPSG:32631 kernels to sub-mm
    val wkt2Tm =
      """PROJCRS["custom TM",
        |  BASEGEOGCRS["WGS 84",
        |    DATUM["World Geodetic System 1984",
        |      ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]]],
        |  CONVERSION["c",
        |    METHOD["Transverse Mercator"],
        |    PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],
        |    PARAMETER["Longitude of natural origin",3,ANGLEUNIT["degree",0.0174532925199433]],
        |    PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],
        |    PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],
        |    PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
        |  CS[Cartesian,2]]""".stripMargin
    for ((lon, lat) <- Seq((2.2945, 48.858), (3.0, 0.0), (5.5, 60.0)))
      assert(near(pt(lon, lat, "EPSG:4326", wkt2Tm),
        pt(lon, lat, "EPSG:4326", "EPSG:32631"), 1e-6), s"wkt2 TM ($lon,$lat)")
    // WKT1 (GDAL snake_case) LCC-2SP without AUTHORITY: matches 32139
    val wkt1Lcc =
      """PROJCS["custom LCC",
        |  GEOGCS["NAD83",
        |    DATUM["North_American_Datum_1983",
        |      SPHEROID["GRS 1980",6378137,298.257222101]],
        |    PRIMEM["Greenwich",0],
        |    UNIT["degree",0.0174532925199433]],
        |  PROJECTION["Lambert_Conformal_Conic_2SP"],
        |  PARAMETER["latitude_of_origin",29.6666666666667],
        |  PARAMETER["central_meridian",-98.5],
        |  PARAMETER["standard_parallel_1",31.8833333333333],
        |  PARAMETER["standard_parallel_2",30.1166666666667],
        |  PARAMETER["false_easting",700000],
        |  PARAMETER["false_northing",3000000],
        |  UNIT["metre",1]]""".stripMargin
    assert(near(pt(-97.7, 30.3, "EPSG:4326", wkt1Lcc),
      pt(-97.7, 30.3, "EPSG:4326", "EPSG:32139"), 1e-4))
    // WKT2 Krovak with parameter ID nodes and the official datum name
    // (no top-level id): agrees with enumerated 5514 incl. Helmert leg
    val wkt2Krovak =
      """PROJCRS["custom Krovak",
        |  BASEGEOGCRS["S-JTSK",
        |    DATUM["System of the Unified Trigonometrical Cadastral Network",
        |      ELLIPSOID["Bessel 1841",6377397.155,299.1528128,LENGTHUNIT["metre",1]]]],
        |  CONVERSION["c",
        |    METHOD["Krovak (North Orientated)",ID["EPSG",1041]],
        |    PARAMETER["Latitude of projection centre",49.5,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8811]],
        |    PARAMETER["Longitude of origin",24.8333333333333,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8833]],
        |    PARAMETER["Co-latitude of cone axis",30.2881397527778,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",1036]],
        |    PARAMETER["Latitude of pseudo standard parallel",78.5,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8818]],
        |    PARAMETER["Scale factor on pseudo standard parallel",0.9999,SCALEUNIT["unity",1],ID["EPSG",8819]],
        |    PARAMETER["False easting",0,LENGTHUNIT["metre",1]],
        |    PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
        |  CS[Cartesian,2]]""".stripMargin
    assert(near(pt(14.42, 50.09, "EPSG:4326", wkt2Krovak),
      pt(14.42, 50.09, "EPSG:4326", "EPSG:5514"), 5e-3))
    // a WKT with a LISTED authority id still takes the enumerated path
    val withId = wkt2Tm.replace("CS[Cartesian,2]]",
      """CS[Cartesian,2],ID["EPSG",32631]]""")
    assert(near(pt(5.5, 60.0, "EPSG:4326", withId),
      pt(5.5, 60.0, "EPSG:4326", "EPSG:32631"), 1e-9))
    // non-CRS WKT errors loudly
    intercept[IllegalArgumentException] {
      CrsTransform.parse("""PROJCRS["broken", CS[Cartesian,2]]""")
    }
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

  test("NTv2 grid shift: codec roundtrip, bilinear exactness, registry + Helmert fallback") {
    import graft.sources.Ntv2
    // fictional coverage box lat 10..20, lonEast 10..20 (west-positive
    // seconds -72000..-36000), 0.5 deg nodes, dyadic linear shift fields
    // so float32 nodes are exact and bilinear == the linear function
    val nR = 21; val nC = 21
    val latS = Array.tabulate(nR * nC)(i => ((i / nC) * 2 + i % nC) * 0.125f + 1.0f)
    val lonS = Array.tabulate(nR * nC)(i => ((i / nC) + (i % nC) * 3) * 0.0625f - 2.0f)
    val g = Ntv2.Grid(Vector(Ntv2.SubGrid("TEST", "NONE",
      36000.0, 72000.0, -72000.0, -36000.0, 1800.0, 1800.0, nR, nC, latS, lonS)))
    val bytes = Ntv2.write(g)
    val back = Ntv2.read(bytes)
    assert(back.subs.length == 1)
    val sg = back.subs.head
    assert(sg.name == "TEST" && sg.nRows == nR && sg.nCols == nC)
    assert(sg.sLat == 36000.0 && sg.wLonW == -36000.0 && sg.latInc == 1800.0)
    assert(java.util.Arrays.equals(sg.latShift, latS) &&
      java.util.Arrays.equals(sg.lonShift, lonS))

    // linear-field bilinear exactness at quarter-cell interior points:
    // r = (latSec-36000)/1800, c = (lonWestSec+72000)/1800 (fractional)
    for (r <- Seq(0.0, 0.25, 3.5, 19.75, 20.0); c <- Seq(0.0, 0.75, 10.25, 20.0)) {
      val lat = 10.0 + r * 0.5
      val lon = 20.0 - c * 0.5
      val Some((dLat, dLonW)) = back.shiftAt(lon, lat)
      assert(dLat == (2 * r + c) * 0.125 + 1.0, s"dLat r=$r c=$c")
      assert(dLonW == (r + c * 3) * 0.0625 - 2.0, s"dLonW r=$r c=$c")
    }
    // forward/inverse fixed-point roundtrip
    for ((lon, lat) <- Seq((15.3, 12.7), (10.01, 19.99), (19.9, 10.1))) {
      val (flon, flat) = back.forward(lon, lat)
      val (blon, blat) = back.inverse(flon, flat)
      assert(math.abs(blon - lon) < 1e-12 && math.abs(blat - lat) < 1e-12,
        s"fixed-point roundtrip ($lon,$lat)")
    }

    // registry: grid replaces the OSGB36 Helmert leg inside coverage,
    // falls back to Helmert outside, restores on unregister
    val f = java.io.File.createTempFile("graft_ntv2", ".gsb")
    val os = new java.io.FileOutputStream(f); os.write(bytes); os.close()
    val inBox = (15.25, 12.5)
    val outside = (-1.5, 52.0) // GB — outside the fictional box
    val helmertIn = pt(inBox._1, inBox._2, "EPSG:4277", "EPSG:4326")
    val helmertOut = pt(outside._1, outside._2, "EPSG:4277", "EPSG:4326")
    CrsTransform.registerGridShift("EPSG:4277", f.getAbsolutePath)
    try {
      val (glon, glat) = pt(inBox._1, inBox._2, "EPSG:4277", "EPSG:4326")
      val r = (12.5 - 10.0) / 0.5; val c = (20.0 - 15.25) / 0.5
      assert(glat == 12.5 + ((2 * r + c) * 0.125 + 1.0) / 3600.0, "grid lat applied")
      assert(glon == 15.25 - ((r + c * 3) * 0.0625 - 2.0) / 3600.0, "grid lon applied")
      assert((glon, glat) != helmertIn, "grid must differ from Helmert in coverage")
      // inverse direction (4326 -> 4277) round-trips through the grid
      val (ilon, ilat) = pt(glon, glat, "EPSG:4326", "EPSG:4277")
      assert(math.abs(ilon - inBox._1) < 1e-11 && math.abs(ilat - inBox._2) < 1e-11)
      // outside coverage: Helmert fallback, bit-identical to pre-registration
      assert(pt(outside._1, outside._2, "EPSG:4277", "EPSG:4326") == helmertOut)
      // projected CRS on the same datum picks the grid up too
      val (bx, by) = pt(inBox._1, inBox._2, "EPSG:4326", "EPSG:27700")
      assert(!bx.isNaN && !by.isNaN)
    } finally {
      CrsTransform.unregisterGridShift("EPSG:4277")
      f.delete()
    }
    assert(pt(inBox._1, inBox._2, "EPSG:4277", "EPSG:4326") == helmertIn,
      "unregister must restore the Helmert leg")
  }
}
