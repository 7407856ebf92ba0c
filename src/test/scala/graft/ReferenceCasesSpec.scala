package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Expected-value cases ported verbatim from the reference's own
  * parameterized test suites (python/sedonadb/tests/functions) — the
  * "switch engines and run today's queries" bar, asserted literally.
  * Geometry results compare as normalized WKT; null in = null out.
  */
class ReferenceCasesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
  }

  override def afterAll(): Unit = spark.stop()

  private def q(expr: String): Any =
    spark.sql(s"SELECT $expr AS r").collect()(0).get(0)

  /** Normalized-WKT equality through st_astext(st_geomfromwkt(...)),
    * so formatting differences don't mask topological equality. */
  private def sameGeom(expr: String, expected: String): Unit = {
    if (expected == null) assert(q(expr) == null, s"$expr should be NULL")
    else {
      val got = q(s"st_astext(st_normalize($expr))")
      val want = q(s"st_astext(st_normalize(st_geomfromwkt('$expected')))")
      assert(got == want, s"$expr: got $got want $want")
    }
  }

  test("ST_LineSubstring (tests/functions/test_linesubstring.py)") {
    def ls(geom: String, s: String, e: String, expected: String): Unit =
      sameGeom(s"st_linesubstring(st_geomfromwkt('$geom'), $s, $e)", expected)
    // zero-length and single-segment cases
    ls("LINESTRING (0 0, 0 0)", "0.0", "1.0", "POINT (0 0)")
    ls("LINESTRING (0 0, 10 0)", "0.0", "1.0", "LINESTRING (0 0, 10 0)")
    ls("LINESTRING (0 0, 10 0)", "0.2", "0.8", "LINESTRING (2 0, 8 0)")
    ls("LINESTRING (0 0, 10 10)", "0.5", "0.5", "POINT (5 5)")
    // degenerate edges collapse
    ls("LINESTRING (0 0, 0 0, 10 0)", "0.0", "1.0", "LINESTRING (0 0, 10 0)")
    ls("LINESTRING (0 0, 10 0, 10 0)", "0.0", "1.0", "LINESTRING (0 0, 10 0)")
    // three equal segments
    val sq = "LINESTRING (0 0, 10 0, 10 10, 0 10)"
    ls(sq, "0.0", "1.0", sq)
    ls(sq, "0.0", "1.0D/3.0D", "LINESTRING (0 0, 10 0)")
    ls(sq, "1.0D/3.0D", "2.0D/3.0D", "LINESTRING (10 0, 10 10)")
    ls(sq, "2.0D/3.0D", "1.0", "LINESTRING (10 10, 0 10)")
    ls(sq, "0.0", "1.0D/6.0D", "LINESTRING (0 0, 5 0)")
    ls(sq, "0.4", "0.6", "LINESTRING (10 2, 10 8)")
    ls(sq, "0.75", "0.9", "LINESTRING (7.5 10, 3 10)")
    ls(sq, "1.0D/6.0D", "5.0D/6.0D", "LINESTRING (5 0, 10 0, 10 10, 5 10)")
    // measured/3D interpolation
    ls("LINESTRING Z (0 0 0, 10 10 10)", "0.5", "0.8", "LINESTRING Z (5 5 5, 8 8 8)")
    ls("LINESTRING M (0 10 20, 10 20 30)", "0.0", "0.5", "LINESTRING M (0 10 20, 5 15 25)")
    ls("LINESTRING ZM (0 10 20 30, 10 20 30 40)", "0.5", "0.8",
      "LINESTRING ZM (5 15 25 35, 8 18 28 38)")
    // empty/null propagation
    assert(q("st_linesubstring(st_geomfromwkt('LINESTRING EMPTY'), 0.0, 1.0)") == null ||
      q("st_astext(st_linesubstring(st_geomfromwkt('LINESTRING EMPTY'), 0.0, 1.0))")
        .toString.contains("EMPTY"))
    assert(q("st_linesubstring(NULL, 0.0, 1.0)") == null)
    assert(q("st_linesubstring(st_geomfromwkt('LINESTRING (0 0, 10 10)'), NULL, 1.0)") == null)
    assert(q("st_linesubstring(st_geomfromwkt('LINESTRING (0 0, 10 10)'), 0.0, NULL)") == null)
  }

  test("ST_Azimuth quadrants (tests/functions/test_functions.py)") {
    def az(a: String, b: String): Double =
      q(s"st_azimuth(st_geomfromwkt('$a'), st_geomfromwkt('$b'))").asInstanceOf[Double]
    val eps = 1e-12
    assert(math.abs(az("POINT (0 0)", "POINT (0 1)") - 0.0) < eps) // north
    assert(math.abs(az("POINT (0 0)", "POINT (1 0)") - math.Pi / 2) < eps) // east
    assert(math.abs(az("POINT (0 0)", "POINT (0 -1)") - math.Pi) < eps) // south
    assert(math.abs(az("POINT (0 0)", "POINT (-1 0)") - 3 * math.Pi / 2) < eps) // west
    assert(math.abs(az("POINT (0 0)", "POINT (1 1)") - math.Pi / 4) < eps)
    assert(q("st_azimuth(st_point(0,0), st_point(0,0))") == null) // same point
  }

  test("predicate truth table on the canonical overlap boxes (test_predicates.py)") {
    // the reference exercises predicates on a shifted-box pair; assert the
    // full truth table both ways
    val a = "st_makeenvelope(0,0,2,2)"
    val b = "st_makeenvelope(1,1,3,3)"
    val c = "st_makeenvelope(0,0,1,1)" // corner-touching a's interior region
    assert(q(s"st_intersects($a, $b)") == true)
    assert(q(s"st_overlaps($a, $b)") == true)
    assert(q(s"st_contains($a, $b)") == false)
    assert(q(s"st_within($a, $b)") == false)
    assert(q(s"st_touches($a, $b)") == false)
    assert(q(s"st_disjoint($a, st_makeenvelope(5,5,6,6))") == true)
    assert(q(s"st_contains($a, $c)") == true)
    assert(q(s"st_covers($a, $c)") == true)
    assert(q(s"st_coveredby($c, $a)") == true)
    assert(q(s"st_within($c, $a)") == true)
    assert(q(s"st_touches($c, st_makeenvelope(1,0,2,1))") == true)
    assert(q(s"st_equals($a, st_makeenvelope(0,0,2,2))") == true)
    assert(q(s"st_crosses(st_geomfromwkt('LINESTRING (-1 1, 4 1)'), $a)") == true)
  }

  test("overlay results on the canonical overlap boxes (test_overlay.py)") {
    val a = "st_makeenvelope(0,0,2,2)"
    val b = "st_makeenvelope(1,1,3,3)"
    assert(q(s"st_area(st_intersection($a, $b))") == 1.0)
    assert(q(s"st_area(st_union($a, $b))") == 7.0)
    assert(q(s"st_area(st_difference($a, $b))") == 3.0)
    assert(q(s"st_area(st_symdifference($a, $b))") == 6.0)
    sameGeom(s"st_intersection($a, $b)", "POLYGON ((1 1, 1 2, 2 2, 2 1, 1 1))")
  }

  test("ST_Distance cases (tests/functions/test_distance.py)") {
    assert(q("st_distance(st_point(0,0), st_point(3,4))") == 5.0)
    assert(q(
      "st_distance(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(5, 3))") == 3.0)
    assert(q(
      "st_distance(st_makeenvelope(0,0,1,1), st_makeenvelope(2,0,3,1))") == 1.0)
    assert(q("st_distance(st_point(1,1), st_makeenvelope(0,0,2,2))") == 0.0) // inside
  }

  test("ST_Area over every geometry class (test_functions.py)") {
    def area(wkt: String): Double =
      q(s"st_area(st_geomfromwkt('$wkt'))").asInstanceOf[Double]
    for (w <- Seq("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
      "GEOMETRYCOLLECTION EMPTY", "POINT (5 2)", "MULTIPOINT ((0 0), (1 1))",
      "LINESTRING (0 0, 1 1)", "MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))"))
      assert(area(w) == 0.0, w)
    assert(area("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))") == 1.0)
    assert(area("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((0 0, 1 0, 1 1, 0 1, 0 0)))") == 2.0)
    // nested collection counts every polygon once
    assert(area("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), " +
      "LINESTRING (0 0, 1 1), GEOMETRYCOLLECTION (POLYGON ((0 0, -1 0, -1 -1, 0 -1, 0 0))))") == 2.0)
  }

  test("ST_StartPoint any-geometry / ST_EndPoint linestring-only (test_functions.py)") {
    def sp(wkt: String, expected: String): Unit =
      sameGeom(s"st_startpoint(st_geomfromwkt('$wkt'))", expected)
    for (e <- Seq("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
        "MULTIPOINT EMPTY", "MULTILINESTRING EMPTY", "MULTIPOLYGON EMPTY",
        "GEOMETRYCOLLECTION EMPTY"))
      assert(q(s"st_startpoint(st_geomfromwkt('$e'))") == null, e)
    sp("LINESTRING (1 2, 3 4, 5 6)", "POINT (1 2)")
    sp("LINESTRING Z (1 2 3, 3 4 5, 5 6 7)", "POINT Z (1 2 3)")
    sp("LINESTRING M (1 2 3, 3 4 5, 5 6 7)", "POINT M (1 2 3)")
    sp("LINESTRING ZM (1 2 3 4, 3 4 5 6, 5 6 7 8)", "POINT ZM (1 2 3 4)")
    sp("POINT (1 2)", "POINT (1 2)")
    sp("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (0 0)")
    sp("MULTIPOINT (0 0, 10 0, 10 10, 0 10, 0 0)", "POINT (0 0)")
    sp("MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))", "POINT (1 2)")
    sp("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)))", "POINT (0 0)")
    sp("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (3 4, 5 6))", "POINT (1 2)")
    sp("GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (" +
      "POINT (1 2), LINESTRING (3 4, 5 6))))", "POINT (1 2)")
    // EndPoint: strict linestring contract
    sameGeom("st_endpoint(st_geomfromwkt('LINESTRING ZM (1 2 3 4, 3 4 5 6, 5 6 7 8)'))",
      "POINT ZM (5 6 7 8)")
    assert(q("st_endpoint(st_geomfromwkt('POINT (1 2)'))") == null)
    assert(q("st_endpoint(st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'))") == null)
    assert(q("st_endpoint(st_geomfromwkt('MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))'))") == null)
  }

  test("ST_PointN / ST_InteriorRingN index contracts (test_functions.py)") {
    // PointN: 1-based, negative = from end
    sameGeom("st_pointn(st_geomfromwkt('LINESTRING (1 2, 3 4, 5 6)'), -1)", "POINT (5 6)")
    sameGeom("st_pointn(st_geomfromwkt('LINESTRING ZM (1 2 3 4, 3 4 5 6, 5 6 7 8)'), 2)",
      "POINT ZM (3 4 5 6)")
    assert(q("st_pointn(st_geomfromwkt('LINESTRING (1 2, 3 4, 5 6)'), 0)") == null)
    assert(q("st_pointn(st_geomfromwkt('LINESTRING (1 2, 3 4, 5 6)'), 4)") == null)
    assert(q("st_pointn(st_geomfromwkt('LINESTRING (1 2, 3 4, 5 6)'), -4)") == null)
    assert(q("st_pointn(st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), 1)") == null)
    assert(q("st_pointn(st_geomfromwkt('MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))'), 1)") == null)
    assert(q("st_pointn(st_geomfromwkt('LINESTRING EMPTY'), 1)") == null)
    // InteriorRingN: 1-based only, NO negative indexing
    val holed = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1), " +
      "(4 4, 4 5, 5 5, 5 4, 4 4))"
    sameGeom(s"st_interiorringn(st_geomfromwkt('$holed'), 1)",
      "LINESTRING (1 1, 1 2, 2 2, 2 1, 1 1)")
    sameGeom(s"st_interiorringn(st_geomfromwkt('$holed'), 2)",
      "LINESTRING (4 4, 4 5, 5 5, 5 4, 4 4)")
    assert(q(s"st_interiorringn(st_geomfromwkt('$holed'), 3)") == null)
    assert(q(s"st_interiorringn(st_geomfromwkt('$holed'), 0)") == null)
    assert(q(s"st_interiorringn(st_geomfromwkt('$holed'), -1)") == null)
    assert(q("st_interiorringn(st_geomfromwkt('MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1, 1 1)))'), 1)") == null)
    assert(q("st_interiorringn(st_geomfromwkt('POINT (0 0)'), 1)") == null)
    assert(q("st_interiorringn(st_geomfromwkt('POLYGON EMPTY'), 1)") == null)
  }

  test("ST_IsRing errors on non-linestrings; ST_LineLocatePoint contracts " +
      "(test_functions.py)") {
    assert(q("st_isring(st_geomfromwkt('LINESTRING (0 0, 0 1, 1 1, 1 0, 0 0)'))") == true)
    assert(q("st_isring(st_geomfromwkt('LINESTRING (0 0, 0 1, 1 1)'))") == false)
    for (bad <- Seq("POINT(0 0)", "MULTIPOINT((0 0), (1 1))",
        "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))",
        "MULTILINESTRING((0 0, 0 1, 1 1, 1 0, 0 0))",
        "GEOMETRYCOLLECTION(LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0))")) {
      val e = intercept[Exception](q(s"st_isring(st_geomfromwkt('$bad'))"))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString(" ")
      assert(msgs.toLowerCase.contains("linestring"), bad)
    }
    assert(q("st_linelocatepoint(st_geomfromwkt('LINESTRING EMPTY'), " +
      "st_geomfromwkt('POINT (0 0)'))") == null)
    assert(q("st_linelocatepoint(st_geomfromwkt('LINESTRING (0 0, 1 1)'), " +
      "st_geomfromwkt('POINT EMPTY'))") == null)
    val e2 = intercept[Exception](q("st_linelocatepoint(" +
      "st_geomfromwkt('POLYGON ((0 0, 1 0, 1 1, 0 0))'), st_geomfromwkt('POINT (0.5 0.5)'))"))
    val m2 = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
    assert(m2.toLowerCase.contains("linestring"))
  }

  test("typed WKT constructors: SRID arg, matching EMPTY, wrong-type errors " +
      "(test_functions.py)") {
    val table = Seq(
      ("st_pointfromtext", "POINT (1 2)", "POINT EMPTY", "LINESTRING EMPTY"),
      ("st_linefromtext", "LINESTRING (0 0, 1 1)", "LINESTRING EMPTY", "POINT EMPTY"),
      ("st_polygonfromtext", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON EMPTY", "POINT EMPTY"),
      ("st_mpointfromtext", "MULTIPOINT ((0 0))", "MULTIPOINT EMPTY", "LINESTRING EMPTY"),
      ("st_mlinefromtext", "MULTILINESTRING ((0 0, 1 1))", "MULTILINESTRING EMPTY", "POINT EMPTY"),
      ("st_mpolyfromtext", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))", "MULTIPOLYGON EMPTY", "POINT EMPTY"),
      ("st_geomcollfromtext", "GEOMETRYCOLLECTION (POINT (0 0))", "GEOMETRYCOLLECTION EMPTY", "LINESTRING EMPTY"))
    for ((fn, wkt, matchingEmpty, wrongEmpty) <- table) {
      assert(q(s"st_srid($fn('$wkt', 4326))") == 4326, fn)
      sameGeom(s"$fn('$matchingEmpty')", matchingEmpty)
      intercept[Exception](q(s"$fn('$wrongEmpty')"))
    }
    // st_linestringfromtext is an alias of st_linefromtext
    sameGeom("st_linestringfromtext('LINESTRING (0 0, 1 1)')", "LINESTRING (0 0, 1 1)")
    // ST_GeomFromText with int or digit-string SRID
    assert(q("st_srid(st_geomfromtext('POINT (0 0)', 0))") == 0)
    assert(q("st_srid(st_geomfromtext('POINT (0 0)', 4326))") == 4326)
    assert(q("st_srid(st_geomfromtext('POINT (0 0)', '4326'))") == 4326)
    assert(q("st_srid(st_geomfromtext('POINT (0 0)', CAST(NULL AS INT)))") == null)
    // ST_Point with SRID third arg
    assert(q("st_srid(st_point(1, 1, 0))") == 0)
    assert(q("st_srid(st_point(1, 1, 4326))") == 4326)
    assert(q("st_srid(st_point(1, 1, '4326'))") == 4326)
  }

  test("ST_Boundary of closed rings / points is empty (test_functions.py)") {
    for (wkt <- Seq("POINT (5 10)", "MULTIPOINT (100 200)",
        "MULTIPOINT (5 10, 15 20)", "MULTIPOINT (1 1, 2 2, 3 3, 1 1)",
        "LINESTRING(10 10, 20 20, 30 10, 10 10)",
        "MULTILINESTRING ((0 0, 0 1, 1 0, 0 0), (10 10, 10 20, 20 10, 10 10))"))
      assert(q(s"st_isempty(st_boundary(st_geomfromwkt('$wkt')))") == true, wkt)
  }

  test("ST_MinimumClearance / ST_MinimumClearanceLine (test_functions.py)") {
    def mc(wkt: String): Double =
      q(s"st_minimumclearance(st_geomfromwkt('$wkt'))").asInstanceOf[Double]
    assert(q("st_minimumclearance(CAST(NULL AS BINARY))") == null)
    assert(mc("POINT (1 1)").isPosInfinity)
    assert(mc("POLYGON EMPTY").isPosInfinity)
    assert(mc("LINESTRING (0 0, 1 1, 2 2)") == 1.4142135623730951)
    assert(mc("LINESTRING (5 107, 54 84, 101 100)") == 49.64876634922564)
    assert(mc("LINESTRING(0 0,0 0,1 1,1 1,2 2)") == 1.4142135623730951)
    assert(mc("POLYGON((0 0,0 3,3 3,3 0,0 0),(1 1,1 2,2 2,2 1,1 1))") == 1.0)
    assert(mc("POLYGON((0 0,0 1,0 1,1 1,1 0,0 0,0 0))") == 1.0)
    assert(mc("POLYGON((0 0,3 0,3 3,2 1,1 3,0 3,0 0))") == 1.0)
    assert(mc("MULTIPOINT (10 40, 40 30)") == 31.622776601683793)
    assert(mc("MULTIPOINT ((10 10), (20 20), (30 30))") == 14.142135623730951)
    assert(mc("MULTILINESTRING ((10 10, 20 20), (30 30, 40 40))") == 14.142135623730951)
    assert(mc("MULTILINESTRING ((5 5, 10 5, 10 15), (20 20, 25 10))") == 5.0)
    assert(mc("MULTIPOLYGON(((26 125, 26 200, 126 200, 126 125, 26 125 )," +
      "( 51 150, 101 150, 76 175, 51 150 )),(( 151 100, 151 200, 176 175, 151 100 )))")
      == 25.0)
    assert(mc("GEOMETRYCOLLECTION(POINT(1 1),MULTIPOLYGON(((0 2,1 1,0 0,0 2))," +
      "((2 0,1 1,2 2,2 0))))") == 1.0)
    def mcl(wkt: String, expected: String): Unit =
      sameGeom(s"st_minimumclearanceline(st_geomfromwkt('$wkt'))", expected)
    mcl("POLYGON ((0 0, 1 0, 1 1, 0.5 3.2e-4, 0 0))", "LINESTRING (0.5 0.00032, 0.5 0)")
    mcl("LINESTRING (5 107, 54 84, 101 100)", "LINESTRING (54 84, 101 100)")
    // the square-with-hole has four equally-minimal witness segments
    // (every hole-shell gap is exactly 1): GEOS picks (1 1)-(1 2), JTS
    // picks (0 1)-(1 1) — same clearance, tie-broken differently, so pin
    // the length only
    assert(q("st_length(st_minimumclearanceline(st_geomfromwkt(" +
      "'POLYGON((0 0,0 3,3 3,3 0,0 0),(1 1,1 2,2 2,2 1,1 1))')))") == 1.0)
    mcl("POLYGON((0 0,0 1,0 1,1 1,1 0,0 0,0 0))", "LINESTRING (0 0, 0 1)")
    mcl("LINESTRING (0 0, 1 1, 2 2)", "LINESTRING (0 0, 1 1)")
    mcl("POINT (1 1)", "LINESTRING EMPTY")
    mcl("POLYGON EMPTY", "LINESTRING EMPTY")
    mcl("POLYGON((0 0,3 0,3 3,2 1,1 3,0 3,0 0))", "LINESTRING (1 3, 0 3)")
  }

  test("ST_DelaunayTriangles tolerance + only-edges flag (test_functions.py)") {
    sameGeom("st_delaunaytriangles(st_geomfromwkt('MULTIPOINT ((0 0), (1 0), (0.5 1))'), 0.0D)",
      "GEOMETRYCOLLECTION (POLYGON ((0.5 1, 0 0, 1 0, 0.5 1)))")
    // tolerance snaps the near-duplicate site away
    sameGeom("st_delaunaytriangles(st_geomfromwkt('MULTIPOINT ((0 0), (0.001 0), (1 0), (0.5 1))'), 1.0D)",
      "GEOMETRYCOLLECTION (POLYGON ((0.5 1, 0 0, 1 0, 0.5 1)))")
    sameGeom("st_delaunaytriangles(st_geomfromwkt('MULTIPOINT ((0 0), (1 0), (0.5 1))'), 0.0D, 1)",
      "MULTILINESTRING ((0.5 1, 1 0), (0 0, 0.5 1), (0 0, 1 0))")
    assert(q("st_delaunaytriangles(CAST(NULL AS BINARY))") == null)
  }

  test("ST_ConcaveHull allow_holes arg (test_functions.py)") {
    def ch(wkt: String, pct: Double, holes: Boolean, expected: String): Unit = {
      if (expected.toUpperCase.contains("EMPTY"))
        assert(q(s"st_isempty(st_concavehull(st_geomfromwkt('$wkt'), ${pct}D, $holes))")
          == true, wkt)
      else
        assert(q(s"st_equals(st_concavehull(st_geomfromwkt('$wkt'), ${pct}D, $holes), " +
          s"st_geomfromwkt('$expected'))") == true, wkt)
    }
    ch("POINT EMPTY", 0.1, true, "POLYGON EMPTY")
    ch("POINT (2.5 3.1)", 0.1, true, "POINT (2.5 3.1)")
    ch("LINESTRING EMPTY", 0.2, true, "POLYGON EMPTY")
    ch("LINESTRING (100 150, 50 60, 70 80, 160 170)", 0.2, true,
      "POLYGON ((50 60, 100 150, 160 170, 70 80, 50 60))")
    ch("LINESTRING (100 150, 50 60, 70 80, 160 170)", 0.2, false,
      "POLYGON ((70 80, 50 60, 100 150, 160 170, 70 80))")
    ch("POLYGON ((70 80, 50 60, 100 150, 160 170, 70 80))", 0.2, false,
      "POLYGON ((70 80, 50 60, 100 150, 160 170, 70 80))")
    ch("POLYGON ((70 80, 50 60, 100 150, 160 170, 70 80))", 0.2, true,
      "POLYGON ((70 80, 50 60, 100 150, 160 170, 70 80))")
    ch("MULTIPOINT EMPTY", 0.2, false, "POLYGON EMPTY")
    ch("MULTIPOINT ((10 40), (40 30), (20 20), (30 10))", 0.1, true,
      "POLYGON ((40 30, 30 10, 20 20, 10 40, 40 30))")
    ch("MULTIPOINT ((10 40), (40 30), (20 20), (30 10))", 0.1, false,
      "POLYGON ((20 20, 10 40, 40 30, 30 10, 20 20))")
    ch("MULTILINESTRING EMPTY", 0.1, false, "POLYGON EMPTY")
    ch("MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))", 0.1, true,
      "POLYGON ((30 30, 40 40, 40 20, 30 10, 10 10, 20 20, 10 40, 30 30))")
    ch("MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))", 0.1, false,
      "POLYGON ((20 20, 10 40, 30 30, 40 40, 40 20, 30 10, 10 10, 20 20))")
    ch("GEOMETRYCOLLECTION EMPTY", 0.1, true, "POLYGON EMPTY")
    ch("GEOMETRYCOLLECTION (MULTIPOINT((1 1), (3 3)), POINT(5 6), LINESTRING(4 5, 5 6))",
      0.1, true, "POLYGON ((1 1, 4 5, 5 6, 3 3, 1 1))")
    ch("GEOMETRYCOLLECTION (MULTIPOINT((1 1), (3 3)), POINT(5 6), LINESTRING(4 5, 5 6))",
      0.1, false, "POLYGON ((3 3, 1 1, 4 5, 5 6, 3 3))")
  }

  test("ST_BuildArea linework/puntal/polygonal table (test_functions.py)") {
    sameGeom("st_buildarea(st_geomfromwkt('LINESTRING (0 0, 1 0, 1 1, 0 0)'))",
      "POLYGON ((0 0, 1 1, 1 0, 0 0))")
    sameGeom("st_buildarea(st_geomfromwkt('MULTILINESTRING ((0 0, 1 0, 1 1, 0 0), " +
      "(2 2, 3 2, 3 3, 2 2))'))",
      "MULTIPOLYGON (((1 1, 1 0, 0 0, 1 1)), ((3 3, 3 2, 2 2, 3 3)))")
    // polygonal input rebuilds from its boundary rings
    sameGeom("st_buildarea(st_geomfromwkt('POLYGON ((0 0, 1 0, 1 1, 0 0))'))",
      "POLYGON ((0 0, 1 1, 1 0, 0 0))")
    sameGeom("st_buildarea(st_geomfromwkt('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))'))",
      "POLYGON ((0 0, 1 1, 1 0, 0 0))")
    // empty linework -> POLYGON EMPTY; puntal -> NULL
    sameGeom("st_buildarea(st_geomfromwkt('LINESTRING EMPTY'))", "POLYGON EMPTY")
    sameGeom("st_buildarea(st_geomfromwkt('MULTILINESTRING EMPTY'))", "POLYGON EMPTY")
    assert(q("st_buildarea(st_geomfromwkt('POINT (0 0)'))") == null)
    assert(q("st_buildarea(CAST(NULL AS BINARY))") == null)
  }

  test("ST_IsSimple truth table (test_functions.py)") {
    def simple(wkt: String): Any = q(s"st_issimple(st_geomfromwkt('$wkt'))")
    assert(q("st_issimple(CAST(NULL AS BINARY))") == null)
    assert(simple("POINT (1 1)") == true)
    assert(simple("POINT EMPTY") == true)
    assert(simple("MULTIPOINT (1 1, 2 2, 3 3)") == true)
    assert(simple("MULTIPOINT (1 1, 2 2, 1 1)") == false)
    assert(simple("MULTIPOINT EMPTY") == true)
    assert(simple("LINESTRING (0 0, 1 1)") == true)
    assert(simple("LINESTRING (0 0, 1 1, 2 2)") == true)
    assert(simple("LINESTRING (0 0, 1 1, 0 1, 1 0)") == false)
    assert(simple("LINESTRING(1 1,2 2,2 3.5,1 3,1 2,2 1)") == false)
    assert(simple("LINESTRING (0 0, 1 1, 0 0)") == false)
    assert(simple("LINESTRING (0 0, 1 1, 1 0, 0 0)") == true)
    assert(simple("LINESTRING EMPTY") == true)
    assert(simple("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))") == true)
    assert(simple("POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))") == false)
    assert(simple("POLYGON((1 2, 3 4, 5 6, 1 2))") == false)
    assert(simple("POLYGON((0 0, 2 0, 1 1, 2 2, 0 2, 1 1, 0 0))") == false)
    assert(simple("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))") == true)
    assert(simple("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 0 2, 2 2, 1 1))") == true)
    assert(simple("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))") == true)
    assert(simple("MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))") == false)
    assert(simple("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))") == true)
    assert(simple("MULTILINESTRING ((0 0, 1 1, 2 2), (2 2, 3 3))") == true)
    assert(simple("MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0), " +
      "(1 1, 3 1, 3 3, 1 3, 1 1))") == false)
    assert(simple("MULTILINESTRING ((0 0, 2 2), (1 0, 1 2))") == false)
    assert(simple("MULTILINESTRING EMPTY") == true)
    assert(simple("MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)))") == true)
    assert(simple("MULTIPOLYGON (((0 0, 0 2, 2 2, 2 0, 0 0)), " +
      "((3 0, 3 2, 5 2, 5 0, 3 0)))") == true)
  }

  test("ST_IsValidReason messages (test_functions.py)") {
    assert(q("st_isvalidreason(CAST(NULL AS BINARY))") == null)
    assert(q("st_isvalidreason(st_geomfromwkt('POINT (0 0)'))") == "Valid Geometry")
    assert(q("st_isvalidreason(st_geomfromwkt('POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))'))")
      == "Valid Geometry")
    assert(q("st_isvalidreason(st_geomfromwkt('POLYGON ((0 0, 1 1, 0 1, 1 0, 0 0))'))")
      .asInstanceOf[String].startsWith("Self-intersection"))
    assert(q("st_isvalidreason(st_geomfromwkt('Polygon((0 0, 2 0, 1 1, 2 2, 0 2, 1 1, 0 0)'" +
      " || '))'))").asInstanceOf[String].startsWith("Ring Self-intersection"))
  }

  test("ST_Buffer areas match GEOS quad_segs=8 values (test_functions.py)") {
    def bufArea(wkt: String, dist: Double): Double =
      q(s"st_area(st_buffer(st_geomfromwkt('$wkt'), ${dist}D))").asInstanceOf[Double]
    val eps = 1e-3 // the reference's own epsilon for this table
    assert(math.abs(bufArea("POINT (0 0)", 1.0) - 3.121445152258052) < eps)
    assert(math.abs(bufArea("POINT (0 0)", 2.0) - 12.485780609032208) < eps)
    assert(math.abs(bufArea("LINESTRING (0 0, 1 1)", 1.0) - 5.949872277004242) < eps)
    assert(math.abs(bufArea("LINESTRING (0 0, 1 1)", 2.0) - 18.14263485852459) < eps)
    assert(math.abs(bufArea("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 2.0) - 21.48578060903221) < eps)
    assert(math.abs(bufArea("MULTIPOINT ((0 0), (1 1))", 1.0) - 5.682167728387077) < eps)
    assert(math.abs(bufArea("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), " +
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))", 1.0) - 8.121445152256216) < eps)
    assert(bufArea("POINT (1 1)", 0.0) == 0.0)
    assert(bufArea("POLYGON EMPTY", 1.0) == 0.0)
  }

  test("ST_Buffer style parameters match GEOS 3.12 areas (test_functions.py)") {
    def bufArea(wkt: String, dist: Double, style: String): Double =
      q(s"st_area(st_buffer(st_geomfromwkt('$wkt'), ${dist}D, '$style'))")
        .asInstanceOf[Double]
    val eps = 1e-3
    val cases = Seq(
      ("POINT(100 90)", 50.0, "quad_segs=8", 7803.612880645131),
      ("LINESTRING(50 50,150 150,150 50)", 10.0, "endcap=round join=round",
        5016.204476944362),
      ("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))", 2.0, "join=miter", 196.0),
      ("LINESTRING(0 0, 10 0)", 5.0, "endcap=square", 200.0),
      ("POINT(0 0)", 10.0, "quad_segs=4", 306.1467458920718),
      ("POINT(0 0)", 10.0, "quad_segs=16", 313.654849054594),
      ("LINESTRING(0 0, 100 0, 100 100)", 5.0, "join=bevel", 2065.536128806451),
      ("LINESTRING(0 0, 50 0)", 10.0, "endcap=flat", 1000.0),
      ("POLYGON((0 0, 0 20, 20 20, 20 0, 0 0))", -2.0, "join=round", 256.0),
      ("POLYGON((0 0, 0 100, 100 100, 100 0, 0 0), (20 20, 20 80, 80 80, 80 20, 20 20))",
        5.0, "join=round quad_segs=4", 9576.536686473019),
      ("MULTIPOINT((10 10), (30 30))", 5.0, "quad_segs=8", 156.0722576129026),
      ("GEOMETRYCOLLECTION(POINT(10 10), LINESTRING(50 50, 60 60))", 3.0,
        "endcap=round join=round", 141.0388264830308),
      ("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))", 0.0, "join=miter", 100.0),
      ("POINT(0 0)", 0.1, "quad_segs=8", 0.031214451522580514),
      ("LINESTRING(0 0, 50 0, 50 50)", 10.0, "join=miter miter_limit=2",
        2312.1445152258043),
      ("LINESTRING(0 0, 0 100)", 10.0, "side=left", 1000.0),
      // the reference's own table documents a GEOS version split here:
      // GEOS 3.12+ = 12713.61 (artifact fix libgeos@091f6d99), GEOS 3.9 /
      // PostGIS = 16285.08. JTS matches the PostGIS-side value.
      ("LINESTRING (50 50, 150 150, 150 50)", 100.0, "side=right",
        16285.07633336958),
      // polygon single-sided: same documented GEOS version split — the
      // reference table lists 10000.0 / 6400.0 for GEOS 3.12 and
      // 19248.58 / 3600.0 for GEOS 3.9 (PostGIS); JTS matches the latter
      ("POLYGON ((50 50, 50 150, 150 150, 150 50, 50 50))", 20.0, "side=left",
        19248.578060903223),
      ("POLYGON ((50 50, 50 150, 150 150, 150 50, 50 50))", 20.0,
        "side=right endcap=flat", 3600.0),
      ("LINESTRING (50 50, 150 150, 150 50)", 100.0, "side=both",
        69888.089291866))
    cases.foreach { case (wkt, dist, style, want) =>
      val got = bufArea(wkt, dist, style)
      assert(math.abs(got - want) < math.max(eps, want * 1e-6),
        s"'$style' on $wkt: got $got want $want")
    }
    // invalid parameters fail loudly, like the reference
    intercept[Exception](q("st_buffer(st_point(0,0), 1.0D, 'bogus=1')"))
    intercept[Exception](q("st_buffer(st_point(0,0), 1.0D, 'endcap=wavy')"))
    intercept[Exception](q("st_buffer(st_point(0,0), 1.0D, 'side=up')"))
    intercept[Exception](q("st_buffer(st_point(0,0), 1.0D, 'quad_segs=abc')"))
  }

  test("ST_Centroid incl. collections (test_functions.py)") {
    sameGeom("st_centroid(st_geomfromwkt('LINESTRING (0 0, 1 1)'))", "POINT (0.5 0.5)")
    sameGeom("st_centroid(st_geomfromwkt('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))",
      "POINT (0.5 0.5)")
    sameGeom("st_centroid(st_geomfromwkt('MULTIPOINT ((0 0), (1 1))'))", "POINT (0.5 0.5)")
    sameGeom("st_centroid(st_geomfromwkt('MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))'))",
      "POINT (1 1)")
    // mixed collection: centroid of the highest-dimension members
    sameGeom("st_centroid(st_geomfromwkt('GEOMETRYCOLLECTION (POINT (0 0), " +
      "LINESTRING (0 0, 1 1), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))'))", "POINT (0.5 0.5)")
  }

  test("ST_Boundary incl. nested collections (test_functions.py)") {
    sameGeom("st_boundary(st_geomfromwkt('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))",
      "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)")
    sameGeom("st_boundary(st_geomfromwkt('LINESTRING (0 0, 1 1)'))",
      "MULTIPOINT (0 0, 1 1)")
    // nested GC: per-member boundaries, grouped by dimension
    sameGeom("st_boundary(st_geomfromwkt('GEOMETRYCOLLECTION(LINESTRING(1 1,2 2)," +
      "GEOMETRYCOLLECTION(POLYGON((3 3,4 4,5 5,3 3)),GEOMETRYCOLLECTION(" +
      "LINESTRING(6 6,7 7),POLYGON((8 8,9 9,10 10,8 8)))))'))",
      "GEOMETRYCOLLECTION (MULTIPOINT (1 1, 2 2, 6 6, 7 7), " +
        "MULTILINESTRING ((3 3, 4 4, 5 5, 3 3), (8 8, 9 9, 10 10, 8 8)))")
  }

  test("ST_Force2D/3D coordinate rewrites (test_functions.py)") {
    sameGeom("st_force2d(st_geomfromwkt('POINT Z (0 1 2)'))", "POINT (0 1)")
    sameGeom("st_force3d(st_geomfromwkt('POINT (0 1)'), 5.0D)", "POINT Z (0 1 5)")
    sameGeom("st_force3d(st_geomfromwkt('LINESTRING (0 1, 2 3)'), 5.0D)",
      "LINESTRING Z (0 1 5, 2 3 5)")
    sameGeom("st_force3d(st_geomfromwkt('GEOMETRYCOLLECTION (POINT (1 2), " +
      "LINESTRING (3 4, 5 6), POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0)))'), 5.0D)",
      "GEOMETRYCOLLECTION Z (POINT Z (1 2 5), LINESTRING Z (3 4 5, 5 6 5), " +
        "POLYGON Z ((0 0 5, 0 1 5, 1 1 5, 1 0 5, 0 0 5)))")
    // existing Z wins over the default
    sameGeom("st_force3d(st_geomfromwkt('POINT Z (0 1 2)'), 5.0D)", "POINT Z (0 1 2)")
  }

  test("ST_UnaryUnion preserves Z/M through no-op and overlap unions (test_functions.py)") {
    def uu(wkt: String): String =
      q(s"replace(st_astext(st_unaryunion(st_geomfromwkt('$wkt'))), ' ', '')")
        .asInstanceOf[String]
    assert(uu("POINT M (0 1 2)") == "POINTM(012)")
    assert(uu("POINT Z (0 0 0)") == "POINTZ(000)")
    assert(uu("POINT ZM (1 2 3 4)") == "POINTZM(1234)")
    assert(uu("LINESTRING Z (0 0 0, 1 1 1)") == "LINESTRINGZ(000,111)")
    assert(uu("LINESTRING ZM (0 0 1 2, 1 1 3 4)") == "LINESTRINGZM(0012,1134)")
    assert(uu("POLYGON Z ((0 0 10, 4 0 10, 4 4 10, 0 4 10, 0 0 10))") ==
      "POLYGONZ((0010,4010,4410,0410,0010))")
    assert(uu("MULTIPOINT Z ((0 0 0), (1 1 1))") == "MULTIPOINTZ((000),(111))")
    // overlapping polygons reduce to one, keeping the outer ring's Z
    // (ring start vertex is engine-specific → compare topology + Z)
    val overlap = "st_unaryunion(st_geomfromwkt('MULTIPOLYGON Z (" +
      "((0 0 10, 4 0 10, 4 4 10, 0 4 10, 0 0 10)), " +
      "((1 1 5, 1 2 5, 2 2 5, 2 1 5, 1 1 5)))'))"
    assert(q(s"st_equals($overlap, st_makeenvelope(0,0,4,4))") == true)
    assert(q(s"st_zmin($overlap)") == 10.0 && q(s"st_zmax($overlap)") == 10.0)
    assert(q(s"st_npoints($overlap)") == 5)
    assert(uu("GEOMETRYCOLLECTION Z(POINT Z(1 2 3), LINESTRING Z(0 0 0,1 1 1))") ==
      "GEOMETRYCOLLECTIONZ(POINTZ(123),LINESTRINGZ(000,111))")
  }

  test("ST_Snap table (test_functions.py test_st_snap)") {
    def snap(in: String, ref: String, tol: Double, expected: String): Unit =
      sameGeom(s"st_snap(st_geomfromwkt('$in'), st_geomfromwkt('$ref'), ${tol}D)", expected)
    snap("MULTIPOINT (0.9 0.9, 2.1 2.1, 3.9 3.9)", "LINESTRING (1 1, 2 2, 3 3, 4 4)",
      0.5, "MULTIPOINT (1 1, 2 2, 4 4)")
    snap("POINT (1.1 2.1)", "POINT (1 2)", 0.5, "POINT (1 2)")
    snap("POINT (1.6 2.6)", "POINT (1 2)", 0.5, "POINT (1.6 2.6)")
    snap("LINESTRING (0 0, 10 10)", "POINT (5 5)", 1.0, "LINESTRING (0 0, 5 5, 10 10)")
    snap("POINT (5 5)", "POINT (5 5)", 0.0, "POINT (5 5)")
    snap("POLYGON ((0.9 0.9, 0.9 5.1, 5.1 5.1, 5.1 0.9, 0.9 0.9), " +
      "(1.9 1.9, 1.9 4.1, 4.1 4.1, 4.1 1.9, 1.9 1.9))",
      "POLYGON ((1 1, 1 5, 5 5, 5 1, 1 1), (2 2, 2 4, 4 4, 4 2, 2 2))", 0.5,
      "POLYGON ((1 1, 1 5, 5 5, 5 1, 1 1), (2 2, 2 4, 4 4, 4 2, 2 2))")
    snap("LINESTRING (0.1 0.1, 0.2 0.2, 0.3 0.3, 0.4 0.4, 0.5 0.5, 0.6 0.6, " +
      "0.7 0.7, 0.8 0.8, 0.9 0.9)", "LINESTRING (0 0, 1 1)", 0.5,
      "LINESTRING (0 0, 0.2 0.2, 0.3 0.3, 0.4 0.4, 0.5 0.5, 0.6 0.6, 0.7 0.7, 0.8 0.8, 1 1)")
    snap("POINT (1 2)", "POINT (3 4)", 0.5, "POINT (1 2)")
  }

  test("ST_ZmFlag across dim variants incl. nested collections (test_st_zmflag)") {
    def zm(wkt: String): Any = q(s"st_zmflag(st_geomfromwkt('$wkt'))")
    assert(zm("POINT EMPTY") == 0)
    assert(zm("POINT Z EMPTY") == 2)
    assert(zm("POINT M EMPTY") == 1)
    assert(zm("POINT ZM EMPTY") == 3)
    assert(zm("POINT Z (0 0 0)") == 2)
    assert(zm("POINT M (0 0 0)") == 1)
    assert(zm("POINT ZM (0 0 0 0)") == 3)
    assert(zm("LINESTRING Z (0 0 0, 1 1 1)") == 2)
    assert(zm("MULTIPOINT ((0 0), (1 1))") == 0)
    assert(zm("MULTIPOINT ZM ((0 0 0 0))") == 3)
    assert(zm("GEOMETRYCOLLECTION EMPTY") == 0)
    assert(zm("GEOMETRYCOLLECTION (POINT Z (0 0 0))") == 2)
    assert(zm("GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT Z (0 0 0)))") == 2)
  }

  test("typed EMPTY collections keep Z/M flavor through WKT and WKB " +
      "(test_functions.py:1258,1652)") {
    val cases = Seq(
      "MULTIPOINT Z EMPTY", "MULTIPOINT M EMPTY", "MULTIPOINT ZM EMPTY",
      "MULTILINESTRING Z EMPTY", "MULTIPOLYGON ZM EMPTY",
      "GEOMETRYCOLLECTION Z EMPTY", "GEOMETRYCOLLECTION M EMPTY",
      "GEOMETRYCOLLECTION ZM EMPTY", "MULTIPOLYGON EMPTY")
    cases.foreach { wkt =>
      assert(q(s"st_astext(st_geomfromwkt('$wkt'))") == wkt, s"WKT $wkt")
      assert(q(s"st_astext(st_geomfromwkb(st_asbinary(st_geomfromwkt('$wkt'))))")
        == wkt, s"WKB $wkt")
    }
    // a collection holding an empty CHILD is not a typed empty collection
    assert(q("st_astext(st_geomfromwkt('MULTIPOINT (EMPTY)'))")
      .asInstanceOf[String].contains("EMPTY"))
    assert(q("st_numgeometries(st_geomfromwkt('MULTIPOINT (EMPTY)'))") == 1)
  }

  test("ST_TessellateGeog/Geom split tables (geography/test_tessellate.py)") {
    def tess(fn: String, wkt: String, tol: Double): String =
      // JTS prints 'POINT ZM(..' — normalize to the reference's 'ZM (..'
      q(s"st_astext($fn(st_geomfromwkt('$wkt'), ${tol}D))").asInstanceOf[String]
        .replaceAll("\\b(Z|M|ZM)\\(", "$1 (")
    def wktRound(s: String, p: Int): String =
      // normalize to the reference's wkt_precision=6 comparisons
      "[-0-9.]+".r.replaceAllIn(s, m => {
        val v = BigDecimal(m.matched).setScale(p, BigDecimal.RoundingMode.HALF_EVEN)
        v.underlying.stripTrailingZeros.toPlainString
      })
    // no-split: large tolerance leaves everything untouched (both fns)
    val untouched = Seq(
      "POINT (0 1)", "POINT ZM (0 1 100 200)",
      "LINESTRING (0 1, 1 2, 2 1)",
      "LINESTRING ZM (0 1 10 20, 1 2 30 40, 2 1 50 60)",
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON ZM ((0 0 10 20, 1 0 30 40, 1 1 50 60, 0 1 70 80, 0 0 10 20))",
      "MULTILINESTRING ((0 1, 1 2), (2 3, 3 4))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 3, 3 3, 3 4, 2 4, 2 3)))",
      "GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (0 1, 1 2))",
      "LINESTRING EMPTY", "POLYGON EMPTY", "MULTIPOINT EMPTY",
      "MULTILINESTRING EMPTY", "MULTIPOLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY")
    for (w <- untouched; fn <- Seq("st_tessellategeog", "st_tessellategeom"))
      assert(tess(fn, w, 1e9) == w, s"$fn($w)")
    // geog: chart midpoints at constant latitude
    assert(tess("st_tessellategeog", "LINESTRING (-10 45, 10 45)", 10000.0) ==
      "LINESTRING (-10 45, -5 45, 0 45, 5 45, 10 45)")
    assert(tess("st_tessellategeog", "LINESTRING (-10 45, 10 45)", 1000.0) ==
      "LINESTRING (-10 45, -7.5 45, -5 45, -2.5 45, 0 45, 2.5 45, 5 45, 7.5 45, 10 45)")
    assert(tess("st_tessellategeog", "LINESTRING (-10 45, 10 45, 30 45)", 10000.0) ==
      "LINESTRING (-10 45, -5 45, 0 45, 5 45, 10 45, 15 45, 20 45, 25 45, 30 45)")
    // geog Z/M: great-circle-fraction interpolation against the original edge
    assert(wktRound(tess("st_tessellategeog",
      "LINESTRING Z (-10 45 100, 10 45 200)", 10000.0), 6) ==
      "LINESTRING Z (-10 45 100, -5 45 125.023904, 0 45 150, 5 45 174.976096, 10 45 200)")
    assert(wktRound(tess("st_tessellategeog",
      "LINESTRING M (-10 45 0, 10 45 100)", 10000.0), 6) ==
      "LINESTRING M (-10 45 0, -5 45 25.023904, 0 45 50, 5 45 74.976096, 10 45 100)")
    assert(wktRound(tess("st_tessellategeog",
      "LINESTRING ZM (-10 45 100 0, 10 45 200 100)", 10000.0), 6) ==
      "LINESTRING ZM (-10 45 100 0, -5 45 125.023904 25.023904, 0 45 150 50, " +
        "5 45 174.976096 74.976096, 10 45 200 100)")
    // geom: geodesic midpoints bulge poleward
    assert(wktRound(tess("st_tessellategeom", "LINESTRING (-10 45, 10 45)", 10000.0), 6) ==
      "LINESTRING (-10 45, -5.019332 45.328489, 0 45.438549, 5.019332 45.328489, 10 45)")
    assert(wktRound(tess("st_tessellategeom", "LINESTRING (-10 45, 10 45)", 1000.0), 6) ==
      "LINESTRING (-10 45, -7.51685 45.191313, -5.019332 45.328489, " +
        "-2.51211 45.411007, 0 45.438549, 2.51211 45.411007, 5.019332 45.328489, " +
        "7.51685 45.191313, 10 45)")
    assert(wktRound(tess("st_tessellategeom", "LINESTRING (-10 45, 10 45, 30 45)",
      10000.0), 6) ==
      "LINESTRING (-10 45, -5.019332 45.328489, 0 45.438549, 5.019332 45.328489, " +
        "10 45, 14.980668 45.328489, 20 45.438549, 25.019332 45.328489, 30 45)")
    // invalid tolerance fails loudly
    intercept[Exception](q("st_tessellategeog(st_point(0,1), 0.0D)"))
    intercept[Exception](q("st_tessellategeog(st_point(0,1), -1.0D)"))
  }

  test("ST_Dump paths are 1-based member indexes (test_st_dump)") {
    val rows = spark.sql(
      "SELECT explode(st_dump(st_geomfromwkt('MULTIPOINT (0 1, 1 2)'))) AS d")
      .selectExpr("d.path AS path", "st_astext(d.geom) AS wkt").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Int](0) == Seq(1) && rows(0).getString(1) == "POINT (0 1)")
    assert(rows(1).getSeq[Int](0) == Seq(2) && rows(1).getString(1) == "POINT (1 2)")
    val single = spark.sql(
      "SELECT explode(st_dump(st_geomfromwkt('POINT (1 2)'))) AS d")
      .selectExpr("d.path AS path", "st_astext(d.geom) AS wkt").collect()
    assert(single.length == 1 && single(0).getSeq[Int](0).isEmpty &&
      single(0).getString(1) == "POINT (1 2)")
  }

  test("ST_Envelope_Agg degenerate shapes + nulls (test_aggregate.py)") {
    def envAgg(values: String): Any =
      q(s"(SELECT st_astext(st_envelope_agg(st_geomfromwkt(geom))) FROM (VALUES $values) AS t(geom))")
    assert(envAgg("('POINT (1 2)'), ('POINT (3 4)'), (NULL)") ==
      q("st_astext(st_geomfromwkt('POLYGON ((1 2, 1 4, 3 4, 3 2, 1 2))'))"))
    assert(envAgg("(CAST(NULL AS STRING)), (NULL), (NULL)") == null)
    assert(envAgg("('POINT (5 5)')") == "POINT (5 5)")
    assert(envAgg("('POINT (0 0)'), ('POINT (0 1)'), ('POINT (0 2)')") ==
      "LINESTRING (0 0, 0 2)")
    // zero input rows
    assert(q("(SELECT st_envelope_agg(st_geomfromwkt(geom)) FROM " +
      "(VALUES ('POINT (1 2)')) AS t(geom) WHERE false)") == null)
  }

  test("ST_Collect_Agg type promotion + nulls (test_aggregate.py)") {
    // member ORDER differs by design: our distributed collect sorts
    // members by WKB hash so results are partition-arrival independent
    // (the oracle gate hashes results); compare members as a set
    def collect(values: String): Set[String] = {
      val wkt = q("(SELECT st_astext(st_collect_agg(st_geomfromwkt(geom))) " +
        s"FROM (VALUES $values) AS t(geom))")
      if (wkt == null) return Set.empty
      spark.sql(s"SELECT explode(st_dump(st_geomfromwkt('$wkt'))) AS d")
        .selectExpr("st_astext(d.geom)").collect().map(_.getString(0)).toSet
    }
    def typeOf(values: String): Any =
      q("(SELECT st_geometrytype(st_collect_agg(st_geomfromwkt(geom))) " +
        s"FROM (VALUES $values) AS t(geom))")
    assert(collect("('POINT (1 2)'), ('POINT (3 4)'), (NULL)") ==
      Set("POINT (1 2)", "POINT (3 4)"))
    assert(typeOf("('POINT (1 2)'), ('POINT (3 4)'), (NULL)") == "ST_MultiPoint")
    assert(collect("('LINESTRING (1 2, 3 4)'), ('LINESTRING (5 6, 7 8)'), (NULL)") ==
      Set("LINESTRING (1 2, 3 4)", "LINESTRING (5 6, 7 8)"))
    assert(typeOf("('LINESTRING (1 2, 3 4)'), ('LINESTRING (5 6, 7 8)')") ==
      "ST_MultiLineString")
    assert(typeOf("('POLYGON ((0 0, 1 0, 0 1, 0 0))'), " +
      "('POLYGON ((10 10, 11 10, 10 11, 10 10))')") == "ST_MultiPolygon")
    assert(typeOf("('POINT (1 2)'), ('LINESTRING (3 4, 5 6)')") == "ST_GeometryCollection")
    assert(q("(SELECT st_collect_agg(geom) FROM (VALUES (CAST(NULL AS BINARY)), " +
      "(NULL)) AS t(geom))") == null)
  }

  test("WKT/EWKB roundtrip across every type and dimension (test_wkb.py)") {
    val cases = Seq(
      "POINT (1 2)", "LINESTRING (1 2, 3 4, 5 6)",
      "POLYGON ((0 1, 2 0, 2 3, 0 3, 0 1))", "MULTIPOINT (1 2, 3 4)",
      "MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))",
      "MULTIPOLYGON (((0 1, 2 0, 2 3, 0 3, 0 1)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (3 4, 5 6))",
      "POINT Z (1 2 3)", "LINESTRING Z (1 2 3, 4 5 6)",
      "POLYGON Z ((0 1 2, 3 0 2, 3 4 2, 0 4 2, 0 1 2))",
      "MULTIPOINT Z (1 2 3, 4 5 6)",
      "MULTILINESTRING Z ((1 2 3, 4 5 6), (7 8 9, 10 11 12))",
      "GEOMETRYCOLLECTION Z (POINT Z (1 2 3))",
      "POINT M (1 2 3)", "LINESTRING M (1 2 3, 4 5 6)",
      "MULTIPOINT M (1 2 3, 4 5 6)",
      "POINT ZM (1 2 3 4)", "LINESTRING ZM (1 2 3 4, 5 6 7 8)",
      "MULTIPOINT ZM (1 2 3 4, 5 6 7 8)",
      "POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
      "GEOMETRYCOLLECTION EMPTY")
    for (w <- cases) {
      // text roundtrip is identity (modulo canonical formatting)
      val txt = q(s"st_astext(st_geomfromwkt('$w'))")
      assert(txt == q(s"st_astext(st_geomfromwkt('${txt.toString.replace("'", "")}'))"),
        s"WKT not stable for $w")
      // EWKB roundtrip preserves content and SRID
      val back = q(s"st_astext(st_geomfromewkb(st_asewkb(st_setsrid(st_geomfromwkt('$w'), 4326))))")
      assert(back == txt, s"EWKB roundtrip of $w: $back != $txt")
      assert(q(s"st_srid(st_geomfromewkb(st_asewkb(st_setsrid(st_geomfromwkt('$w'), 4326))))") == 4326,
        s"SRID lost for $w")
    }
    // typed empties keep their declared dimension tag in output text
    assert(q("st_astext(st_geomfromwkt('POINT Z EMPTY'))").toString.startsWith("POINT Z"))
    assert(q("st_astext(st_geomfromwkt('POINT M EMPTY'))").toString.startsWith("POINT M"))
  }

  test("RS_Value/RS_Values point sampling (test_raster_functions.py, test_rs_value.py)") {
    // RS_Example fills band b with the constant b, except the top-left
    // pixel (nodata 127); (74.58, 110.57) is the centroid of pixel
    // (10, 10) and (44.58, 80.57) the centroid of the nodata corner in
    // the raster's OGC:CRS84 space.
    for (b <- 1 to 3)
      assert(q(s"rs_value(rs_example(), st_point(74.58, 110.57, 'OGC:CRS84'), $b)") == b.toDouble)
    assert(q("rs_value(rs_example(), st_point(0.0, 0.0, 'OGC:CRS84'), 1)") == null)
    // POINT EMPTY has no location to sample -> NULL (not an error)
    assert(q("rs_value(rs_example(), st_geomfromtext('POINT EMPTY', 'OGC:CRS84'), 1)") == null)
    def errOf(expr: String): String = {
      val e = intercept[Exception](q(expr))
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    // RS_Example is multiband: omitting the band is ambiguous and errors
    assert(errOf("rs_value(rs_example(), st_point(74.58, 110.57, 'OGC:CRS84'))")
      .contains("specify which band"))

    def vals(expr: String): Seq[Any] =
      q(expr).asInstanceOf[scala.collection.Seq[Any]].toSeq
    assert(vals("rs_values(rs_example(), st_geomfromtext('MULTIPOINT (74.58 110.57, 74.58 110.57, 0 0)', 'OGC:CRS84'), 1)")
      == Seq(1.0, 1.0, null))
    assert(vals("rs_values(rs_example(), st_geomfromtext('MULTIPOINT (74.58 110.57, 44.58 80.57, 0 0)', 'OGC:CRS84'), 2)")
      == Seq(2.0, null, null))
    assert(vals("rs_values(rs_example(), st_geomfromtext('MULTIPOINT (74.58 110.57)', 'OGC:CRS84'), 3)")
      == Seq(3.0))
    // a bare Point is accepted and yields a one-element list
    assert(vals("rs_values(rs_example(), st_point(74.58, 110.57, 'OGC:CRS84'), 1)")
      == Seq(1.0))
    // an empty MultiPoint is an empty list (not NULL)
    assert(vals("rs_values(rs_example(), st_geomfromtext('MULTIPOINT EMPTY', 'OGC:CRS84'), 1)")
      == Seq())
    assert(errOf("rs_values(rs_example(), st_geomfromtext('MULTIPOINT (74.58 110.57)', 'OGC:CRS84'))")
      .contains("specify which band"))

    // test_rs_value.py sampling rules on a CRS-less north-up raster:
    // origin (100, 500), 2-wide by 3-tall pixels, 7x6, nodata -12345.5
    // planted at pixel (row 2, col 3); value(row, col) = row*10 + col.
    val vs = (for (r <- 0 until 6; c <- 0 until 7)
      yield if ((r, c) == (2, 3)) "-12345.5D" else s"${r * 10.0 + c}D").mkString(", ")
    val rast = "rs_setbandnodatavalue(rs_makeraster(7, 6, 100.0, 500.0, " +
      s"2.0, -3.0, array($vs)), -12345.5)"
    def sample(x: Double, y: Double): Any =
      q(s"rs_value($rast, st_point($x, $y), 1)")
    assert(sample(101.0, 498.5) == 0.0) // pixel (0,0) center
    assert(sample(113.0, 483.5) == 56.0) // pixel (5,6) center
    assert(sample(107.0, 492.5) == null) // the planted nodata pixel (2,3)
    assert(sample(103.7, 490.1) == 31.0) // off-center interior -> (3, 1)
    assert(sample(100.4, 482.3) == 50.0) // bottom-left pixel, near corner
    // floor vs truncate: just west/north of the extent must be NULL
    // (floor -> index -1), not clamp/truncate to edge pixel 0
    assert(sample(99.9, 490.0) == null)
    assert(sample(105.0, 500.2) == null)
    assert(sample(999.0, 999.0) == null)
    // the band-less arity works on this single-band raster
    assert(q(s"rs_value($rast, st_point(101.0, 498.5))") == 0.0)
    assert(vals(s"rs_values($rast, st_geomfromtext('MULTIPOINT (101 498.5, 99.9 490, 107 492.5)'))")
      == Seq(0.0, null, null))
    // non-finite coordinates sample as NULL, not pixel 0
    assert(q(s"rs_value($rast, st_point(cast('NaN' as double), 490.0), 1)") == null)
    // one-sided CRS errors rather than silently mislocating the point
    assert(errOf(s"rs_value($rast, st_point(101.0, 498.5, 'OGC:CRS84'), 1)")
      .contains("geometry has a CRS but the raster does not"))
    assert(errOf("rs_value(rs_example(), st_point(74.58, 110.57), 1)")
      .contains("raster has a CRS but the geometry does not"))
  }

  test("RS_PixelAs* 1-based pixels, skew-safe, extrapolating (test_rs_pixelas.py)") {
    // north-up (100, 2, 0, 500, 0, -3) and skewed (100, 2, 0.5, 500,
    // 0.25, -3) geotransforms over a 7x6 grid; 1-based pixel (col, row).
    val vals = (1 to 42).map(_ => "0.0D").mkString(", ")
    val northUp = s"rs_makeraster(7, 6, 100.0, 500.0, 2.0, -3.0, array($vals))"
    val skewed = s"rs_setgeoreference($northUp, '2.0 0.25 0.5 -3.0 100.0 500.0')"
    def wkt(expr: String): String = q(s"st_astext($expr)").asInstanceOf[String]

    // smoke rows from test_rs_pixelas_sql_text_smoke: pixel (2, 3) of the
    // north-up grid — UL corner (102, 494), centroid (103, 492.5),
    // parallelogram ring UL, UR, LR, LL closed
    assert(wkt(s"rs_pixelaspoint($northUp, 2, 3)") == "POINT (102 494)")
    assert(wkt(s"rs_pixelascentroid($northUp, 2, 3)") == "POINT (103 492.5)")
    assert(wkt(s"rs_pixelaspolygon($northUp, 2, 3)") ==
      "POLYGON ((102 494, 104 494, 104 491, 102 491, 102 494))")

    // the affine-math reference under skew: pixel (2, 3) -> 0-based
    // (1, 2): x = 100 + 1*2 + 2*0.5 = 103, y = 500 + 1*0.25 + 2*-3 = 494.25
    assert(wkt(s"rs_pixelaspoint($skewed, 2, 3)") == "POINT (103 494.25)")
    // centroid at (1.5, 2.5): x = 100 + 3 + 1.25 = 104.25,
    // y = 500 + 0.375 - 7.5 = 492.875
    assert(wkt(s"rs_pixelascentroid($skewed, 2, 3)") == "POINT (104.25 492.875)")
    // the skewed pixel is a parallelogram, not its bounding envelope
    assert(wkt(s"rs_pixelaspolygon($skewed, 2, 3)") ==
      "POLYGON ((103 494.25, 105 494.5, 105.5 491.5, 103.5 491.25, 103 494.25))")

    // (1, 1) is the raster origin; out-of-bounds pixels extrapolate
    assert(wkt(s"rs_pixelaspoint($northUp, 1, 1)") == "POINT (100 500)")
    assert(wkt(s"rs_pixelaspoint($northUp, 9, 8)") == "POINT (116 479)")

    // world->raster truncates toward zero through the inverse affine
    // (affine_transformation.rs `as i64`), 0-based
    assert(q(s"rs_worldtorastercoordx($northUp, 105.0, 490.0)") == 2L)
    assert(q(s"rs_worldtorastercoordy($northUp, 105.0, 490.0)") == 3L)
    assert(wkt(s"rs_worldtorastercoord($northUp, 105.0, 490.0)") == "POINT (2 3)")
    // a singular geotransform errors rather than returning garbage
    val e = intercept[Exception](
      q(s"rs_worldtorastercoordx(rs_setgeoreference($northUp, '0.0 0.0 0.0 0.0 100.0 500.0'), 105.0, 490.0)"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ").contains("determinant is zero"))
  }

  test("RS_ZonalStats ladder, lenient gate, NaN/inf semantics (test_rs_zonalstats.py)") {
    // 6x7 north-up raster, origin (100, 500), 2x3 pixels; v(r,c) = r*10+c
    // with nodata -9999 planted at (1,1) and (2,2) and a repeated 66 at
    // (1,2), (2,3), (3,1) so the mode is unambiguous.
    def cell(r: Int, c: Int): String =
      if ((r, c) == (1, 1) || (r, c) == (2, 2)) "-9999.0D"
      else if (Set((1, 2), (2, 3), (3, 1))((r, c))) "66.0D"
      else s"${r * 10.0 + c}D"
    val vs = (for (r <- 0 until 6; c <- 0 until 7) yield cell(r, c)).mkString(", ")
    val rast = "rs_setbandnodatavalue(rs_makeraster(7, 6, 100.0, 500.0, " +
      s"2.0, -3.0, array($vs)), -9999.0)"
    val rect = "st_geomfromwkt('POLYGON ((102.6 495.8, 109.3 495.8, 109.3 485.9, 102.6 485.9, 102.6 495.8))')"
    // the rect selects pixel centers rows 1-4 x cols 1-4; minus the two
    // nodata pixels: [66,13,14,21,66,24,66,32,33,34,41,42,43,44]
    val sel = Seq(66.0, 13, 14, 21, 66, 24, 66, 32, 33, 34, 41, 42, 43, 44)
    val mean = sel.sum / sel.length
    val sampleVar = sel.map(v => (v - mean) * (v - mean)).sum / (sel.length - 1)
    def zs(stat: String, rest: String = ""): Any =
      q(s"rs_zonalstats($rast, $rect, 1, '$stat'$rest)")
    assert(zs("count") == 14.0)
    assert(zs("sum") == 539.0)
    assert(zs("mean") == mean && zs("avg") == mean && zs("average") == mean)
    assert(zs("median") == 37.5)
    assert(zs("mode") == 66.0)
    assert(zs("min") == 13.0 && zs("max") == 66.0)
    assert(zs("variance") == sampleVar)
    assert(zs("stddev") == math.sqrt(sampleVar) && zs("sd") == math.sqrt(sampleVar))
    // disabling exclude_no_data keeps the two -9999 pixels
    assert(zs("count", ", false, false") == 16.0)
    // the All struct: count is Int64, the rest Float64
    assert(q(s"rs_zonalstatsall($rast, $rect, 1).count") == 14L)
    assert(q(s"rs_zonalstatsall($rast, $rect, 1).mode") == 66.0)
    assert(q(s"rs_zonalstatsall($rast, $rect, 1).variance") == sampleVar)

    // a sliver crossing a pixel boundary but covering no pixel center:
    // count 0 (real tally), other stats NULL; all_touched picks pixels up
    val sliver = "st_geomfromwkt('POLYGON ((103.6 499, 104.4 499, 104.4 483, 103.6 483, 103.6 499))')"
    assert(q(s"rs_zonalstats($rast, $sliver, 1, 'count')") == 0.0)
    assert(q(s"rs_zonalstats($rast, $sliver, 1, 'sum')") == null)
    assert(q(s"rs_zonalstats($rast, $sliver, 1, 'count', true)").asInstanceOf[Double] > 0.0)

    // non-intersecting roi: NULL when lenient (default), error when not —
    // including a roi whose bbox overlaps but whose geometry is disjoint
    def errOf(expr: String): String = {
      val e = intercept[Exception](q(expr))
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    val disjoint = "st_geomfromwkt('POLYGON ((900 900, 910 900, 910 890, 900 890, 900 900))')"
    val bboxOnly = "st_geomfromwkt('POLYGON ((124 490, 124 510, 108 510, 124 490))')"
    for (roi <- Seq(disjoint, bboxOnly)) {
      assert(q(s"rs_zonalstats($rast, $roi, 1, 'count')") == null)
      assert(q(s"rs_zonalstatsall($rast, $roi, 1)") == null)
      assert(errOf(s"rs_zonalstats($rast, $roi, 1, 'count', false, true, false)")
        .contains("does not intersect"))
    }

    // a NaN pixel that is NOT the nodata sentinel poisons every statistic
    // except count (numpy semantics)
    val nanVs = (for (r <- 0 until 6; c <- 0 until 7)
      yield if ((r, c) == (2, 2)) "cast('NaN' as double)" else s"${r * 10.0 + c}D")
      .mkString(", ")
    val nanRast = "rs_setbandnodatavalue(rs_makeraster(7, 6, 100.0, 500.0, " +
      s"2.0, -3.0, array($nanVs)), -9999.0)"
    assert(q(s"rs_zonalstats($nanRast, $rect, 1, 'count')") == 16.0)
    assert(q(s"rs_zonalstats($nanRast, $rect, 1, 'min')").asInstanceOf[Double].isNaN)
    assert(q(s"rs_zonalstats($nanRast, $rect, 1, 'mode')").asInstanceOf[Double].isNaN)
    assert(q(s"rs_zonalstatsall($nanRast, $rect, 1).median").asInstanceOf[Double].isNaN)

    // a +inf pixel flows through: sum/mean/max/mode inf, min/median
    // finite, variance/stddev NaN (inf - inf)
    val infVs = (for (r <- 0 until 6; c <- 0 until 7)
      yield if ((r, c) == (2, 2)) "cast('Infinity' as double)" else s"${r * 10.0 + c}D")
      .mkString(", ")
    val infRast = s"rs_makeraster(7, 6, 100.0, 500.0, 2.0, -3.0, array($infVs))"
    assert(q(s"rs_zonalstats($infRast, $rect, 1, 'sum')") == Double.PositiveInfinity)
    assert(q(s"rs_zonalstats($infRast, $rect, 1, 'max')") == Double.PositiveInfinity)
    assert(q(s"rs_zonalstats($infRast, $rect, 1, 'mode')") == Double.PositiveInfinity)
    assert(q(s"rs_zonalstats($infRast, $rect, 1, 'min')") == 11.0)
    assert(q(s"rs_zonalstats($infRast, $rect, 1, 'variance')").asInstanceOf[Double].isNaN)
    assert(q(s"rs_zonalstats($infRast, $rect, 1, 'stddev')").asInstanceOf[Double].isNaN)

    // unknown statistics error; band-less overloads error on multiband
    assert(errOf(s"rs_zonalstats($rast, $rect, 1, 'nonsense')")
      .contains("unknown statistic"))
    val two = "rs_makeraster(2, 2, 0.0, 0.0, 1.0, -1.0, array(1d,2d,3d,4d,5d,6d,7d,8d), 2)"
    val zone22 = "st_makeenvelope(0.0, -2.0, 2.0, 0.0)"
    assert(errOf(s"rs_zonalstats($two, $zone22, 'count')").contains("2 bands"))
    assert(errOf(s"rs_zonalstatsall($two, $zone22)").contains("2 bands"))
    // naming the band resolves it; the 3-arg string form works single-band
    assert(q(s"rs_zonalstats($two, $zone22, 1, 'count')") == 4.0)
    assert(q(s"rs_zonalstats(rs_makeraster(2, 2, 0.0, 0.0, 1.0, -1.0, " +
      "array(1d,2d,3d,4d)), st_makeenvelope(0.0, -2.0, 2.0, 0.0), 'sum')") == 10.0)
  }

  test("RS_Tile grid positions, band selection, pad rules (test_rs_tile.py)") {
    // RS_Example is 64x32: 32x16 tiles -> 2x2 grid at (0,0),(1,0),(0,1),(1,1)
    def positions(expr: String): Seq[(Int, Int)] =
      q(expr).asInstanceOf[scala.collection.Seq[Any]].toSeq.map { t =>
        val r = t.asInstanceOf[org.apache.spark.sql.Row]
        (r.getInt(0), r.getInt(1))
      }
    assert(positions("rs_tile(rs_example(), 32, 16)") ==
      Seq((0, 0), (1, 0), (0, 1), (1, 1)))
    // padding 40x20 tiles still yields the 2x2 grid (edges padded, not shrunk)
    assert(positions("rs_tile(rs_example(), 40, 20, true, 0.0)") ==
      Seq((0, 0), (1, 0), (0, 1), (1, 1)))
    assert(q("rs_width(rs_tile(rs_example(), 40, 20, true, 0.0)[3].tile)") == 40)
    // without padding the edge tiles keep their partial size
    assert(q("rs_width(rs_tile(rs_example(), 40, 20)[3].tile)") == 24)
    // the bandIndices overload keeps only the named 1-based bands
    assert(q("rs_numbands(rs_tile(rs_example(), array(1, 3), 32, 16)[0].tile)") == 2)
    assert(q("rs_value(rs_tile(rs_example(), array(3, 1), 32, 16)[0].tile, 1, 5, 5)") == 3.0)
    assert(positions("rs_tile(rs_example(), array(1, 3), 32, 16)") ==
      Seq((0, 0), (1, 0), (0, 1), (1, 1)))
    // a noDataVal with pad_with_nodata = false errors rather than being
    // silently ignored (SedonaDB's documented divergence from Sedona Spark)
    val e = intercept[Exception](q("rs_tile(rs_example(), 4, 4, false, 0.0)"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ").contains("only meaningful with pad_with_nodata"))
  }

  test("RS_Clip lenient gate, nodata sentinel, dtype validation (test_rs_clip.py)") {
    def errOf(expr: String): String = {
      val e = intercept[Exception](q(expr))
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    // 6x7 f64 raster, origin (100, 500), 2x3 pixels, v(r,c) = r*10+c
    val vs = (for (r <- 0 until 6; c <- 0 until 7) yield s"${r * 10.0 + c}D").mkString(", ")
    val rast = s"rs_makeraster(7, 6, 100.0, 500.0, 2.0, -3.0, array($vs))"
    val sliver = "st_geomfromwkt('POLYGON ((103.6 499, 104.4 499, 104.4 483, 103.6 483, 103.6 499))')"
    val disjoint = "st_geomfromwkt('POLYGON ((900 900, 910 900, 910 890, 900 890, 900 900))')"
    val rect = "st_geomfromwkt('POLYGON ((102.6 495.8, 109.3 495.8, 109.3 485.9, 102.6 485.9, 102.6 495.8))')"

    // an empty mask is NULL by default (lenient), whether the geometry is
    // a center-missing sliver or fully disjoint; all_touched rescues it
    assert(q(s"rs_clip($rast, 1, $sliver)") == null)
    assert(q(s"rs_clip($rast, 1, $disjoint)") == null)
    assert(q(s"rs_width(rs_clip($rast, 1, $sliver, true))") == 2)
    // strict (lenient=false) distinguishes the two empty cases
    assert(errOf(s"rs_clip($rast, 1, $disjoint, false, -9999.0, true, false)")
      .contains("do not intersect"))
    assert(errOf(s"rs_clip($rast, 1, $sliver, false, -9999.0, true, false)")
      .contains("selects no pixels"))
    // band out of range errors regardless of leniency
    assert(errOf(s"rs_clip($rast, 4, $rect)").contains("out of range"))

    // no explicit nodata and no band nodata: masked pixels get the
    // declared dtype minimum (f64 here) and the output band records it
    val tri = "st_geomfromwkt('POLYGON ((101.3 498.6, 112.4 496.9, 104.2 483.7, 101.3 498.6))')"
    assert(q(s"rs_bandnodatavalue(rs_clip($rast, 1, $tri), 1)") == -Double.MaxValue)
    // a band nodata is inherited as the default fill
    assert(q(s"rs_bandnodatavalue(rs_clip(rs_setbandnodatavalue($rast, -77.0), 1, $tri), 1)") == -77.0)
    // an explicit nodata must be representable in the declared dtype:
    // RS_Example's bands are UNSIGNED_8BITS, so -5 is rejected
    assert(errOf("rs_clip(rs_example(), 1, st_makeenvelope(50.0, 85.0, 80.0, 110.0), false, -5.0)")
      .contains("not a valid UInt8 value"))
    assert(q("rs_numbands(rs_clip(rs_example(), 1, st_makeenvelope(50.0, 85.0, 80.0, 110.0), false, 250.0))") == 1)
  }

  test("RS_Resample scale-mode extent growth + argument errors (test_rs_resample.py)") {
    def errOf(expr: String): String = {
      val e = intercept[Exception](q(expr))
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    // 4x3 raster of 2x2 pixels (extent 8x6), v(r,c) = r*10+c, nodata -99
    val vs = (for (r <- 0 until 3; c <- 0 until 4) yield s"${r * 10.0 + c}D").mkString(", ")
    val rast = "rs_setbandnodatavalue(rs_makeraster(4, 3, 100.0, 500.0, " +
      s"2.0, -2.0, array($vs)), -99.0)"
    // pixel size 1: ceil(8/1) x ceil(6/1) = 8x6 — same grid as the
    // explicit dimension mode
    assert(q(s"rs_width(rs_resample($rast, 1.0, -1.0, true, 'NearestNeighbor'))") == 8)
    assert(q(s"rs_height(rs_resample($rast, 1.0, -1.0, true, 'NearestNeighbor'))") == 6)
    // pixel size 5 keeps the scale exact and grows the extent to whole
    // pixels: ceil(8/5)=2 x ceil(6/5)=2 spanning 10x10; the grown
    // right/bottom border reads back as the band nodata
    val grown = s"rs_resample($rast, 5.0, -5.0, true, 'NearestNeighbor')"
    assert(q(s"rs_width($grown)") == 2 && q(s"rs_height($grown)") == 2)
    assert(q(s"rs_scalex($grown)") == 5.0 && q(s"rs_scaley($grown)") == -5.0)
    // out pixel (1,1) center (107.5, 492.5) is past the source's y extent
    // (494): the grown border fills with the band nodata -> NULL sample
    assert(q(s"rs_value($grown, 1, 1, 1)") == null)
    // out pixel (1, 0) center (107.5, 497.5) -> src (3, 1) = 13
    assert(q(s"rs_value($grown, 1, 1, 0)") == 13.0)
    // the reference-raster overload takes grid and origin from the ref,
    // which must share the CRS — RS_Resample never reprojects
    assert(errOf(s"rs_resample(rs_setcrs($rast, 'EPSG:4326'), " +
      "rs_setcrs(rs_makeraster(8, 6, 100.0, 500.0, 1.0, -1.0, " +
      s"array(${Seq.fill(48)("0.0D").mkString(", ")})), 'EPSG:3857'), false, 'NearestNeighbor')")
      .contains("does not reproject"))
    // argument errors pin the reference's messages
    assert(errOf(s"rs_resample($rast, 3.5, 6.0, false, 'NearestNeighbor')")
      .contains("whole number"))
    assert(errOf(s"rs_resample($rast, 0.0, 6.0, false, 'NearestNeighbor')")
      .contains("positive"))
    assert(errOf(s"rs_resample($rast, 0.0, -1.0, true, 'NearestNeighbor')")
      .contains("non-zero"))
    assert(errOf(s"rs_resample($rast, 8.0, 6.0, false, 'sinc')")
      .contains("unknown algorithm"))
  }

  test("RS_AsRaster grids, options, dtypes (test_rs_asraster.py)") {
    // The reference compares RS_AsRaster with rasterio.features.rasterize
    // on a 7x6 uint8 grid: origin (100, 500), 2-wide by 3-tall north-up
    // pixels (GDAL_TRANSFORM/GEOM_RECT/GEOM_TRIANGLE in the test module).
    // Expected pixel sets below are the rasterize results derived by hand
    // for those deterministic cases (centroid parity + boundary walk).
    val ref = "rs_makeraster(7, 6, 100.0, 500.0, 2.0, -3.0, " +
      "array_repeat(cast(0.0 as double), 42))"
    val rect = "st_geomfromwkt('POLYGON ((102.6 495.8, 109.3 495.8, " +
      "109.3 485.9, 102.6 485.9, 102.6 495.8))')"
    val tri = "st_geomfromwkt('POLYGON ((101.3 498.6, 112.4 496.9, " +
      "104.2 483.7, 101.3 498.6))')"
    def vals(r: String, w: Int, h: Int): IndexedSeq[IndexedSeq[Any]] = {
      val cells = (0 until h).map(row => (0 until w).map(c =>
        s"rs_value($r, 1, $c, $row)").mkString("array(", ", ", ")"))
      val got = spark.sql(s"SELECT ${cells.mkString("array(", ", ", ")")} AS g")
        .collect()(0).getSeq[scala.collection.Seq[Any]](0)
      got.map(_.toIndexedSeq).toIndexedSeq
    }

    // rect-centroid-cropped: envelope snapped out -> 4x4 window at
    // (102, 497); the rect covers every pixel center in it.
    val a = s"rs_asraster($rect, $ref, 'b', false, 7.0, 0.0)"
    assert(q(s"rs_width($a)") == 4 && q(s"rs_height($a)") == 4)
    assert(q(s"rs_upperleftx($a)") == 102.0 && q(s"rs_upperlefty($a)") == 497.0)
    assert(q(s"rs_bandpixeltype($a, 1)") == "UNSIGNED_8BITS")
    assert(vals(a, 4, 4).flatten.forall(_ == 7.0))

    // rect-centroid-full-nodata9: full reference grid, fill 9, burn rows
    // 1-4 x cols 1-4 (the centers inside the rect).
    val b = s"rs_asraster($rect, $ref, 'b', false, 7.0, 9.0, false)"
    assert(q(s"rs_width($b)") == 7 && q(s"rs_height($b)") == 6)
    assert(q(s"rs_upperleftx($b)") == 100.0 && q(s"rs_upperlefty($b)") == 500.0)
    val bg = vals(b, 7, 6)
    for (row <- 0 until 6; c <- 0 until 7) {
      // fill pixels hold 9 == band nodata, which rs_value masks to null
      val want = if (row >= 1 && row <= 4 && c >= 1 && c <= 4) 7.0 else null
      assert(bg(row)(c) == want, s"full rect ($c,$row): ${bg(row)(c)} want $want")
    }

    // triangle-centroid-cropped: the snapped envelope IS the full grid;
    // centers inside the triangle by row: 1..5, 1..4, 2..3, 2 (rows 1-4).
    val c = s"rs_asraster($tri, $ref, 'b', false, 7.0, 9.0)"
    assert(q(s"rs_width($c)") == 7 && q(s"rs_height($c)") == 6)
    val centroidRows = Map(1 -> (1 to 5), 2 -> (1 to 4), 3 -> (2 to 3), 4 -> (2 to 2))
    val cg = vals(c, 7, 6)
    for (row <- 0 until 6; col <- 0 until 7) {
      val want = if (centroidRows.get(row).exists(_.contains(col))) 7.0 else null
      assert(cg(row)(col) == want, s"tri centroid ($col,$row): ${cg(row)(col)} want $want")
    }

    // triangle-touched-cropped-nodata9: centroid set plus every cell the
    // boundary passes through — cols 0-5 / 0-6 / 1-5 / 1-4 / 1-3 / 1-2.
    val t = s"rs_asraster($tri, $ref, 'b', true, 7.0, 9.0)"
    val touchedRows = Map(0 -> (0 to 5), 1 -> (0 to 6), 2 -> (1 to 5),
      3 -> (1 to 4), 4 -> (1 to 3), 5 -> (1 to 2))
    val tg = vals(t, 7, 6)
    for (row <- 0 until 6; col <- 0 until 7) {
      val want = if (touchedRows.get(row).exists(_.contains(col))) 7.0 else null
      assert(tg(row)(col) == want, s"tri touched ($col,$row): ${tg(row)(col)} want $want")
    }

    // every dtype both dialects support burns exactly and tags the band
    for ((tok, name) <- Seq("uint8" -> "UNSIGNED_8BITS", "uint16" -> "UNSIGNED_16BITS",
        "int16" -> "SIGNED_16BITS", "int32" -> "SIGNED_32BITS",
        "float32" -> "REAL_32BITS", "float64" -> "REAL_64BITS")) {
      val r = s"rs_asraster($rect, $ref, '$tok', false, 7.0, 0.0)"
      assert(q(s"rs_bandpixeltype($r, 1)") == name, tok)
      assert(q(s"rs_value($r, 1, 0, 0)") == 7.0, tok)
    }

    // without nodata: burn into zeros, band has no nodata value
    val nn = s"rs_asraster($rect, $ref, 'b', false, 7.0)"
    assert(q(s"rs_bandnodatavalue($nn, 1)") == null)
    assert(q(s"rs_value($nn, 1, 0, 0)") == 7.0)
    // a NULL nodata argument means "no nodata", not a NULL result
    val nl = s"rs_asraster($rect, $ref, 'b', false, 7.0, cast(null as double))"
    assert(q(s"rs_bandnodatavalue($nl, 1)") == null)
    assert(q(s"rs_value($nl, 1, 0, 0)") == 7.0)

    // argument errors mirror the reference's messages
    def err(expr: String): String =
      intercept[Exception](q(expr)).getMessage
    assert(err(s"rs_asraster($rect, $ref, 'q')").contains("Unsupported pixelType: q"))
    assert(err(s"rs_asraster($rect, rs_setgeoreference(" +
      "rs_makeraster(2, 2, 0.0, 0.0, 1.0, -1.0, array(0d,0d,0d,0d)), " +
      "'1.0 0.5 0.5 -1.0 0.0 0.0'), 'b')")
      .contains("skew_x=0 and skew_y=0"))
    // south-up reference grid: the row window formulas produce an empty
    // extent (rows measured from MaxY with the raster's scale_y sign)
    assert(err(s"rs_asraster($rect, " +
      "rs_makeraster(7, 6, 100.0, 482.0, 2.0, 3.0, array_repeat(cast(0.0 as double), 42)), 'b')")
      .contains("Geometry extent produced an empty raster"))
    assert(err(s"rs_asraster($rect, $ref, 'b', false, 7.0, 9.5)")
      .contains("must be an integer for UInt8: 9.5"))
    assert(err(s"rs_asraster($rect, $ref, 'b', false, 7.0, 300.0)")
      .contains("out of range for UInt8: 300"))
  }

  test("RS_ReprojectMatch warp semantics (test_rs_reprojectmatch.py)") {
    // same-CRS 2x nearest upsample: 4x3 input of 2x2 pixels onto an 8x6
    // 1x1 reference grid with the same extent replicates each source
    // pixel into a 2x2 block (bit-exact in the reference suite)
    val in43 = "rs_makeraster(4, 3, 100.0, 500.0, 2.0, -2.0, " +
      "array(1d,2d,3d,4d, 5d,6d,7d,8d, 9d,10d,11d,12d))"
    val ref86 = "rs_makeraster(8, 6, 100.0, 500.0, 1.0, -1.0, " +
      "array_repeat(cast(0.0 as double), 48))"
    val up = s"rs_reprojectmatch($in43, $ref86)"
    assert(q(s"rs_width($up)") == 8 && q(s"rs_height($up)") == 6)
    assert(q(s"rs_scalex($up)") == 1.0 && q(s"rs_scaley($up)") == -1.0)
    for (row <- 0 until 6; c <- 0 until 8) {
      val want = (row / 2) * 4 + (c / 2) + 1.0
      assert(q(s"rs_value($up, 1, $c, $row)") == want, s"($c,$row)")
    }

    // uncovered reference cells fill with the input band nodata: 3x3
    // input extent [0,6]x[0,6], reference 5x5 of 2x2 overhangs right and
    // bottom -> cols/rows 3..4 read as nodata-masked nulls
    val in33 = "rs_setbandnodatavalue(rs_makeraster(3, 3, 0.0, 6.0, 2.0, -2.0, " +
      "array(1d,2d,3d, 4d,5d,6d, 7d,8d,9d)), 1, 200.0)"
    val ref55 = "rs_makeraster(5, 5, 0.0, 6.0, 2.0, -2.0, " +
      "array_repeat(cast(0.0 as double), 25))"
    val un = s"rs_reprojectmatch($in33, $ref55)"
    assert(q(s"rs_bandnodatavalue($un, 1)") == 200.0)
    for (row <- 0 until 5; c <- 0 until 5) {
      val want: Any =
        if (row <= 2 && c <= 2) row * 3 + c + 1.0
        else null // 200 == band nodata, masked by rs_value
      assert(q(s"rs_value($un, 1, $c, $row)") == want, s"($c,$row)")
    }

    // bilinear 2x downsample: every output center sits exactly between
    // four source pixels -> their plain average (vals = row*8+col)
    val vals64 = (0 until 64).map(i => s"${i}d").mkString("array(", ",", ")")
    val in88 = s"rs_makeraster(8, 8, 100.0, 508.0, 1.0, -1.0, $vals64)"
    val ref44 = "rs_makeraster(4, 4, 100.0, 508.0, 2.0, -2.0, " +
      "array_repeat(cast(0.0 as double), 16))"
    val bi = s"rs_reprojectmatch($in88, $ref44, 'Bilinear')"
    for (row <- 0 until 4; c <- 0 until 4)
      assert(q(s"rs_value($bi, 1, $c, $row)") == 16.0 * row + 2 * c + 4.5, s"($c,$row)")

    // cross-CRS: 2x2 1-degree EPSG:4326 input onto a web-mercator
    // reference covering the same lon/lat box — nearest selection
    // through the inverse Mercator lands each center in its own cell
    val geo = "rs_setcrs(rs_makeraster(2, 2, 0.0, 2.0, 1.0, -1.0, " +
      "array(1d,2d,3d,4d)), 'EPSG:4326')"
    val refMerc = "rs_setcrs(rs_makeraster(2, 2, 0.0, 222638.9816, " +
      "111319.4908, -111319.4908, array_repeat(cast(0.0 as double), 4)), 'EPSG:3857')"
    val cc = s"rs_reprojectmatch($geo, $refMerc)"
    assert(q(s"rs_crs($cc)") == "EPSG:3857")
    assert(q(s"rs_value($cc, 1, 0, 0)") == 1.0 && q(s"rs_value($cc, 1, 1, 0)") == 2.0)
    assert(q(s"rs_value($cc, 1, 0, 1)") == 3.0 && q(s"rs_value($cc, 1, 1, 1)") == 4.0)

    // Int64/UInt64 rasters are rejected up front for any algorithm
    val rect64 = "st_geomfromwkt('POLYGON ((102.6 495.8, 109.3 495.8, " +
      "109.3 485.9, 102.6 485.9, 102.6 495.8))')"
    val base = "rs_makeraster(7, 6, 100.0, 500.0, 2.0, -3.0, " +
      "array_repeat(cast(0.0 as double), 42))"
    val i64r = s"rs_asraster($rect64, $base, 'i64', false, 7.0, 0.0)"
    for (alg <- Seq("NearestNeighbor", "Bilinear")) {
      val m = intercept[Exception](
        q(s"rs_reprojectmatch($i64r, $base, '$alg')")).getMessage
      assert(m.contains("does not support Int64/UInt64 rasters"), alg)
    }
    // RS_Resample shares the check on its float-routed paths, but the
    // plain dimension nearest path is a pure value selection and keeps it
    val m2 = intercept[Exception](
      q(s"rs_resample($i64r, 2.0, 2.0, true, 'nearestneighbor')")).getMessage
    assert(m2.contains("does not support Int64/UInt64 rasters"))
    assert(q(s"rs_value(rs_resample($i64r, 8.0, 8.0, false, 'nearestneighbor'), 1, 0, 0)") == 7.0)
  }

  test("N-D raster surface: slice/dim errors and edges (test_raster_nd.py)") {
    // r3d: [time=3, y=4, x=5], sequential values 0..59 (from_numpy fixture)
    val vals = (0 until 60).map(i => s"${i}d").mkString("array(", ",", ")")
    val r3d = "rs_bandtodim(rs_makeraster(5, 4, 0.0, 4.0, 1.0, -1.0, " +
      s"$vals, 3), 'time')"
    val r2d = "rs_makeraster(5, 4, 0.0, 4.0, 1.0, -1.0, " +
      (0 until 20).map(i => s"${i}d").mkString("array(", ",", ")") + ")"

    assert(q(s"rs_numdimensions($r2d)") == 2)
    assert(q(s"rs_numdimensions($r3d)") == 3)
    assert(q(s"rs_numdimensions($r3d, 1)") == 3)
    // a null or out-of-range band yields NULL, not band-1 defaulting
    assert(q(s"rs_numdimensions($r3d, cast(null as int))") == null)
    assert(q(s"rs_numdimensions($r3d, 99)") == null)
    assert(q(s"rs_dimnames($r2d)") == Seq("y", "x"))
    assert(q(s"rs_dimnames($r3d)") == Seq("time", "y", "x"))
    assert(q(s"rs_dimsize($r2d, 'x')") == 5)
    assert(q(s"rs_dimsize($r3d, 'time')") == 3)
    assert(q(s"rs_dimsize($r3d, 'time', 1)") == 3)
    assert(q(s"rs_dimsize($r2d, 'nonexistent')") == null)
    assert(q(s"rs_shape($r2d)") == Seq(4L, 5L))
    assert(q(s"rs_shape($r3d)") == Seq(3L, 4L, 5L))

    // slice drops the axis; values equal arr[1] (20..39 at y,x)
    assert(q(s"rs_shape(rs_slice($r3d, 'time', 1))") == Seq(4L, 5L))
    assert(q(s"rs_value(rs_slice($r3d, 'time', 1), 1, 2, 1)") == 27.0)
    // range keeps the axis narrowed to [0, 2)
    assert(q(s"rs_shape(rs_slicerange($r3d, 'time', 0, 2))") == Seq(2L, 4L, 5L))

    def err(expr: String): String = intercept[Exception](q(expr)).getMessage
    assert(err(s"rs_slice($r3d, 'x', 0)").contains("cannot slice spatial dimension"))
    assert(err(s"rs_slice($r3d, 'y', 0)").contains("cannot slice spatial dimension"))
    assert(err(s"rs_slice($r3d, 'time', 3)").contains("out of range"))
    assert(err(s"rs_slice($r3d, 'time', -1)").contains("index must be non-negative"))
    assert(err(s"rs_slicerange($r3d, 'time', -1, 2)").contains("start must be non-negative"))
    assert(err(s"rs_slice($r3d, 'nope', 0)").contains("no band has dimension 'nope'"))

    // DimToBand expands time into 3 bands of [y,x]; spatial/unknown error
    assert(q(s"rs_numbands(rs_dimtoband($r3d, 'time'))") == 3)
    assert(q(s"rs_value(rs_dimtoband($r3d, 'time'), 2, 2, 1)") == 27.0)
    assert(err(s"rs_dimtoband($r3d, 'x')").contains("cannot expand spatial dimension"))
    assert(err(s"rs_dimtoband($r2d, 'nope')").contains("no band has dimension 'nope'"))
    // round trip restores the single 3-D band
    assert(q(s"rs_shape(rs_bandtodim(rs_dimtoband($r3d, 'time'), 'time'))") ==
      Seq(3L, 4L, 5L))
    assert(q(s"rs_numbands(rs_bandtodim(rs_dimtoband($r3d, 'time'), 'time'))") == 1)
  }

  test("RS_AsGeoTiff lossless codec roundtrips (test_rs_asgeotiff.py)") {
    // load -> encode -> decode must preserve pixels, transform, nodata and
    // band type for every lossless codec, and the container must carry
    // the requested codec (reference COMPRESSIONS table)
    val base = "rs_makeraster(7, 6, 100.0, 500.0, 2.0, -3.0, " +
      "array_repeat(cast(0.0 as double), 42))"
    val rect = "st_geomfromwkt('POLYGON ((102.6 495.8, 109.3 495.8, " +
      "109.3 485.9, 102.6 485.9, 102.6 495.8))')"
    def compressionTag(bytes: Array[Byte]): Int = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifd = bb.getInt(4)
      val n = bb.getShort(ifd) & 0xffff
      (0 until n).map(i => ifd + 2 + i * 12)
        .find(off => (bb.getShort(off) & 0xffff) == 259)
        .map(off => bb.getShort(off + 8) & 0xffff).getOrElse(-1)
    }
    for ((tok, name) <- Seq("b" -> "UNSIGNED_8BITS", "us" -> "UNSIGNED_16BITS",
        "s" -> "SIGNED_16BITS", "i" -> "SIGNED_32BITS",
        "f" -> "REAL_32BITS", "d" -> "REAL_64BITS");
        (comp, code) <- Seq("none" -> 1, "Deflate" -> 8, "LZW" -> 5,
          "PackBits" -> 32773)) {
      val src = s"rs_setcrs(rs_asraster($rect, $base, '$tok', false, 7.0, 100.0), 'EPSG:3857')"
      val enc = s"rs_asgeotiff($src, '$comp', 0.75)"
      val encBytes = q(enc).asInstanceOf[Array[Byte]]
      assert(compressionTag(encBytes) == code, s"$comp tag")
      val back = s"rs_fromgdalraster($enc)"
      assert(q(s"rs_bandpixeltype($back, 1)") == name, s"$tok/$comp ptype")
      assert(q(s"rs_bandnodatavalue($back, 1)") == 100.0, s"$tok/$comp nodata")
      assert(q(s"rs_crs($back)") == "EPSG:3857", s"$tok/$comp crs")
      assert(q(s"rs_upperleftx($back)") == 102.0 && q(s"rs_scalex($back)") == 2.0)
      assert(q(s"rs_value($back, 1, 0, 0)") == 7.0, s"$tok/$comp pixel")
    }
    // one-argument form stays uncompressed
    val plain = q(s"rs_asgeotiff(rs_setcrs($base, 'EPSG:3857'))").asInstanceOf[Array[Byte]]
    assert(compressionTag(plain) == 1)

    // codec stress beyond the tiny grid: LZW across its 9->10->11 bit
    // width bumps and PackBits across mixed literal/repeat rows
    import graft.functions.RasterModel
    val w = 120; val h = 90
    val vals = Array.tabulate(w * h) { i =>
      if ((i / w) % 7 == 0) 42.0 else ((i.toLong * 7919) % 997).toDouble
    }
    val big = RasterModel.Raster("EPSG:3857", Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
      w, h, IndexedSeq(RasterModel.Band(Double.NaN, RasterModel.packDoubles(vals),
        ptype = "UNSIGNED_16BITS")))
    for (code <- Seq(5, 32773, 8)) {
      val rt = graft.sources.GeoTiff.read(graft.sources.GeoTiff.writeCompressed(big, code))
      assert(rt.width == w && rt.height == h, s"code $code dims")
      val got = java.nio.ByteBuffer.wrap(rt.bands.head.data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < w * h) {
        assert(got.getDouble(i * 8) == vals(i), s"code $code pixel $i")
        i += 1
      }
    }
  }

  test("RS_Example accessor values (test_raster_functions.py)") {
    assert(q("rs_numbands(rs_example())") == 3)
    assert(q("rs_width(rs_example())") == 64)
    assert(q("rs_height(rs_example())") == 32)
    assert(q("rs_bandnodatavalue(rs_example(), 1)") == 127.0)
    assert(q("rs_scalex(rs_example())") == 2.0)
    assert(q("rs_scaley(rs_example())") == 2.0)
    assert(q("rs_skewx(rs_example())") == 1.0)
    assert(q("rs_skewy(rs_example())") == 1.0)
    assert(q("rs_upperleftx(rs_example())") == 43.08)
    assert(q("rs_upperlefty(rs_example())") == 79.07)
    // the example raster's declared source dtype is uint8 even though
    // working pixels are f64 (reference raster.rs pixel-type names)
    assert(q("rs_bandpixeltype(rs_example(), 1)") == "UNSIGNED_8BITS")

    // WKT CRS strings round-trip through RS_SetCRS/RS_CRS unchanged,
    // with or without an embedded authority; RS_SRID extracts the
    // authority code and errors when the WKT carries none.
    val wkt3857 = "PROJCS[\"WGS 84 / Pseudo-Mercator\",GEOGCS[\"WGS 84\"," +
      "DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563," +
      "AUTHORITY[\"EPSG\",\"7030\"]],AUTHORITY[\"EPSG\",\"6326\"]]," +
      "PRIMEM[\"Greenwich\",0,AUTHORITY[\"EPSG\",\"8901\"]]," +
      "UNIT[\"degree\",0.0174532925199433,AUTHORITY[\"EPSG\",\"9122\"]]," +
      "AUTHORITY[\"EPSG\",\"4326\"]],PROJECTION[\"Mercator_1SP\"]," +
      "PARAMETER[\"central_meridian\",0],PARAMETER[\"scale_factor\",1]," +
      "PARAMETER[\"false_easting\",0],PARAMETER[\"false_northing\",0]," +
      "UNIT[\"metre\",1,AUTHORITY[\"EPSG\",\"9001\"]],AUTHORITY[\"EPSG\",\"3857\"]]"
    val wktNoAuth = "PROJCS[\"Custom LCC\",GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
      "SPHEROID[\"WGS 84\",6378137,298.257223563]]]," +
      "PROJECTION[\"Lambert_Conformal_Conic_2SP\"]," +
      "PARAMETER[\"standard_parallel_1\",33],PARAMETER[\"standard_parallel_2\",45]," +
      "PARAMETER[\"latitude_of_origin\",39],PARAMETER[\"central_meridian\",-96]," +
      "UNIT[\"metre\",1]]"
    assert(q(s"rs_crs(rs_setcrs(rs_example(), '$wkt3857'))") == wkt3857)
    assert(q(s"rs_crs(rs_setcrs(rs_example(), '$wktNoAuth'))") == wktNoAuth)
    assert(q(s"rs_srid(rs_setcrs(rs_example(), '$wkt3857'))") == 3857)
    val e = intercept[Exception](q(s"rs_srid(rs_setcrs(rs_example(), '$wktNoAuth'))"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ").contains("SRID"))
  }

  test("raster ambiguous-band and quality-range error contracts " +
      "(test_raster_functions.py)") {
    def causesMsg(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString(" | ")
    // 2-arg nodata setter on the 3-band example is ambiguous
    val e1 = intercept[Exception](q("rs_setbandnodatavalue(rs_example(), 0.0D)"))
    assert(causesMsg(e1).contains("specify which band"))
    // band-less value sampler likewise
    val e2 = intercept[Exception](
      q("rs_value(rs_example(), st_point(74.58D, 110.57D))"))
    assert(causesMsg(e2).contains("specify which band"))
    // quality is a 0-1 fraction, not a percentage
    val e3 = intercept[Exception](
      q("rs_asgeotiff(rs_example(), 'DEFLATE', 75.0D)"))
    assert(causesMsg(e3).contains("between 0.0 and 1.0"))
    // in-range quality accepted (and ignored for lossless codecs)
    assert(q("length(rs_asgeotiff(rs_example(), 'DEFLATE', 0.85D))")
      .asInstanceOf[Int] > 0)
  }

  test("sd_format width_hint options form (docs/reference/sql/sd_format.qmd)") {
    assert(q("sd_format(st_point(1.0, 2.0))") == "POINT (1 2)")
    assert(q("sd_format(st_point(1.0, 2.0), '{\"width_hint\": 16}')") == "POINT (1 2)")
    val full = q("sd_format(st_makeenvelope(0.123456, 1.2, 2.3, 3.4))")
      .asInstanceOf[String]
    val long = q("sd_format(st_makeenvelope(0.123456, 1.2, 2.3, 3.4), " +
      "'{\"width_hint\": 16}')").asInstanceOf[String]
    // truncation stops mid-render, no ellipsis (sd_format.rs LimitedSizeOutput)
    assert(long.length == 16 && long == full.take(16), long)
    // malformed options JSON is an error (sd_format.rs:78-80 map_err)
    val err = intercept[Exception] {
      q("sd_format(st_point(1.0, 2.0), 'not json')")
    }
    val errMsg = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(errMsg.contains("invalid options JSON"), errMsg)
  }

  test("geography predicate pins: intersects/contains/within/equals/disjoint " +
      "(tests/geography/test_geog_predicates.py)") {
    def b2(fn: String, a: String, b: String): Any =
      q(s"$fn(st_geomfromwkt('$a'), st_geomfromwkt('$b'))")
    val tri = "POLYGON ((0 0, 2 0, 0 2, 0 0))"
    val wrap = "POLYGON ((179 0, -179 0, 179 2, 179 0))"
    // intersects
    assert(b2("st_intersectssphere", tri, "POINT (0.25 0.25)") == true)
    assert(b2("st_intersectssphere", wrap, "POINT (-180 0.25)") == true)
    assert(b2("st_intersectssphere", tri, "POINT (-30 -30)") == false)
    assert(b2("st_intersectssphere", tri, "POINT (1.01 1.01)") == false)
    assert(b2("st_intersectssphere", tri, "POINT (0 0)") == true) // boundary
    assert(b2("st_intersectssphere", tri, "POLYGON ((0 0, 1 0, 0 1, 0 0))") == true)
    // contains: boundary-only point is NOT contained; wraparound point is
    assert(b2("st_containssphere", tri, "POINT (0.25 0.25)") == true)
    assert(b2("st_containssphere", wrap, "POINT (-180 0.25)") == true)
    assert(b2("st_containssphere", tri, "POINT (0 0)") == false)
    assert(b2("st_containssphere", tri, "POINT (-30 -30)") == false)
    assert(b2("st_containssphere", tri, "POINT (1.01 1.01)") == false)
    assert(b2("st_containssphere", tri, "LINESTRING (0.25 0.25, 0.5 0.5)") == true)
    assert(b2("st_containssphere", tri, "LINESTRING (0.25 0.25, 3 3)") == false)
    assert(b2("st_containssphere", tri, "LINESTRING (3 3, 4 4)") == false)
    assert(b2("st_containssphere", tri,
      "POLYGON ((0.1 0.1, 0.5 0.1, 0.1 0.5, 0.1 0.1))") == true)
    assert(b2("st_containssphere",
      "POLYGON ((0.1 0.1, 0.5 0.1, 0.1 0.5, 0.1 0.1))", tri) == false)
    assert(b2("st_containssphere", tri,
      "POLYGON ((0.1 0.1, 3 0.1, 0.1 3, 0.1 0.1))") == false)
    assert(b2("st_containssphere", "LINESTRING (0 0, 1 0)", "POINT (10 10)") == false)
    assert(b2("st_containssphere", tri, tri) == true) // identity via centroid witness
    // GEOMETRYCOLLECTION cases
    assert(b2("st_containssphere",
      s"GEOMETRYCOLLECTION (POINT (30 30), LINESTRING (40 40, 41 40), $tri)",
      "POINT (0.25 0.25)") == true)
    assert(b2("st_containssphere", tri,
      "GEOMETRYCOLLECTION (POINT (0.25 0.25), LINESTRING (0.3 0.3, 0.4 0.4))") == true)
    assert(b2("st_containssphere", tri,
      "GEOMETRYCOLLECTION (POINT (30 30), LINESTRING (0.3 0.3, 0.4 0.4))") == false)
    // within = flipped contains
    assert(b2("st_withinsphere", "POINT (0.25 0.25)", tri) == true)
    assert(b2("st_withinsphere", "POINT (-180 0.25)", wrap) == true)
    assert(b2("st_withinsphere", "POINT (0 0)", tri) == false) // boundary
    assert(b2("st_withinsphere", tri, "POINT (0.25 0.25)") == false)
    // equals
    assert(q("st_equalssphere(st_geomfromwkt('POINT EMPTY'), st_geomfromwkt('POINT EMPTY'))") == true)
    assert(q("st_equalssphere(st_geomfromwkt('POINT EMPTY'), st_geomfromwkt('LINESTRING EMPTY'))") == true)
    assert(b2("st_equalssphere", "POINT (0 0)", "POINT EMPTY") == false)
    val triS = "POLYGON ((0 0, 1 0, 0 1, 0 0))"
    assert(b2("st_equalssphere", triS, triS) == true)
    assert(b2("st_equalssphere", triS, "POLYGON ((1 0, 0 1, 0 0, 1 0))") == true)
    assert(b2("st_equalssphere", triS, tri) == false)
    assert(b2("st_equalssphere", triS, "POLYGON ((30 30, 32 30, 30 32, 30 30))") == false)
    assert(b2("st_equalssphere",
      "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((10 10, 11 10, 10 11, 10 10)))", tri) == false)
    assert(b2("st_equalssphere",
      "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 1, 2 2))",
      "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 1, 2 2))") == true)
    assert(b2("st_equalssphere",
      "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 1, 2 2))",
      "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 1, 3 3))") == false)
    assert(b2("st_equalssphere",
      "GEOMETRYCOLLECTION (POINT (0 0))", "POINT (0 0)") == true)
    assert(b2("st_equalssphere", "LINESTRING (1 1, 2 2)", "LINESTRING (2 2, 1 1)") == true)
    // disjoint
    assert(b2("st_disjointsphere", "POLYGON ((0 0, 1 0, 0 1, 0 0))", "POINT (30 30)") == true)
    assert(b2("st_disjointsphere", "POLYGON ((0 0, 1 0, 0 1, 0 0))", "POINT (0.1 0.1)") == false)
    assert(b2("st_disjointsphere", "LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)") == false)
    assert(b2("st_disjointsphere", "LINESTRING (0 0, 1 1)", "LINESTRING (5 5, 6 6)") == true)
    // null propagation
    assert(q(s"st_containssphere(NULL, st_geomfromwkt('$tri'))") == null)
    assert(q(s"st_equalssphere(st_geomfromwkt('$tri'), NULL)") == null)
  }

  test("spherical max distance incl. antipodal linestrings " +
      "(geography/test_geog_distance.py)") {
    def md(a: String, b: String): Double =
      q(s"st_maxdistancesphere(st_geomfromwkt('$a'), st_geomfromwkt('$b'))")
        .asInstanceOf[Double]
    def rel(got: Double, want: Double): Unit =
      assert(math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want)) ||
        math.abs(got / want - 1.0) < 1e-6, s"got $got want $want")
    assert(q("st_maxdistancesphere(st_geomfromwkt('POINT (0 0)'), " +
      "st_geomfromwkt('POINT EMPTY'))") == null)
    assert(md("POINT (0 0)", "POINT (0 0)") == 0.0)
    rel(md("POINT (0 0)", "POINT (0 1)"), 111195.10117748393)
    rel(md("POINT (0 0)", "LINESTRING (0 0, 0 1)"), 111195.10117748393)
    rel(md("POINT (1 0)", "LINESTRING (0 0, 0 1)"), 157249.62809250789)
    rel(md("LINESTRING (0 0, 0 1)", "POINT (1 0)"), 157249.62809250789)
    rel(md("POINT (0.25 0.25)", "POLYGON ((0 0, 2 0, 0 2, 0 0))"), 196566.41390163341)
    rel(md("POINT (0 0)", "POLYGON ((0 0, 2 0, 0 2, 0 0))"), 222390.20235496786)
    rel(md("POINT (-1 0)", "POLYGON ((0 0, 2 0, 0 2, 0 0))"), 333585.3035324518)
    // antipodal linestring pair: both geodesics pass the poles, the max
    // is the full half-circumference pi*R
    rel(md("LINESTRING (-90 -80, 90 -80)", "LINESTRING (0 80, 180 80)"),
      20015118.022076216)
    // st_longestlinesphere: its endpoints realize the max distance and
    // lie on their respective inputs
    def ql(a: String, b: String, expr: String): Double =
      spark.sql(("SELECT EXPR AS r FROM (SELECT " +
        s"st_longestlinesphere(st_geomfromwkt('$a'), st_geomfromwkt('$b')) AS ll, " +
        s"st_geomfromwkt('$a') AS ga, st_geomfromwkt('$b') AS gb)")
        .replace("EXPR", expr)).collect()(0).getDouble(0)
    for ((a, b) <- Seq(
        ("POINT (1 0)", "LINESTRING (0 0, 0 1)"),
        ("POINT (-1 0)", "POLYGON ((0 0, 2 0, 0 2, 0 0))"),
        ("LINESTRING (10 10, 20 20)", "POLYGON ((40 0, 42 0, 40 2, 40 0))"))) {
      rel(ql(a, b, "st_distancesphere(st_startpoint(ll), st_endpoint(ll))"), md(a, b))
      assert(ql(a, b, "st_distancesphere(st_startpoint(ll), ga)") < 1e-6)
      assert(ql(a, b, "st_distancesphere(st_endpoint(ll), gb)") < 1e-6)
    }
  }

  test("geography wrap-aware bounds + envelope (geography/test_bounds.py)") {
    def wktRound(s: String, p: Int): String =
      "[-0-9.]+".r.replaceAllIn(s, m => {
        val v = BigDecimal(m.matched).setScale(p, BigDecimal.RoundingMode.HALF_EVEN)
        v.underlying.stripTrailingZeros.toPlainString
      })
    // wrapped interval endpoints: xmin > xmax across the antimeridian
    for (wkt <- Seq("LINESTRING (170 0, -170 0)",
        "POLYGON ((170 -10, 170 10, -170 10, -170 -10, 170 -10))")) {
      assert(q(s"st_xminsphere(st_geomfromwkt('$wkt'))") == 170.0, wkt)
      assert(q(s"st_xmaxsphere(st_geomfromwkt('$wkt'))") == -170.0, wkt)
    }
    // non-wrapping stays chart-identical
    assert(q("st_xminsphere(st_geomfromwkt('LINESTRING (-10 0, 20 5)'))") == -10.0)
    assert(q("st_xmaxsphere(st_geomfromwkt('LINESTRING (-10 0, 20 5)'))") == 20.0)
    // envelope splits at the antimeridian into a MULTIPOLYGON
    assert(wktRound(q("st_astext(st_envelopesphere(st_geomfromwkt(" +
      "'LINESTRING (170 10, -170 20)')))").asInstanceOf[String], 6) ==
      "MULTIPOLYGON (((170 10, 170 20, 180 20, 180 10, 170 10)), " +
        "((-180 10, -180 20, -170 20, -170 10, -180 10)))")
    // geodesic latitude bulge: the lat-10 edge across 180 reaches 10.151082
    assert(wktRound(q("st_astext(st_envelopesphere(st_geomfromwkt(" +
      "'POLYGON ((170 -10, 170 10, -170 10, -170 -10, 170 -10))')))")
      .asInstanceOf[String], 6) ==
      "MULTIPOLYGON (((170 -10.151082, 170 10.151082, 180 10.151082, " +
        "180 -10.151082, 170 -10.151082)), ((-180 -10.151082, -180 10.151082, " +
        "-170 10.151082, -170 -10.151082, -180 -10.151082)))")
    // same-latitude points wrap as a MULTILINESTRING (the envelope-agg
    // antimeridian case, expressed over a collected geometry)
    assert(q("st_astext(st_envelopesphere(st_geomfromwkt(" +
      "'GEOMETRYCOLLECTION (POINT (170 0), POINT (-170 0))')))") ==
      "MULTILINESTRING ((170 0, 180 0), (-180 0, -170 0))")
    // degenerate forms: point, zero-height equator line
    assert(q("st_astext(st_envelopesphere(st_geomfromwkt('POINT (5 6)')))")
      == "POINT (5 6)")
    assert(q("st_astext(st_envelopesphere(st_geomfromwkt('LINESTRING (0 0, 10 0)')))")
      == "LINESTRING (0 0, 10 0)")
    // empty -> empty; null propagates
    assert(q("st_isempty(st_envelopesphere(st_geomfromwkt('POLYGON EMPTY')))") == true)
    assert(q("st_envelopesphere(CAST(NULL AS BINARY))") == null)
    // pole-crossing geodesic: the short arc of (0 80)->(180 80) runs over
    // the north pole, so ymax is 90 (S2LatLngRectBounder pole handling)
    assert(q("st_ymaxsphere(st_geomfromwkt('LINESTRING (0 80, 180 80)'))") == 90.0)
    assert(q("st_yminsphere(st_geomfromwkt('LINESTRING (0 80, 180 80)'))") == 80.0)
    assert(q("st_yminsphere(st_geomfromwkt('LINESTRING (-90 -70, 90 -70)'))") == -90.0)
    assert(q("st_ymaxsphere(st_geomfromwkt('LINESTRING (-90 -70, 90 -70)'))") == -70.0)
    // a meridian edge that does NOT span opposite longitudes stays chart-exact
    assert(q("st_ymaxsphere(st_geomfromwkt('LINESTRING (10 20, 10 60)'))") == 60.0)
  }

  test("ST_HausdorffDistance densify fraction + empties (test_distance.py)") {
    assert(q("st_hausdorffdistance(st_geomfromwkt('POINT EMPTY'), " +
      "st_geomfromwkt('POINT EMPTY'), 0.5D)") == null)
    assert(q("st_hausdorffdistance(st_geomfromwkt('LINESTRING (0 0, 100 0)'), " +
      "st_geomfromwkt('LINESTRING (0 1, 100 1)'), 0.5D)") == 1.0)
    assert(q("st_hausdorffdistance(st_geomfromwkt('LINESTRING (130 0, 0 0, 0 150)'), " +
      "st_geomfromwkt('LINESTRING (10 10, 10 150, 130 10)'), 0.5D)") == 70.0)
    assert(q("st_hausdorffdistance(CAST(NULL AS BINARY), " +
      "st_geomfromwkt('POINT (0 0)'), 0.5D)") == null)
  }

  test("ST_Transform 3D geocentric anchor (test_transforms.py test_st_transform_3d)") {
    val r = spark.sql("SELECT st_transform(st_geomfromwkt('POINT Z (1 1 1)'), " +
      "'EPSG:4979', 'EPSG:4978') AS g").select(
        org.apache.spark.sql.functions.expr("st_x(g)"),
        org.apache.spark.sql.functions.expr("st_y(g)"),
        org.apache.spark.sql.functions.expr("st_z(g)")).collect()(0)
    assert(math.abs(r.getDouble(0) - 6376201.805927448) < 1e-6)
    assert(math.abs(r.getDouble(1) - 111297.016517882) < 1e-6)
    assert(math.abs(r.getDouble(2) - 110568.792276973) < 1e-6)
  }

  test("ST_Transform web-mercator anchor + SRID plumbing (test_transforms.py)") {
    // the reference's PROJ anchor for (1,1) 4326→3857, wkt_precision 9
    val p = spark.sql("SELECT st_transform(st_geomfromwkt('POINT (1 1)'), " +
      "'EPSG:4326', 'EPSG:3857') AS g")
      .selectExpr("st_x(g)", "st_y(g)", "st_srid(g)").collect()(0)
    assert(math.abs(p.getDouble(0) - 111319.490793274) < 1e-6)
    assert(math.abs(p.getDouble(1) - 111325.142866385) < 1e-6)
    assert(p.getInt(2) == 3857)
    assert(q("st_srid(st_setsrid(st_point(1,1), 3857))") == 3857)
    assert(q("st_srid(st_point(1,1))") == 0)
  }

  test("ST_Translate 2D/3D table incl. Z/M/ZM and empties (test_transforms.py)") {
    def t2(geom: String, dx: String, dy: String, expected: String): Unit =
      sameGeom(s"st_translate(st_geomfromwkt('$geom'), $dx, $dy)", expected)
    def t3(geom: String, dx: String, dy: String, dz: String, expected: String): Unit =
      sameGeom(s"st_translate(st_geomfromwkt('$geom'), $dx, $dy, $dz)", expected)
    t2("POINT (0 1)", "1.0D", "2.0D", "POINT (1 3)")
    t2("POINT (0 1)", "-1.0D", "-2.0D", "POINT (-1 -1)")
    t2("POINT (0 1)", "0.0D", "0.0D", "POINT (0 1)")
    t2("POINT (0 1)", "1", "2", "POINT (1 3)") // integer args
    t2("POINT Z (0 1 2)", "1.0D", "2.0D", "POINT Z (1 3 2)")
    t2("POINT M (0 1 2)", "1.0D", "2.0D", "POINT M (1 3 2)")
    t2("POINT ZM (0 1 2 3)", "1.0D", "2.0D", "POINT ZM (1 3 2 3)")
    t2("LINESTRING (0 1, 2 3)", "1.0D", "2.0D", "LINESTRING (1 3, 3 5)")
    t2("POLYGON ((0 0, 1 0, 0 1, 0 0))", "1.0D", "2.0D",
      "POLYGON ((1 2, 2 2, 1 3, 1 2))")
    t2("MULTIPOINT (0 1, 2 3)", "1.0D", "2.0D", "MULTIPOINT (1 3, 3 5)")
    t2("GEOMETRYCOLLECTION (POINT (0 1))", "1.0D", "2.0D",
      "GEOMETRYCOLLECTION (POINT (1 3))")
    t2("LINESTRING EMPTY", "1.0D", "2.0D", "LINESTRING EMPTY")
    t2("POLYGON EMPTY", "1.0D", "2.0D", "POLYGON EMPTY")
    t2("GEOMETRYCOLLECTION EMPTY", "1.0D", "2.0D", "GEOMETRYCOLLECTION EMPTY")
    // 3-offset form: dz applies to Z carriers only; 2D and M unchanged
    t3("POINT Z (0 1 2)", "1.0D", "2.0D", "3.0D", "POINT Z (1 3 5)")
    t3("POINT Z (0 1 2)", "-1.0D", "-2.0D", "-3.0D", "POINT Z (-1 -1 -1)")
    t3("POINT (0 1)", "1.0D", "2.0D", "3.0D", "POINT (1 3)")
    t3("POINT M (0 1 2)", "1.0D", "2.0D", "3.0D", "POINT M (1 3 2)")
    t3("POINT ZM (0 1 2 3)", "1.0D", "2.0D", "3.0D", "POINT ZM (1 3 5 3)")
    t3("LINESTRING Z (0 1 2, 2 3 4)", "1.0D", "2.0D", "3.0D",
      "LINESTRING Z (1 3 5, 3 5 7)")
    t3("POLYGON Z ((0 0 0, 1 0 2, 0 1 2, 0 0 0))", "1.0D", "2.0D", "3.0D",
      "POLYGON Z ((1 2 3, 2 2 5, 1 3 5, 1 2 3))")
    t3("MULTIPOLYGON Z (((0 0 0, 1 0 2, 0 1 2, 0 0 0)))", "1.0D", "2.0D", "3.0D",
      "MULTIPOLYGON Z (((1 2 3, 2 2 5, 1 3 5, 1 2 3)))")
    t3("GEOMETRYCOLLECTION Z (POINT Z (0 1 2))", "1.0D", "2.0D", "3.0D",
      "GEOMETRYCOLLECTION Z (POINT Z (1 3 5))")
    t3("MULTIPOINT EMPTY", "1.0D", "2.0D", "3.0D", "MULTIPOINT EMPTY")
    // null propagation across both arities
    assert(q("st_translate(st_point(0,1), CAST(NULL AS DOUBLE), 2.0D)") == null)
    assert(q("st_translate(st_point(0,1), 1.0D, CAST(NULL AS DOUBLE), 3.0D)") == null)
    assert(q("st_translate(CAST(NULL AS BINARY), 1.0D, 2.0D)") == null)
  }

  test("CRS strings: WKT authority extraction, OGC:CRS84, PROJJSON (test_transforms.py)") {
    val wkt3857 =
      "PROJCS[\"WGS 84 / Pseudo-Mercator\",GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
        "SPHEROID[\"WGS 84\",6378137,298.257223563,AUTHORITY[\"EPSG\",\"7030\"]]," +
        "AUTHORITY[\"EPSG\",\"6326\"]],PRIMEM[\"Greenwich\",0,AUTHORITY[\"EPSG\",\"8901\"]]," +
        "UNIT[\"degree\",0.0174532925199433,AUTHORITY[\"EPSG\",\"9122\"]]," +
        "AUTHORITY[\"EPSG\",\"4326\"]],PROJECTION[\"Mercator_1SP\"]," +
        "PARAMETER[\"central_meridian\",0],PARAMETER[\"scale_factor\",1]," +
        "PARAMETER[\"false_easting\",0],PARAMETER[\"false_northing\",0]," +
        "UNIT[\"metre\",1,AUTHORITY[\"EPSG\",\"9001\"]],AUTHORITY[\"EPSG\",\"3857\"]]"
    // a WKT carrying an EPSG authority resolves to that SRID (the LAST
    // authority in the text — the nested 4326/7030/9122 must not win)
    assert(graft.functions.GeomScalars.parseCrsSrid(wkt3857) == 3857)
    // authorityless WKT: the error must name the missing SRID
    val noAuth =
      "PROJCS[\"Custom LCC\",GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
        "SPHEROID[\"WGS 84\",6378137,298.257223563]]]," +
        "PROJECTION[\"Lambert_Conformal_Conic_2SP\"]," +
        "PARAMETER[\"standard_parallel_1\",33],PARAMETER[\"standard_parallel_2\",45]," +
        "PARAMETER[\"latitude_of_origin\",39],PARAMETER[\"central_meridian\",-96]," +
        "UNIT[\"metre\",1]]"
    val e = intercept[IllegalArgumentException](
      graft.functions.GeomScalars.parseCrsSrid(noAuth))
    assert(e.getMessage.contains("SRID"))
    // PROJJSON with a top-level id
    assert(graft.functions.GeomScalars.parseCrsSrid(
      """{"type": "ProjectedCRS", "name": "NAD83 / UTM zone 20N",
        | "id": {"authority": "EPSG", "code": 26920}}""".stripMargin) == 26920)
    // a WKT CRS feeds the transform like any other CRS string:
    // the 3857 coordinates of (1,1) transform back to ~POINT (1 1)
    val back = spark.sql("SELECT st_transform(st_geomfromwkt(" +
        "'POINT (111319.490793274 111325.142866385)'), '" + wkt3857 +
        "', 'EPSG:4326') AS g")
      .selectExpr("st_x(g)", "st_y(g)").collect()(0)
    assert(math.abs(back.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(back.getDouble(1) - 1.0) < 1e-6)
    // st_crs prints 4326 as the lnglat convention; others as EPSG:<n>;
    // srid 0 as null; setcrs accepts EPSG strings (test_st_crs_sedonadb)
    assert(q("st_crs(st_setcrs(st_point(1,1), 'EPSG:26920'))") == "EPSG:26920")
    assert(q("st_crs(st_setsrid(st_point(1,1), 4326))") == "OGC:CRS84")
    assert(q("st_crs(st_point(1,1))") == null)
    assert(q("st_srid(st_setsrid(st_point(1,1), 0))") == 0)
    // NULL SRID/geometry propagate
    assert(q("st_setsrid(st_point(1,1), CAST(NULL AS INT))") == null)
    // 3-arg ST_Point carries the SRID; 2-arg ST_Transform reads it
    // (test_st_transform_bind_crs equivalence)
    assert(q("st_srid(st_point(0, 1, 4326))") == 4326)
    val two = spark.sql("SELECT st_transform(st_point(0.0D, 1.0D, 4326), " +
      "'EPSG:3857') AS g").selectExpr("st_x(g)", "st_y(g)", "st_srid(g)").collect()(0)
    val three = spark.sql("SELECT st_transform(st_point(0.0D, 1.0D), " +
      "'EPSG:4326', 'EPSG:3857') AS g")
      .selectExpr("st_x(g)", "st_y(g)", "st_srid(g)").collect()(0)
    assert(two == three)
    // SRID-less input errors loudly on the 2-arg form
    val e2 = intercept[Exception](
      q("st_transform(st_point(0.0D, 1.0D), 'EPSG:3857')"))
    assert(e2.getMessage.contains("no CRS") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("no CRS")))
    // item-CRS input: source read from the carried string, output is a
    // plain geometry tagged with the destination SRID
    assert(q("st_srid(st_transform(st_itemcrs(st_point(0.0D, 1.0D), " +
      "'EPSG:4326'), 'EPSG:3857'))") == 3857)
  }

  test("directed ST_LineMerge + force-dim default fills " +
      "(geography/test_geog_mechanical_transforms.py)") {
    // directed: head-to-tail chains merge, opposite orientations do not
    sameGeom("st_linemerge(st_geomfromwkt(" +
      "'MULTILINESTRING ((0 0, 1 0), (1 0, 1 1))'), true)",
      "LINESTRING (0 0, 1 0, 1 1)")
    sameGeom("st_linemerge(st_geomfromwkt(" +
      "'MULTILINESTRING ((0 0, 1 0), (1 1, 1 0))'), true)",
      "MULTILINESTRING ((0 0, 1 0), (1 1, 1 0))")
    // undirected JTS merge still reverses as needed
    sameGeom("st_linemerge(st_geomfromwkt(" +
      "'MULTILINESTRING ((0 0, 1 0), (1 1, 1 0))'))",
      "LINESTRING (0 0, 1 0, 1 1)")
    // branching node breaks directed chains
    sameGeom("st_linemerge(st_geomfromwkt(" +
      "'MULTILINESTRING ((0 0, 1 0), (1 0, 1 1), (1 0, 2 0))'), true)",
      "MULTILINESTRING ((0 0, 1 0), (1 0, 1 1), (1 0, 2 0))")
    // force3dm: 1-arg fills m=0, 2-arg fills the given m; existing M wins
    def w(e: String): String = q(s"st_astext($e)").toString
    assert(w("st_force3dm(st_geomfromwkt('POINT (0 1)'))") == "POINT M(0 1 0)")
    assert(w("st_force3dm(st_geomfromwkt('POINT (0 1)'), 5.0D)") == "POINT M(0 1 5)")
    assert(w("st_force3dm(st_geomfromwkt('POINT Z (0 1 2)'), 5.0D)") == "POINT M(0 1 5)")
    assert(w("st_force3dm(st_geomfromwkt('POINT M (0 1 3)'), 5.0D)") == "POINT M(0 1 3)")
    assert(w("st_force3dm(st_geomfromwkt('POINT ZM (0 1 2 3)'), 5.0D)") == "POINT M(0 1 3)")
    // force4d: 1-arg fills z=0,m=0; 3-arg fills the given; existing wins
    assert(w("st_force4d(st_geomfromwkt('POINT (0 1)'))") == "POINT ZM(0 1 0 0)")
    assert(w("st_force4d(st_geomfromwkt('POINT (0 1)'), 5.0D, 7.0D)") == "POINT ZM(0 1 5 7)")
    assert(w("st_force4d(st_geomfromwkt('POINT Z (0 1 2)'), 5.0D, 7.0D)") == "POINT ZM(0 1 2 7)")
    assert(w("st_force4d(st_geomfromwkt('POINT M (0 1 3)'), 5.0D, 7.0D)") == "POINT ZM(0 1 5 3)")
    assert(w("st_force4d(st_geomfromwkt('POINT ZM (0 1 2 3)'), 5.0D, 7.0D)") == "POINT ZM(0 1 2 3)")
    // force3d 1-arg default z=0
    assert(w("st_force3d(st_geomfromwkt('POINT (0 1)'))") == "POINT Z(0 1 0)")
    assert(w("st_force3d(st_geomfromwkt('POINT (0 1)'), 5.0D)") == "POINT Z(0 1 5)")
  }

  test("geography area/length anchors (tests/geography/test_geog_measures.py)") {
    // S2 length scales with its radius constant (6371010.0); ours is the
    // IUGG mean (6371008.8) — compare after scaling, 1e-6 rel (the same
    // radius-constant contract as the distance anchors)
    val s = graft.functions.Spherical.R / 6371010.0
    def relNear(expr: String, want: Double, pow: Int): Unit = {
      val got = q(expr).asInstanceOf[Double]
      val scaled = want * math.pow(s, pow)
      if (want == 0.0) assert(got == 0.0, s"$expr: got $got want 0")
      else assert(math.abs(got - scaled) / scaled < 1e-6,
        s"$expr: got $got want $scaled (raw $want)")
    }
    def area(geog: String, want: Double): Unit =
      relNear(s"st_areasphere(st_geomfromwkt('$geog'))", want, 2)
    def len(geog: String, want: Double): Unit =
      relNear(s"st_lengthsphere(st_geomfromwkt('$geog'))", want, 1)
    // zero-measure classes and empties
    area("POINT EMPTY", 0.0); area("LINESTRING EMPTY", 0.0); area("POLYGON EMPTY", 0.0)
    area("POINT (0 0)", 0.0); area("MULTIPOINT ((0 0), (1 1))", 0.0)
    area("LINESTRING (0 0, 0 1)", 0.0)
    area("MULTILINESTRING ((0 0, 0 1), (1 0, 1 1))", 0.0)
    // geodesic-edge polygon areas (S2 anchors, BigQuery/PostGIS-validated)
    area("POLYGON ((0 0, 0 1, 1 0, 0 0))", 6182489130.9071951)
    area("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 12364036567.076418)
    area("MULTIPOLYGON (((0 0, 0 1, 1 0, 0 0)), ((10 10, 10 11, 11 10, 10 10)))",
      12271037686.230379)
    area("POLYGON ((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, 0.1 0.1))",
      23744568445.094166)
    area("GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 0 1), " +
      "POLYGON ((0 0, 0 1, 1 0, 0 0)))", 6182489130.9071951)
    // lengths: linear components only, polygons measure 0
    len("POINT EMPTY", 0.0); len("LINESTRING EMPTY", 0.0); len("POLYGON EMPTY", 0.0)
    len("POINT (0 0)", 0.0); len("MULTIPOINT ((0 0), (1 1))", 0.0)
    len("LINESTRING (0 0, 0 1)", 111195.10117748393)
    len("LINESTRING (0 0, 0 1, 1 1)", 222373.26637265272)
    len("MULTILINESTRING ((0 0, 0 1), (1 0, 1 1))", 222390.20235496786)
    len("POLYGON ((0 0, 0 1, 1 0, 0 0))", 0.0)
    len("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 0.0)
    assert(q("st_areasphere(CAST(NULL AS BINARY))") == null)
    assert(q("st_lengthsphere(CAST(NULL AS BINARY))") == null)
  }

  test("ring/point accessors: ST_NRings, ST_NumInteriorRings, ST_Points " +
      "(test_geog_mechanical_transforms.py)") {
    def g(w: String) = s"st_geomfromwkt('$w')"
    // nrings: 0 for non-polygons and empties, polygons count all rings,
    // collections sum their polygonal members
    assert(q(s"st_nrings(${g("POINT EMPTY")})") == 0)
    assert(q(s"st_nrings(${g("POLYGON EMPTY")})") == 0)
    assert(q(s"st_nrings(${g("POINT (1 2)")})") == 0)
    assert(q(s"st_nrings(${g("LINESTRING (0 0, 1 1, 2 2)")})") == 0)
    assert(q(s"st_nrings(${g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")})") == 1)
    assert(q(s"st_nrings(${g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(1 1, 1 2, 2 2, 2 1, 1 1))")})") == 2)
    assert(q(s"st_nrings(${g("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), " +
      "((10 10, 20 10, 20 20, 10 20, 10 10), (12 12, 12 14, 14 14, 14 12, 12 12)))")})") == 3)
    assert(q(s"st_nrings(${g("GEOMETRYCOLLECTION(POINT(1 1), " +
      "POLYGON((0 0, 1 0, 1 1, 0 0)))")})") == 1)
    // numinteriorrings: polygons only (NULL elsewhere), holes counted
    assert(q(s"st_numinteriorrings(${g("POLYGON EMPTY")})") == 0)
    assert(q(s"st_numinteriorrings(${g("POINT (1 2)")})") == null)
    assert(q(s"st_numinteriorrings(${g("MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0), " +
      "(1 1, 2 1, 2 2, 1 2, 1 1)),((10 10, 14 10, 14 14, 10 14, 10 10)))")})") == null)
    assert(q(s"st_numinteriorrings(${g("POLYGON ((0 0,10 0,10 6,0 6,0 0), " +
      "(1 1,2 1,2 5,1 5,1 1),(8 5,8 4,9 4,9 5,8 5))")})") == 2)
    // points: every vertex (duplicates kept), Z/M preserved
    sameGeom(s"st_points(${g("LINESTRING (0 0, 1 1, 0 0)")})",
      "MULTIPOINT (0 0, 1 1, 0 0)")
    sameGeom(s"st_points(${g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")})",
      "MULTIPOINT (0 0, 4 0, 4 4, 0 4, 0 0)")
    sameGeom(s"st_points(${g("LINESTRING ZM (1 2 3 4, 5 6 7 8, 9 0 1 2)")})",
      "MULTIPOINT ZM (1 2 3 4, 5 6 7 8, 9 0 1 2)")
  }

  test("ST_Dimension incl. typed empties and mixed collections (test_geog_accessors.py)") {
    def g(w: String) = s"st_geomfromwkt('$w')"
    assert(q(s"st_dimension(${g("POINT (0 0)")})") == 0)
    assert(q(s"st_dimension(${g("LINESTRING (0 0, 1 1)")})") == 1)
    assert(q(s"st_dimension(${g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")})") == 2)
    // mixed collection: highest member dimension
    assert(q(s"st_dimension(${g("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 1, 2 2))")})") == 1)
    assert(q(s"st_dimension(${g("GEOMETRYCOLLECTION (POINT (0 0), POLYGON ((0 0, 1 0, 1 1, 0 0)))")})") == 2)
    // typed empties keep their class dimension; empty GC pins 0
    assert(q(s"st_dimension(${g("POINT EMPTY")})") == 0)
    assert(q(s"st_dimension(${g("LINESTRING EMPTY")})") == 1)
    assert(q(s"st_dimension(${g("POLYGON EMPTY")})") == 2)
    assert(q(s"st_dimension(${g("GEOMETRYCOLLECTION EMPTY")})") == 0)
  }

  test("ST_IsClosed / ST_IsCollection edges (test_geog_accessors.py)") {
    def g(w: String) = s"st_geomfromwkt('$w')"
    assert(q(s"st_isclosed(${g("POINT EMPTY")})") == false)
    assert(q(s"st_isclosed(${g("POINT (0 0)")})") == true)
    assert(q(s"st_isclosed(${g("MULTIPOINT ((0 0), (1 1))")})") == true)
    assert(q(s"st_isclosed(${g("LINESTRING (0 0, 1 0, 1 1, 0 0)")})") == true)
    assert(q(s"st_isclosed(${g("LINESTRING (0 0, 1 0, 1 1)")})") == false)
    assert(q(s"st_isclosed(${g("POLYGON ((0 0, 1 0, 1 1, 0 0))")})") == true)
    assert(q(s"st_iscollection(${g("POINT (0 0)")})") == false)
    assert(q(s"st_iscollection(${g("POLYGON ((0 0, 1 0, 1 1, 0 0))")})") == false)
    assert(q(s"st_iscollection(${g("MULTIPOINT ((0 0), (1 1))")})") == true)
    assert(q(s"st_iscollection(${g("GEOMETRYCOLLECTION EMPTY")})") == true)
  }

  test("ST_ZMin/ZMax/MMin/MMax across dim variants (geography/test_bounds.py)") {
    def g(w: String) = s"st_geomfromwkt('$w')"
    for (f <- Seq("st_zmin", "st_zmax", "st_mmin", "st_mmax")) {
      assert(q(s"$f(${g("POINT EMPTY")})") == null, f)
      assert(q(s"$f(${g("POINT (10 20)")})") == null, f)
      assert(q(s"$f(${g("LINESTRING (1 2, 5 6)")})") == null, f)
    }
    // the XYM third ordinate is M, never Z
    assert(q(s"st_zmin(${g("POINT M (10 20 30)")})") == null)
    assert(q(s"st_mmin(${g("POINT M (10 20 30)")})") == 30.0)
    assert(q(s"st_zmin(${g("POINT Z (10 20 30)")})") == 30.0)
    assert(q(s"st_mmin(${g("POINT Z (10 20 30)")})") == null)
    assert(q(s"st_zmin(${g("POINT ZM (10 20 30 40)")})") == 30.0)
    assert(q(s"st_mmax(${g("POINT ZM (10 20 30 40)")})") == 40.0)
    assert(q(s"st_zmin(${g("POLYGON Z ((-1 0 1, 0 -2 2, 3 1 3, 0 4 4, -1 0 1))")})") == 1.0)
    assert(q(s"st_zmax(${g("POLYGON Z ((-1 0 1, 0 -2 2, 3 1 3, 0 4 4, -1 0 1))")})") == 4.0)
    assert(q(s"st_mmin(${g("POLYGON M ((-1 0 1, 0 -2 2, 3 1 3, 0 4 4, -1 0 1))")})") == 1.0)
    assert(q(s"st_mmax(${g("LINESTRING M (1 2 3, 5 6 7)")})") == 7.0)
  }

  test("closest/shortest/longest line empties and planar anchors (test_geog_distance.py)") {
    def g(w: String) = s"st_geomfromwkt('$w')"
    // empty inputs degrade instead of erroring
    assert(q(s"st_astext(st_shortestline(${g("POINT (0 0)")}, ${g("POINT EMPTY")}))")
      == "LINESTRING EMPTY")
    assert(q(s"st_astext(st_shortestline(${g("POINT EMPTY")}, ${g("POINT (0 0)")}))")
      == "LINESTRING EMPTY")
    assert(q(s"st_astext(st_longestline(${g("POINT (0 0)")}, ${g("POINT EMPTY")}))")
      == "LINESTRING EMPTY")
    assert(q(s"st_astext(st_closestpoint(${g("POINT (0 0)")}, ${g("POINT EMPTY")}))")
      == "POINT EMPTY")
    // planar versions of the reference's point/line/polygon cases
    sameGeom(s"st_shortestline(${g("POINT (0 0)")}, ${g("POINT (0 1)")})",
      "LINESTRING (0 0, 0 1)")
    sameGeom(s"st_shortestline(${g("POINT (1 0)")}, ${g("LINESTRING (0 0, 0 1)")})",
      "LINESTRING (1 0, 0 0)")
    sameGeom(s"st_shortestline(${g("POINT (0.25 0.25)")}, " +
      s"${g("POLYGON ((0 0, 2 0, 0 2, 0 0))")})",
      "LINESTRING (0.25 0.25, 0.25 0.25)")
    sameGeom(s"st_shortestline(${g("POINT (-1 0)")}, " +
      s"${g("POLYGON ((0 0, 2 0, 0 2, 0 0))")})",
      "LINESTRING (-1 0, 0 0)")
    sameGeom(s"st_closestpoint(${g("LINESTRING (0 0, 0 1)")}, ${g("POINT (1 0)")})",
      "POINT (0 0)")
  }

  test("ST_Segmentize equal-part splits with Z/M interpolation (test_segmentize.py)") {
    def g(w: String) = s"st_geomfromwkt('$w')"
    def w(e: String): String = q(s"st_astext($e)").toString
    // no-split when the segment already fits
    sameGeom(s"st_segmentize(${g("LINESTRING (0 1, 1 2, 2 1)")}, 1e9)",
      "LINESTRING (0 1, 1 2, 2 1)")
    sameGeom(s"st_segmentize(${g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")}, 1e9)",
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    // equal-part subdivision, not max-length stepping: 2 units at 1.1 ->
    // the midpoint, not a cut at 1.1
    sameGeom(s"st_segmentize(${g("LINESTRING (0 0, 0 2)")}, 1.1)",
      "LINESTRING (0 0, 0 1, 0 2)")
    sameGeom(s"st_segmentize(${g("LINESTRING (0 0, 0 4)")}, 1.1)",
      "LINESTRING (0 0, 0 1, 0 2, 0 3, 0 4)")
    sameGeom(s"st_segmentize(${g("POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))")}, 1.1)",
      "POLYGON ((0 0, 0 1, 0 2, 1 2, 2 2, 2 1, 2 0, 1 0, 0 0))")
    sameGeom(s"st_segmentize(${g("MULTILINESTRING ((0 0, 0 2), (1 0, 1 2))")}, 1.1)",
      "MULTILINESTRING ((0 0, 0 1, 0 2), (1 0, 1 1, 1 2))")
    sameGeom(s"st_segmentize(${g("GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (0 0, 0 2))")}, 1.1)",
      "GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (0 0, 0 1, 0 2))")
    // Z, M, and ZM all interpolate linearly
    assert(w(s"st_segmentize(${g("LINESTRING Z (0 0 100, 0 2 200)")}, 1.1)")
      == "LINESTRING Z(0 0 100, 0 1 150, 0 2 200)")
    assert(w(s"st_segmentize(${g("LINESTRING M (0 0 0, 0 2 100)")}, 1.1)")
      == "LINESTRING M(0 0 0, 0 1 50, 0 2 100)")
    assert(w(s"st_segmentize(${g("LINESTRING ZM (0 0 100 0, 0 2 200 100)")}, 1.1)")
      == "LINESTRING ZM(0 0 100 0, 0 1 150 50, 0 2 200 100)")
    // invalid max lengths error loudly
    for (bad <- Seq("0.0", "-1.0")) {
      val e = intercept[Exception](q(
        s"st_segmentize(${g("LINESTRING (0 0, 1 1)")}, $bad)"))
      val msg = Option(e.getCause).getOrElse(e).getMessage
      assert(msg.contains("must be finite and"), msg)
    }
  }

  test("S2 cell ids (geography/test_geog_s2.py)") {
    // the reference's own leaf-id anchors (shared with BigQuery)
    assert(q("s2_cellidfrompoint(st_point(0, 0))") == 1152921504606846977L)
    assert(q("s2_cellidfrompoint(st_point(0, 1))") == 1153451514845492609L)
    assert(q("s2_cellidfrompoint(st_geomfromwkt('POINT EMPTY'))") == null)
    // coverings: contract properties (cell choice is unstable even across
    // S2 versions — the reference's tests only pin size/levels)
    def cells(expr: String): Seq[Long] =
      q(expr).asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(cells("s2_coveringcellids(st_geomfromwkt('POINT EMPTY'))").isEmpty)
    assert(cells("s2_coveringcellids(st_point(0, 0))") == Seq(1152921504606846977L))
    def lvl(id: Long): Int = 30 - (java.lang.Long.numberOfTrailingZeros(id) >> 1)
    val line = "st_geomfromwkt('LINESTRING (0 0, 100 50)')"
    val dflt = cells(s"s2_coveringcellids($line)")
    assert(dflt.nonEmpty && dflt.size <= 8 && dflt.forall(id => lvl(id) <= 30))
    val min4 = cells(s"s2_coveringcellids($line, 4)")
    assert(min4.nonEmpty && min4.forall(id => lvl(id) >= 4))
    val band = cells(s"s2_coveringcellids($line, 4, 6)")
    assert(band.nonEmpty && band.forall(id => lvl(id) >= 4 && lvl(id) <= 6))
    // budget is respected when the region genuinely fits it (our covering
    // is envelope-conservative, so the reference's 100-degree line would
    // legitimately need one cell per touched face)
    val two = cells(
      "s2_coveringcellids(st_geomfromwkt('LINESTRING (0 0, 1 1)'), 0, 30, 2)")
    assert(two.nonEmpty && two.size <= 2)
    // the covering really covers: probe leaves sit inside some cell
    def contains(cell: Long, leaf: Long): Boolean = {
      val lsb = java.lang.Long.lowestOneBit(cell)
      leaf >= cell - lsb + 1 && leaf <= cell + lsb - 1
    }
    for (cov <- Seq(dflt, min4, band);
         pt <- Seq("st_point(0, 0)", "st_point(100, 50)", "st_point(50, 28)")) {
      val leaf = q(s"s2_cellidfrompoint($pt)").asInstanceOf[Long]
      assert(cov.exists(c => contains(c, leaf)), s"$pt not covered in $cov")
    }
  }

  test("geography distance anchors (tests/geography/test_geog_distance.py)") {
    // the reference's S2 radius is 6371010.0 m, ours is the IUGG mean
    // 6371008.8 — a 1.9e-7 relative constant; compare at 1e-6 relative
    def ds(a: String, b: String): Double =
      q(s"st_distancesphere(st_geomfromwkt('$a'), st_geomfromwkt('$b'))")
        .asInstanceOf[Double]
    def rel(got: Double, want: Double): Boolean =
      math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want))
    assert(ds("POINT (0 0)", "POINT (0 0)") == 0.0)
    assert(rel(ds("POINT (0 0)", "POINT (0 1)"), 111195.10117748393))
    // wraparound longitude: 360 ≡ 0, so this is pole distance
    assert(rel(ds("POINT (0 0)", "POINT (360 90)"), 10007559.105973553))
    // point on / off a meridian segment
    assert(math.abs(ds("POINT (0 0.5)", "LINESTRING (0 0, 0 1)")) < 1.0)
    assert(rel(ds("POINT (1 0)", "LINESTRING (0 0, 0 1)"), 111195.10117748393))
  }

  test("aggregate envelope/union on a geometry column (test_aggregate.py)") {
    spark.sql(
      """SELECT st_makeenvelope(CAST(id AS DOUBLE), 0.0,
        |CAST(id AS DOUBLE) + 1.0, 1.0) AS g FROM range(4)""".stripMargin)
      .createOrReplaceTempView("agg_boxes")
    val env = q("(SELECT st_astext(st_envelope_agg(g)) FROM agg_boxes)")
    assert(env == q("st_astext(st_makeenvelope(0,0,4,1))"),
      s"envelope_agg: $env")
    val ua = q("(SELECT st_area(st_union_agg(g)) FROM agg_boxes)")
    assert(ua == 4.0, s"union_agg area: $ua")
  }

  test("sd_order: empties sort after every located geometry, NULL passthrough " +
      "(functions/test_order.py)") {
    // reference contract: ORDER BY sd_order(geometry) puts geometries in
    // curve order, EMPTY after all of them, NULL per engine null placement
    val rows = spark.sql(
      """SELECT wkt, sd_order(st_geomfromwkt(wkt)) AS k FROM VALUES
        |  ('POINT EMPTY'), ('POINT (-80 -80)'), ('POINT (80 80)'),
        |  ('POINT (-79 -79)'), (CAST(NULL AS STRING)) AS t(wkt)""".stripMargin)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(rows(null) == null)
    val empty = rows("POINT EMPTY").asInstanceOf[Long]
    val located = Seq("POINT (-80 -80)", "POINT (80 80)", "POINT (-79 -79)")
      .map(rows(_).asInstanceOf[Long])
    assert(located.forall(_ < empty), s"empty key $empty must exceed $located")
    // nearby points get nearby keys (clustering property)
    val k80 = rows("POINT (-80 -80)").asInstanceOf[Long]
    val k79 = rows("POINT (-79 -79)").asInstanceOf[Long]
    val kOpp = rows("POINT (80 80)").asInstanceOf[Long]
    assert(math.abs(k80 - k79) < math.abs(k80 - kOpp))
  }

  test("ST_AsBinary exact bytes incl. EMPTY encodings " +
      "(geography/test_constructors_parsers_formatters.py)") {
    def hex(expr: String): String =
      q(s"hex(st_asbinary($expr))").asInstanceOf[String].toLowerCase
    // POINT EMPTY serializes as POINT (NaN NaN) — the PostGIS/reference pin
    assert(hex("st_geomfromwkt('POINT EMPTY')") ==
      "0101000000000000000000f87f000000000000f87f")
    assert(hex("st_geomfromwkt('POINT (1 1)')") ==
      "0101000000000000000000f03f000000000000f03f")
    // LINESTRING EMPTY is a zero-count body, not NaNs
    assert(hex("st_geomfromwkt('LINESTRING EMPTY')") == "010200000000000000")
    assert(hex("st_geomfromwkt('LINESTRING (0 0, 1 2, 3 4)')") ==
      "010200000003000000" + "0"*16 + "0"*16 +
      "000000000000f03f0000000000000040" +
      "00000000000008400000000000001040")
    // ISO ZM type code: 3000 + 1 = 0x0bb9 little-endian
    assert(hex("st_geomfromwkt('POINT ZM (0 0 0 0)')") ==
      "01b90b0000" + "0"*64)
    // collection: nested headers byte-for-byte
    assert(hex("st_geomfromwkt('GEOMETRYCOLLECTION (POINT (0 0), " +
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))')") ==
      "010700000002000000" +
      "0101000000" + "0"*32 +
      "010300000001000000050000000000000000000000000000000000000000000000" +
      "0000f03f0000000000000000000000000000f03f000000000000f03f000000000" +
      "0000000000000000000f03f00000000000000000000000000000000")
  }

  test("spherical overlay empty/disjoint semantics (geography/test_geog_overlay.py)") {
    def wkt(expr: String): String = q(s"st_astext($expr)").asInstanceOf[String]
    def g(w: String) = s"st_geomfromwkt('$w')"
    // empty inputs: intersection -> GC EMPTY; difference keeps a non-empty
    // minuend; union/symdifference return the other side
    assert(wkt(s"st_intersectionsphere(${g("POINT EMPTY")}, ${g("POINT EMPTY")})")
      == "GEOMETRYCOLLECTION EMPTY")
    assert(wkt(s"st_intersectionsphere(${g("POINT (0 0)")}, ${g("POINT EMPTY")})")
      == "GEOMETRYCOLLECTION EMPTY")
    assert(wkt(s"st_intersectionsphere(${g("POLYGON EMPTY")}, " +
      s"${g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")})") == "GEOMETRYCOLLECTION EMPTY")
    assert(wkt(s"st_differencesphere(${g("POINT EMPTY")}, ${g("POINT (0 0)")})")
      == "GEOMETRYCOLLECTION EMPTY")
    assert(wkt(s"st_differencesphere(${g("POINT (0 0)")}, ${g("POINT EMPTY")})")
      == "POINT (0 0)")
    assert(wkt(s"st_unionsphere(${g("POINT EMPTY")}, ${g("POINT (0 0)")})")
      == "POINT (0 0)")
    assert(wkt(s"st_unionsphere(${g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")}, " +
      s"${g("POLYGON EMPTY")})") == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    // disjoint coverings: typed empty intersection by min dimension
    assert(wkt(s"st_intersectionsphere(${g("LINESTRING (0 0, 10 0)")}, " +
      s"${g("LINESTRING (0 10, 10 10)")})") == "LINESTRING EMPTY")
    assert(wkt(s"st_intersectionsphere(${g("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))")}, " +
      s"${g("POLYGON ((10 10, 15 10, 15 15, 10 15, 10 10))")})") == "POLYGON EMPTY")
    assert(wkt(s"st_intersectionsphere(${g("LINESTRING (20 0, 30 0)")}, " +
      s"${g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")})") == "LINESTRING EMPTY")
    // very-far difference is exact via the covering short-circuit, even
    // though a combined tangent chart would be degenerate
    assert(wkt(s"st_differencesphere(${g("POINT (0 0)")}, ${g("POINT (180 0)")})")
      == "POINT (0 0)")
    assert(wkt(s"st_differencesphere(${g("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))")}, " +
      s"${g("POLYGON ((170 -5, 175 -5, 175 0, 170 0, 170 -5))")})")
      == "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))")
    // disjoint symdifference collects without an overlay
    assert(wkt(s"st_symdifferencesphere(${g("LINESTRING (0 0, 10 0)")}, " +
      s"${g("LINESTRING (0 10, 10 10)")})")
      == "MULTILINESTRING ((0 0, 10 0), (0 10, 10 10))")
  }

  test("spherical centroid: exact S2 vector integrals " +
      "(geography/test_geog_transformations.py)") {
    def cen(w: String): String =
      q(s"st_astext(st_centroidsphere(st_geomfromwkt('$w')))").asInstanceOf[String]
    def xy(w: String): (Double, Double) = {
      val r = spark.sql("SELECT st_x(c) x, st_y(c) y FROM (SELECT " +
        s"st_centroidsphere(st_geomfromwkt('$w')) c)").collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    // empties -> GEOMETRYCOLLECTION EMPTY
    for (w <- Seq("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY"))
      assert(cen(w) == "GEOMETRYCOLLECTION EMPTY", w)
    assert(cen("POINT (0 1)") == "POINT (0 1)")
    // meridian lines: length-weighted midpoint
    val (lx, ly) = xy("LINESTRING (0 0, 0 1)")
    assert(math.abs(lx) < 1e-12 && math.abs(ly - 0.5) < 1e-9)
    val (l2x, l2y) = xy("LINESTRING (0 0, 0 1, 0 5)")
    assert(math.abs(l2x) < 1e-12 && math.abs(l2y - 2.5) < 1e-9)
    val (mpx, mpy) = xy("MULTIPOINT ((0 0), (0 1))")
    assert(math.abs(mpx) < 1e-12 && math.abs(mpy - 0.5) < 1e-9)
    // reference's S2 triangle pin at 1e-6 (exact surface integral)
    val (tx, ty) = xy("POLYGON ((0 0, 0 1, 1 0, 0 0))")
    assert(math.abs(tx - 0.3333498812) < 1e-6, s"tx=$tx")
    assert(math.abs(ty - 0.3333442395) < 1e-6, s"ty=$ty")
    // square polygon centroid ~ (0.5, 0.5)
    val (sx2, sy2) = xy("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(math.abs(sx2 - 0.5) < 1e-4 && math.abs(sy2 - 0.5) < 1e-4)
    // pole: symmetric line about the pole centroids to lat 90
    val (_, py) = xy("LINESTRING (-90 80, -90 85, 90 80)")
    assert(math.abs(py - 90.0) < 1e-6, s"py=$py")
    // ZM interpolation rides the same weights
    assert(cen("POINT ZM (0 1 10 20)").replace("ZM(", "ZM (") == "POINT ZM (0 1 10 20)")
    val zm = cen("MULTIPOINT ZM ((0 0 10 20), (0 1 11 21))")
    assert(zm.startsWith("POINT ZM(0 0.5") && zm.contains("10.5") &&
      zm.contains("20.5"), zm)
    val lz = cen("LINESTRING Z (0 0 10, 0 1 11, 0 5 15)")
    assert(lz.startsWith("POINT Z(0 2.5") && lz.contains("12.5"), lz)
    // mixed collection: highest dimension wins (S2 rule)
    val (gx, gy) = xy("GEOMETRYCOLLECTION (POINT (50 50), LINESTRING (0 0, 0 1))")
    assert(math.abs(gx) < 1e-12 && math.abs(gy - 0.5) < 1e-9, s"($gx,$gy)")
  }

  test("geography convex hull + point-on-surface (test_geog_transformations.py)") {
    def wkt(expr: String): String = q(s"st_astext($expr)").asInstanceOf[String]
    def g(w: String) = s"st_geomfromwkt('$w')"
    def norm(expr: String): Any = q(s"st_astext(st_normalize($expr))")
    // hull: vertex selection, original coordinates verbatim
    assert(wkt(s"st_convexhullsphere(${g("POINT (0 1)")})") == "POINT (0 1)")
    assert(norm(s"st_convexhullsphere(${g("MULTIPOINT ((0 0), (0 1), (1 0))")})") ==
      norm(s"${g("POLYGON ((0 0, 1 0, 0 1, 0 0))")}"))
    assert(norm(s"st_convexhullsphere(${g("POLYGON ((0 0, 0 2, 2 0, 0 0), (0.1 0.1, 0.1 0.5, 0.5 0.1, 0.1 0.1))")})") ==
      norm(s"${g("POLYGON ((0 0, 2 0, 0 2, 0 0))")}"))
    assert(norm(s"st_convexhullsphere(${g("GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 0 1), POLYGON ((0 0, 0 1, 1 0, 0 0)))")})") ==
      norm(s"${g("POLYGON ((0 0, 1 0, 5 5, 0 1, 0 0))")}"))
    // degenerate: typed empty in -> out; 2 points -> LINESTRING; colinear collapses
    assert(wkt(s"st_convexhullsphere(${g("LINESTRING EMPTY")})") == "LINESTRING EMPTY")
    assert(wkt(s"st_convexhullsphere(${g("POLYGON EMPTY")})") == "POLYGON EMPTY")
    assert(wkt(s"st_convexhullsphere(${g("MULTIPOINT ((0 0), (0 1))")})") ==
      "LINESTRING (0 0, 0 1)")
    assert(wkt(s"st_convexhullsphere(${g("LINESTRING (0 0, 0 1, 0 2)")})") ==
      "LINESTRING (0 0, 0 2)")
    // point-on-surface: nearest vertex to the spherical centroid, later
    // vertex on ties; Z/M carried
    assert(wkt(s"st_pointonsurfacesphere(${g("POINT (0 1)")})") == "POINT (0 1)")
    assert(wkt(s"st_pointonsurfacesphere(${g("MULTIPOINT ((0 0), (0 1))")})") == "POINT (0 1)")
    assert(wkt(s"st_pointonsurfacesphere(${g("LINESTRING (0 0, 0 1)")})") == "POINT (0 1)")
    assert(wkt(s"st_pointonsurfacesphere(${g("LINESTRING (0 0, 0 1, 0 5)")})") == "POINT (0 1)")
    assert(wkt(s"st_pointonsurfacesphere(${g("POINT ZM (0 1 10 20)")})")
      .replace("ZM(", "ZM (") == "POINT ZM (0 1 10 20)")
    assert(wkt(s"st_pointonsurfacesphere(${g("LINESTRING ZM (0 0 10 20, 0 1 11 21)")})")
      .replace("ZM(", "ZM (") == "POINT ZM (0 1 11 21)")
    assert(wkt(s"st_pointonsurfacesphere(${g("POINT EMPTY")})") == "POINT EMPTY")
    assert(wkt(s"st_pointonsurfacesphere(${g("POLYGON EMPTY")})") == "POINT EMPTY")
    // polygon: an interior point (tangent-plane pick, documented)
    val ip = q("st_astext(st_pointonsurfacesphere(st_geomfromwkt(" +
      "'POLYGON ((0 0, 0 1, 1 0, 0 0))')))").asInstanceOf[String]
    assert(q(s"st_contains(st_geomfromwkt('POLYGON ((0 0, 0 1, 1 0, 0 0))'), " +
      s"st_geomfromwkt('$ip'))") == true, ip)
  }
}
