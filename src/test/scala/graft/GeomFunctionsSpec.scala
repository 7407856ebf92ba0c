package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.{CrsTransform, SpaceCurve}
import graft.geom.GeomIO

/** Unit layer for the ST_* surface: WKT in → SQL function → WKT/scalar out,
  * the ScalarUdfTester pattern from the reference
  * (rust/sedona-testing/src/testers.rs:252).
  */
class GeomFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Evaluate a scalar SQL expression over a single-row frame. */
  private def q(expr: String): Any =
    spark.sql(s"SELECT $expr AS r").collect()(0).get(0)

  test("sd_random_geometry table function: schema, determinism, types") {
    val sql = """SELECT * FROM sd_random_geometry(
      '{"num_rows": 256, "seed": 7, "geometry_type": "box", "num_partitions": 2}')"""
    val df = spark.sql(sql)
    assert(df.columns.toSeq == Seq("id", "dist", "geometry"))
    assert(df.count() == 256)
    val a = df.selectExpr("sum(st_area(geometry))").collect()(0).getDouble(0)
    val b = spark.sql(sql).selectExpr("sum(st_area(geometry))").collect()(0).getDouble(0)
    assert(a == b && a > 0) // seeded → identical across invocations
    val pts = spark.sql(
      """SELECT st_geometrytype(geometry) t FROM sd_random_geometry('{"num_rows": 8, "seed": 1}')""")
      .collect().map(_.getString(0)).toSet
    assert(pts == Set("ST_Point"))
  }

  test("sd_random_geometry option parity: geom_type, rates, parts, vertices " +
      "(reference random_geometry_provider.rs options)") {
    def types(opts: String): Map[String, Long] = spark.sql(
      s"""SELECT CASE WHEN geometry IS NULL THEN 'NULL'
         |  WHEN st_isempty(geometry) THEN 'EMPTY'
         |  ELSE st_geometrytype(geometry) END t, count(*) c
         |FROM sd_random_geometry('$opts') GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // canonical geom_type key, every supported type
    assert(types("""{"num_rows": 50, "seed": 5, "geom_type": "Polygon"}""")
      == Map("ST_Polygon" -> 50L))
    assert(types("""{"num_rows": 50, "seed": 5, "geom_type": "LineString"}""")
      == Map("ST_LineString" -> 50L))
    assert(types("""{"num_rows": 50, "seed": 5, "geom_type": "MultiPoint",
      "num_parts": [2, 5]}""") == Map("ST_MultiPoint" -> 50L))
    assert(types("""{"num_rows": 50, "seed": 5, "geom_type": "MultiPolygon",
      "num_parts": 3}""") == Map("ST_MultiPolygon" -> 50L))
    // null / empty rates produce roughly the requested fractions
    val mixed = types("""{"num_rows": 400, "seed": 6, "geom_type": "Point",
      "null_rate": 0.25, "empty_rate": 0.25}""")
    assert(mixed.keySet == Set("NULL", "EMPTY", "ST_Point"))
    assert(mixed("NULL") > 50 && mixed("NULL") < 150, mixed)
    assert(mixed("EMPTY") > 50 && mixed("EMPTY") < 150, mixed)
    // hole_rate: some polygons gain interior rings, and every holed
    // polygon is VALID (hole strictly inside the shell — the hole shares
    // the shell's center and size draw, max hole radius 0.2*sz < 0.25*sz
    // shell inscribed distance)
    val holed = spark.sql(
      """SELECT st_numinteriorrings(geometry) h, st_isvalid(geometry) v
        |FROM sd_random_geometry('{"num_rows": 200, "seed": 8,
        |  "geom_type": "Polygon", "hole_rate": 0.5}')""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getBoolean(1)))
    assert(holed.count(_._1 == 1) > 40 && holed.count(_._1 == 0) > 40)
    assert(holed.forall(_._2), s"invalid holed polygons: ${holed.count(!_._2)}")
    // empty_rate applies on the box/envelope path too
    val boxMixed = types("""{"num_rows": 400, "seed": 6,
      "geom_type": "box", "empty_rate": 0.25}""")
    assert(boxMixed.keySet == Set("EMPTY", "ST_Polygon"), boxMixed)
    assert(boxMixed("EMPTY") > 50 && boxMixed("EMPTY") < 150, boxMixed)
    // num_parts range respected
    val parts = spark.sql(
      """SELECT st_numgeometries(geometry) p
        |FROM sd_random_geometry('{"num_rows": 100, "seed": 9,
        |  "geom_type": "MultiPoint", "num_parts": [2, 5]}')""".stripMargin)
      .collect().map(_.getInt(0))
    assert(parts.forall(p => p >= 2 && p <= 5) && parts.distinct.length > 1)
    // num_vertices range drives linestring vertex counts
    val nv = spark.sql(
      """SELECT st_npoints(geometry) v
        |FROM sd_random_geometry('{"num_rows": 100, "seed": 10,
        |  "geom_type": "LineString", "num_vertices": [2, 6]}')""".stripMargin)
      .collect().map(_.getInt(0))
    assert(nv.forall(v => v >= 2 && v <= 6) && nv.distinct.length > 1)
    // unknown keys are ignored (reference serde behavior)
    assert(types("""{"num_rows": 10, "seed": 5, "geom_type": "Point",
      "polygon_hole_rate": 0.5, "unknown_key": 1}""") == Map("ST_Point" -> 10L))
  }

  test("st_covered_by snake alias matches st_coveredby, incl. join planning") {
    assert(q("st_covered_by(st_point(1,1), st_makeenvelope(0,0,2,2))") == true)
    assert(q("st_covered_by(st_point(5,5), st_makeenvelope(0,0,2,2))") == false)
    spark.sql(
      """SELECT id, geometry FROM sd_random_geometry('{"num_rows": 64, "seed": 3}')""")
      .createOrReplaceTempView("rg_pts")
    spark.sql(
      """SELECT id, geometry FROM sd_random_geometry(
        '{"num_rows": 32, "seed": 4, "geometry_type": "box"}')""")
      .createOrReplaceTempView("rg_boxes")
    val a = spark.sql(
      "SELECT count(*) FROM rg_pts p, rg_boxes b WHERE st_covered_by(p.geometry, b.geometry)")
      .collect()(0).getLong(0)
    val b = spark.sql(
      "SELECT count(*) FROM rg_pts p, rg_boxes b WHERE st_coveredby(p.geometry, b.geometry)")
      .collect()(0).getLong(0)
    assert(a == b)
  }

  test("constructors and formatters round-trip") {
    assert(q("st_astext(st_geomfromwkt('POINT (1 2)'))") == "POINT (1 2)")
    assert(q("st_astext(st_geomfromwkb(st_asbinary(st_point(3.5, -2.25))))") == "POINT (3.5 -2.25)")
    assert(q("st_astext(st_geomfromewkt('SRID=4326;POINT (1 2)'))") == "POINT (1 2)")
    assert(q("st_srid(st_geomfromewkt('SRID=4326;POINT (1 2)'))") == 4326)
    assert(q("st_srid(st_setsrid(st_point(1,2), 3857))") == 3857)
    assert(q("st_astext(st_makeenvelope(0,0,2,3))") == "POLYGON ((0 0, 0 3, 2 3, 2 0, 0 0))")
    assert(q("st_asgeojson(st_point(1.5, 2))") == """{"type":"Point","coordinates":[1.5,2]}""")
    assert(q("st_astext(st_pointz(1,2,3))") == "POINT Z(1 2 3)")
    assert(q("st_hasz(st_pointz(1,2,3))") == true)
    assert(q("st_astext(st_force2d(st_pointz(1,2,3)))") == "POINT (1 2)")
    intercept[Exception](q("st_pointfromtext('LINESTRING (0 0, 1 1)')"))
  }

  test("geojson round trip both directions") {
    val wkts = Seq(
      "POINT (1.5 2)", "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
      "MULTIPOINT ((1 2), (3 4))", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    wkts.foreach { w =>
      val rt = q(s"st_astext(st_geomfromgeojson(st_asgeojson(st_geomfromwkt('$w'))))")
      assert(rt == w, s"roundtrip of $w gave $rt")
    }
  }

  test("predicates: symmetry and known relations") {
    val a = "st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')"
    val inner = "st_geomfromwkt('POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))')"
    assert(q(s"st_contains($a, $inner)") == true)
    assert(q(s"st_within($inner, $a)") == true)
    assert(q(s"st_covers($a, $inner)") == true)
    assert(q(s"st_coveredby($inner, $a)") == true)
    assert(q(s"st_overlaps($a, $inner)") == false)
    assert(q(s"st_intersects($a, $inner)") == true)
    assert(q(s"st_disjoint($a, $inner)") == false)
    // boundary point: covers true, contains false
    val bp = "st_point(0, 5)"
    assert(q(s"st_contains($a, $bp)") == false)
    assert(q(s"st_covers($a, $bp)") == true)
    val line1 = "st_geomfromwkt('LINESTRING (0 0, 10 10)')"
    val line2 = "st_geomfromwkt('LINESTRING (0 10, 10 0)')"
    assert(q(s"st_crosses($line1, $line2)") == true)
    assert(q(s"st_relate($line1, $line2)") == "0F1FF0102")
    assert(q(s"st_relatematch($line1, $line2, '0FFFFFFF2')") == false)
    assert(q(s"st_equals($a, st_geomfromwkt('POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))'))") == true)
  }

  test("overlay ops") {
    val a = "st_makeenvelope(0,0,4,4)"
    val b = "st_makeenvelope(2,0,6,4)"
    assert(q(s"st_area(st_intersection($a, $b))") == 8.0)
    assert(q(s"st_area(st_union($a, $b))") == 24.0)
    assert(q(s"st_area(st_difference($a, $b))") == 8.0)
    assert(q(s"st_area(st_symdifference($a, $b))") == 16.0)
    assert(q(s"st_area(st_unaryunion(st_geomfromwkt('MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((2 0, 6 0, 6 4, 2 4, 2 0)))')))") == 24.0)
  }

  test("processing: simplify, makevalid, convexhull, concavehull, snap, segmentize") {
    assert(q("st_astext(st_simplify(st_geomfromwkt('LINESTRING (0 0, 1 0.01, 2 0, 4 0)'), 0.5))")
      == "LINESTRING (0 0, 4 0)")
    assert(q("st_npoints(st_simplifypreservetopology(st_geomfromwkt('LINESTRING (0 0, 1 0.01, 2 0)'), 0.5))") == 2)
    // bowtie → fixed into valid geometry with half the bbox area
    assert(q("st_isvalid(st_geomfromwkt('POLYGON ((0 0, 4 0, 0 4, 4 4, 0 0))'))") == false)
    assert(q("st_area(st_makevalid(st_geomfromwkt('POLYGON ((0 0, 4 0, 0 4, 4 4, 0 0))')))") == 8.0)
    assert(q("st_isvalid(st_makevalid(st_geomfromwkt('POLYGON ((0 0, 4 0, 0 4, 4 4, 0 0))')))") == true)
    assert(q("st_astext(st_convexhull(st_geomfromwkt('MULTIPOINT ((0 0), (4 0), (2 1), (2 4))')))")
      == "POLYGON ((0 0, 2 4, 4 0, 0 0))")
    assert(q("st_area(st_concavehull(st_geomfromwkt('MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 2))'), 1.0))") == 16.0)
    assert(q("st_npoints(st_segmentize(st_geomfromwkt('LINESTRING (0 0, 10 0)'), 2.5))") == 5)
    assert(q("st_astext(st_snap(st_geomfromwkt('LINESTRING (0 0, 2 2)'), st_point(2.05, 2.05), 0.1))")
      == "LINESTRING (0 0, 2.05 2.05)")
  }

  test("linear referencing") {
    val l = "st_geomfromwkt('LINESTRING (0 0, 10 0)')"
    assert(q(s"st_astext(st_lineinterpolatepoint($l, 0.3))") == "POINT (3 0)")
    assert(q(s"st_linelocatepoint($l, st_point(7, 1))") == 0.7)
    assert(q(s"st_astext(st_linesubstring($l, 0.2, 0.5))") == "LINESTRING (2 0, 5 0)")
    assert(q(s"st_astext(st_startpoint($l))") == "POINT (0 0)")
    assert(q(s"st_astext(st_endpoint($l))") == "POINT (10 0)")
    assert(q(s"st_isclosed($l)") == false)
    assert(q("st_isring(st_geomfromwkt('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") == true)
  }

  test("measures: hausdorff, maxdistance, perimeter, minimumclearance") {
    assert(q("st_hausdorffdistance(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_geomfromwkt('LINESTRING (0 3, 10 3)'))") == 3.0)
    assert(q("st_maxdistance(st_makeenvelope(0,0,1,1), st_makeenvelope(4,4,5,5))") == math.sqrt(50))
    assert(q("st_perimeter(st_makeenvelope(0,0,3,4))") == 14.0)
    assert(q("st_length(st_makeenvelope(0,0,3,4))") == 0.0)
    assert(q("st_minimumclearance(st_makeenvelope(0,0,3,4))") == 3.0)
  }

  test("affine family") {
    assert(q("st_astext(st_translate(st_point(1,2), 10, 20))") == "POINT (11 22)")
    assert(q("st_astext(st_scale(st_point(2,3), 2, 4))") == "POINT (4 12)")
    val rot = q("st_astext(st_rotate(st_point(1,0), pi()/2))").toString
    assert(rot.startsWith("POINT (") && q("st_y(st_rotate(st_point(1,0), pi()/2))").asInstanceOf[Double] > 0.999)
    assert(q("st_astext(st_affine(st_point(1,2), 1, 0, 5, 0, 1, 7))") == "POINT (6 9)")
    assert(q("st_astext(st_flipcoordinates(st_point(1,2)))") == "POINT (2 1)")
  }

  test("collection ops: dump, points, collectionextract, geometryn, boundary") {
    assert(q("size(st_dump(st_geomfromwkt('GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))')))") == 2)
    assert(q("st_astext(st_points(st_geomfromwkt('LINESTRING (0 0, 1 1)')))") == "MULTIPOINT ((0 0), (1 1))")
    assert(q("st_astext(st_collectionextract(st_geomfromwkt('GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))'), 1))") == "MULTIPOINT ((1 2))")
    assert(q("st_astext(st_boundary(st_geomfromwkt('LINESTRING (0 0, 5 5)')))") == "MULTIPOINT ((0 0), (5 5))")
    assert(q("st_numinteriorrings(st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))'))") == 1)
    assert(q("st_astext(st_exteriorring(st_makeenvelope(0,0,1,1)))") == "LINESTRING (0 0, 0 1, 1 1, 1 0, 0 0)")
    assert(q("st_nrings(st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))'))") == 2)
  }

  test("polygonize, linemerge, delaunay, reduceprecision, normalize, reverse") {
    assert(q("st_area(st_polygonize(st_geomfromwkt('MULTILINESTRING ((0 0, 4 0), (4 0, 4 4), (4 4, 0 0))')))") == 8.0)
    assert(q("st_astext(st_linemerge(st_geomfromwkt('MULTILINESTRING ((0 0, 2 2), (2 2, 4 4))')))") == "LINESTRING (0 0, 2 2, 4 4)")
    assert(q("st_numgeometries(st_delaunaytriangles(st_geomfromwkt('MULTIPOINT ((0 0), (4 0), (0 4), (4 4))')))") == 2)
    assert(q("st_astext(st_reduceprecision(st_point(1.2345, 2.3456), 10))") == "POINT (1.2 2.3)")
    assert(q("st_astext(st_reverse(st_geomfromwkt('LINESTRING (0 0, 1 1, 2 0)')))") == "LINESTRING (2 0, 1 1, 0 0)")
  }

  test("structural editors: multi, orientation, point edits, angle") {
    assert(q("st_astext(st_multi(st_point(1,2)))") == "MULTIPOINT ((1 2))")
    assert(q("st_numgeometries(st_forcecollection(st_geomfromwkt('MULTIPOINT ((1 2), (3 4))')))") == 2)
    assert(q("st_astext(st_forcepolygonccw(st_geomfromwkt('POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))')))")
      == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(q("st_astext(st_forcepolygoncw(st_geomfromwkt('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))")
      == "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")
    assert(q("st_npoints(st_removerepeatedpoints(st_geomfromwkt('LINESTRING (0 0, 0 0, 1 1, 1 1, 2 2)')))") == 3)
    assert(q("st_astext(st_addpoint(st_geomfromwkt('LINESTRING (0 0, 2 2)'), st_point(1, 1), 1))")
      == "LINESTRING (0 0, 1 1, 2 2)")
    assert(q("st_astext(st_removepoint(st_geomfromwkt('LINESTRING (0 0, 1 1, 2 2)'), 1))")
      == "LINESTRING (0 0, 2 2)")
    assert(q("st_astext(st_setpoint(st_geomfromwkt('LINESTRING (0 0, 1 1)'), -1, st_point(5, 5)))")
      == "LINESTRING (0 0, 5 5)")
    assert(q("st_angle(st_point(1,0), st_point(0,0), st_point(0,1))") == math.Pi / 2)
    assert(q("st_ndims(st_pointz(1,2,3))") == 3)
    assert(q("st_zmflag(st_point(1,2))") == 0)
    assert(q("st_zmflag(st_pointz(1,2,3))") == 2)
    assert(q("st_summary(st_makeenvelope(0,0,1,1))").toString.startsWith("Polygon with 5 points"))
  }

  test("split and subdivide") {
    assert(q("st_astext(st_split(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(4, 0)))")
      == "MULTILINESTRING ((0 0, 4 0), (4 0, 10 0))")
    assert(q("st_numgeometries(st_split(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_geomfromwkt('LINESTRING (5 -1, 5 1)')))") == 2)
    assert(q("st_numgeometries(st_split(st_makeenvelope(0,0,10,10), st_geomfromwkt('LINESTRING (5 -1, 5 11)')))") == 2)
    assert(q("st_area(st_split(st_makeenvelope(0,0,10,10), st_geomfromwkt('LINESTRING (5 -1, 5 11)')))") == 100.0)
    // subdivide: pieces small, total area preserved
    assert(q("size(st_subdivide(st_geomfromwkt('POLYGON ((0 0, 16 0, 16 16, 0 16, 0 0), (2 2, 14 2, 14 14, 2 14, 2 2))'), 6))").asInstanceOf[Int] > 1)
    assert(q("aggregate(transform(st_subdivide(st_geomfromwkt('POLYGON ((0 0, 16 0, 16 16, 0 16, 0 0))'), 5), g -> st_area(g)), cast(0.0 as double), (acc, x) -> acc + x)") == 256.0)
  }

  test("3D axis rotations and storage simplify") {
    // rotate POINT Z(1 2 3) by pi/2 around X: (x, y, z) -> (x, -z, y)
    def near(e: String, v: Double): Unit =
      assert(math.abs(q(e).asInstanceOf[Double] - v) < 1e-12, e)
    near("st_x(st_rotatex(st_pointz(1,2,3), pi()/2))", 1.0)
    near("st_y(st_rotatex(st_pointz(1,2,3), pi()/2))", -3.0)
    near("st_z(st_rotatex(st_pointz(1,2,3), pi()/2))", 2.0)
    // rotate around Y: (x, y, z) -> (z, y, -x)
    near("st_x(st_rotatey(st_pointz(1,2,3), pi()/2))", 3.0)
    near("st_y(st_rotatey(st_pointz(1,2,3), pi()/2))", 2.0)
    near("st_z(st_rotatey(st_pointz(1,2,3), pi()/2))", -1.0)
    // 2D input: z treated as 0, result carries z
    assert(q("st_z(st_rotatex(st_point(1,2), pi()/2))")
      .asInstanceOf[Double] == 2.0)
    // storage simplify drops collinear detail but keeps topology
    assert(q("st_npoints(sd_simplifystorage(st_geomfromwkt(" +
      "'LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)'), 0.1))") == 2)
  }

  test("user scalar registration: custom geometry kernel in SQL") {
    import org.apache.spark.sql.types.DoubleType
    import graft.functions.{ArgKind, GraftFunctions}
    GraftFunctions.registerScalar(spark, "my_inflated_area", DoubleType,
      Seq(ArgKind.Geom, ArgKind.Dbl)) { a =>
      a(0).asInstanceOf[org.locationtech.jts.geom.Geometry]
        .buffer(a(1).asInstanceOf[Double]).getArea
    }
    val area = q("my_inflated_area(st_makeenvelope(0,0,2,2), 1.0)")
      .asInstanceOf[Double]
    // 4x4 core + 4 edge strips (2x1) + rounded corners (~pi)
    assert(area > 4.0 + 8.0 + 3.0 && area < 4.0 + 8.0 + math.Pi + 0.01, area)
    // custom kernel participates in null propagation
    assert(q("my_inflated_area(CAST(NULL AS BINARY), 1.0)") == null)
  }

  test("spherical buffer handles dateline and polar inputs") {
    // a point on the antimeridian buffered 100 km must cover both sides
    val wrapOk = q("st_containssphere(st_buffersphere(st_point(180.0, 10.0), 100000.0)," +
      " st_point(-179.5, 10.0)) AND st_containssphere(" +
      "st_buffersphere(st_point(180.0, 10.0), 100000.0), st_point(179.5, 10.0))")
    assert(wrapOk == true)
    // buffered area ~ pi r^2 (within 2% at this radius)
    val a = q("st_areasphere(st_buffersphere(st_point(180.0, 10.0), 100000.0))")
      .asInstanceOf[Double]
    assert(math.abs(a - math.Pi * 1e10) < 0.02 * math.Pi * 1e10, a.toString)
    // polar cap ring buffered outward still covers the pole
    val cap = "POLYGON ((0 80, 60 80, 120 80, 180 80, -120 80, -60 80, 0 80))"
    assert(q(s"st_containssphere(st_buffersphere(st_geomfromwkt('$cap'), 50000.0)," +
      " st_point(0.0, 90.0))") == true)
  }

  test("convex hull and point-on-surface handle dateline/polar inputs") {
    // hull of points straddling the antimeridian: the short-arc hull,
    // not a chart-wide band — it must NOT contain lon 0
    val hullHas = q("st_containssphere(st_convexhullsphere(st_geomfromwkt(" +
      "'MULTIPOINT (178 -5, -178 -5, 178 5, -178 5)')), st_point(180.0, 0.0))")
    assert(hullHas == true)
    val hullNotHas = q("st_intersectssphere(st_convexhullsphere(st_geomfromwkt(" +
      "'MULTIPOINT (178 -5, -178 -5, 178 5, -178 5)')), st_point(0.0, 0.0))")
    assert(hullNotHas == false)
    // point-on-surface of a dateline quad lands inside it
    assert(q("st_withinsphere(st_pointonsurfacesphere(st_geomfromwkt(" +
      "'POLYGON ((179 10, -179 10, -179 20, 179 20, 179 10))')), st_geomfromwkt(" +
      "'POLYGON ((179 10, -179 10, -179 20, 179 20, 179 10))'))") == true)
  }

  test("geodesic segmentize: pieces bounded, length preserved, dateline-safe") {
    // a 60-degree equatorial edge split to <= 1000 km geodesic pieces
    val n = q("st_npoints(st_segmentizesphere(st_geomfromwkt(" +
      "'LINESTRING (0 0, 60 0)'), 1000000.0))").asInstanceOf[Int]
    assert(n == 8, s"expected 7 pieces + 1, got $n") // 6672 km / 1000 km -> 7
    val len = q("st_lengthsphere(st_segmentizesphere(st_geomfromwkt(" +
      "'LINESTRING (0 0, 60 0)'), 1000000.0))").asInstanceOf[Double]
    val len0 = q("st_lengthsphere(st_geomfromwkt('LINESTRING (0 0, 60 0)'))")
      .asInstanceOf[Double]
    assert(math.abs(len - len0) < 1e-6 * len0)
    // high-latitude edge: inserted points follow the geodesic (bulge
    // poleward of the chart line)
    val midLat = q("st_y(st_pointn(st_segmentizesphere(st_geomfromwkt(" +
      "'LINESTRING (-60 60, 60 60)'), 2000000.0), 2))").asInstanceOf[Double]
    assert(midLat > 65.0, s"geodesic midpoint should bulge poleward, got $midLat")
    // dateline-crossing edge stays a short arc
    val dl = q("st_lengthsphere(st_segmentizesphere(st_geomfromwkt(" +
      "'LINESTRING (179 0, -179 0)'), 50000.0))").asInstanceOf[Double]
    assert(math.abs(dl - 222390.2) < 1.0, s"short-arc length, got $dl")
    intercept[Exception](q("st_segmentizesphere(st_point(0, 0), 0.0)"))
  }

  test("wrap-aware geography envelope aggregate") {
    spark.sql("""SELECT id, st_point(lon, lat) AS g FROM VALUES
      (1, 170.0D, 10.0D), (1, 175.0D, 12.0D), (1, -175.0D, 14.0D),
      (2, 10.0D, 0.0D), (2, 20.0D, 5.0D)
      AS t(id, lon, lat)""").createOrReplaceTempView("esa_in")
    val rows = spark.sql("""SELECT id,
        st_xminsphere(env) AS xmin, st_xmaxsphere(env) AS xmax,
        st_geometrytype(env) AS t
      FROM (SELECT id, st_envelopesphere_agg(g) AS env FROM esa_in GROUP BY id)""")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
      .sortBy(_._1)
    // group 1 straddles the antimeridian: wrapped interval [170, -175],
    // split MULTIPOLYGON; group 2 is a plain chart rect
    assert(rows(0)._2 == 170.0 && rows(0)._3 == -175.0, rows(0).toString)
    assert(rows(0)._4 == "ST_MultiPolygon", rows(0).toString)
    assert(rows(1)._2 == 10.0 && rows(1)._3 == 20.0 && rows(1)._4 == "ST_Polygon")
  }

  test("geodesic line locate point") {
    def ll(line: String, pt: String): Double =
      q(s"st_linelocatepointsphere(st_geomfromwkt('$line'), st_geomfromwkt('$pt'))")
        .asInstanceOf[Double]
    assert(ll("LINESTRING (-60 60, 60 60)", "POINT (-60 60)") == 0.0)
    assert(ll("LINESTRING (-60 60, 60 60)", "POINT (60 60)") == 1.0)
    // the geodesic apex (lon 0, lat ~73.9) sits at the half-length mark
    assert(math.abs(ll("LINESTRING (-60 60, 60 60)", "POINT (0 73.9)") - 0.5) < 1e-3)
    // chart midpoint (0, 60) projects to the apex too (same meridian)
    assert(math.abs(ll("LINESTRING (-60 60, 60 60)", "POINT (0 60)") - 0.5) < 1e-3)
    // dateline-crossing line: point past the antimeridian
    assert(math.abs(ll("LINESTRING (179 0, -179 0)", "POINT (-179.5 1)") - 0.75) < 1e-3)
    intercept[Exception](ll("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)"))
  }

  test("geography closest point / shortest line / general distance") {
    // the exact spherical foot carries ~1e-15 deg FP residue — compare
    // by distance to the expected point, not by WKT text
    assert(q("st_distancesphere(st_closestpointsphere(st_geomfromwkt(" +
      "'LINESTRING (0 0, 10 0)'), st_point(5, 3)), st_point(5, 0))")
      .asInstanceOf[Double] < 1e-6)
    assert(q("st_distancesphere(st_endpoint(st_shortestlinesphere(st_geomfromwkt(" +
      "'LINESTRING (0 0, 10 0)'), st_point(5, 3))), st_point(5, 3))")
      .asInstanceOf[Double] < 1e-6)
    // general-geometry spherical distance = haversine of that pair
    val d = q("st_distancesphere(st_geomfromwkt('LINESTRING (0 0, 10 0)'), st_point(5, 3))")
      .asInstanceOf[Double]
    val expect = q("st_distancesphere(st_point(5, 0), st_point(5, 3))").asInstanceOf[Double]
    assert(math.abs(d - expect) < 1e-6)
  }

  test("tessellate: triangles cover the polygon exactly") {
    assert(q("st_numgeometries(st_tessellate(st_makeenvelope(0,0,4,3)))") == 2)
    assert(q("st_area(st_tessellate(st_makeenvelope(0,0,4,3)))") == 12.0)
    // polygon with a hole: triangle areas still sum to the polygon area
    val poly = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    assert(q(s"st_area(st_tessellate(st_geomfromwkt('$poly')))") == 96.0)
    assert(q(s"st_numgeometries(st_tessellate(st_geomfromwkt('$poly')))")
      .asInstanceOf[Int] >= 8)
  }

  test("measured coordinates: M/ZM construction, forcing, roundtrip") {
    assert(q("st_m(st_pointm(1, 2, 5.5))") == 5.5)
    assert(q("st_m(st_pointzm(1, 2, 3, 7.25))") == 7.25)
    assert(q("st_z(st_pointzm(1, 2, 3, 7.25))") == 3.0)
    // WKB roundtrip preserves M
    assert(q("st_m(st_geomfromwkb(st_asbinary(st_pointm(1, 2, 9.5))))") == 9.5)
    assert(q("st_m(st_geomfromwkb(st_asbinary(st_pointzm(1, 2, 3, 4))))") == 4.0)
    // WKT formatting carries the M/ZM tag and parses back
    val wktM = q("st_astext(st_pointm(1, 2, 9.5))").toString
    assert(wktM.startsWith("POINT M"), wktM)
    assert(q(s"st_m(st_geomfromwkt('$wktM'))") == 9.5)
    // forcing: 2D -> 3DM with default m; zm flags
    assert(q("st_m(st_force3dm(st_point(1, 2), 6.0))") == 6.0)
    assert(q("st_hasm(st_force3dm(st_point(1, 2), 0.0))") == true)
    assert(q("st_m(st_force4d(st_pointz(1, 2, 3), 0.0, 8.0))") == 8.0)
    assert(q("st_z(st_force4d(st_point(1, 2), 5.0, 8.0))") == 5.0)
    assert(q("st_zmflag(st_pointzm(1,2,3,4))") == 3)
    assert(q("st_zmflag(st_pointm(1,2,4))") == 1)
    // line with M through WKB
    assert(q("st_m(st_startpoint(st_geomfromwkb(st_asbinary(" +
      "st_force3dm(st_geomfromwkt('LINESTRING (0 0, 1 1)'), 2.5)))))") == 2.5)
  }

  test("outdb raster: load rule wraps pixel readers only; values correct") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.functions.RasterModel.{Band, Raster}
    val dir = java.nio.file.Files.createTempDirectory("graft_outdb").toFile
    (0 until 3).foreach { i =>
      val vals = Array.tabulate(6)(j => (i * 10 + j).toDouble)
      val r = Raster("EPSG:4326", Array(i * 5.0, 1.0, 0.0, 0.0, 0.0, -1.0), 3, 2,
        Vector(Band(Double.NaN, graft.functions.RasterModel.packDoubles(vals))))
      java.nio.file.Files.write(new java.io.File(dir, s"t$i.tif").toPath,
        graft.sources.GeoTiff.write(r))
    }
    val df = spark.range(3)
      .withColumn("path", concat(lit(s"file:$dir/t"), col("id"), lit(".tif")))
      .withColumn("r", org.apache.spark.sql.functions.call_function("rs_frompath", col("path")))
      .select(col("id"),
        org.apache.spark.sql.functions.call_function("rs_width", col("r")).as("w"),
        org.apache.spark.sql.functions.call_function("rs_bandavg", col("r"), lit(1)).as("bavg"))
    val optimized = df.queryExecution.optimizedPlan.toString
    // pixel reader wrapped, metadata reader not
    assert(optimized.contains("rs_bandavg(rs_bandavg, rs_ensureloaded"), optimized.take(1500))
    assert(!optimized.contains("rs_width(rs_width, rs_ensureloaded"), optimized.take(1500))
    // real bytes through the loader registry: avg of i*10 + (0..5)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(3, 3, 3))
    assert(rows.map(_._3).toSeq == Seq(2.5, 12.5, 22.5))
  }

  test("item-level CRS struct flows through geometry kernels") {
    // construct -> the crs string rides along every geometry-returning
    // kernel; scalar (non-geometry) kernels just unwrap
    val row = spark.sql(
      "SELECT st_itemcrs(st_point(1,2), 'EPSG:3857') AS ic").collect()(0)
    val ic = row.getStruct(0)
    assert(ic.schema.fieldNames.toSeq == Seq("item", "crs"))
    assert(ic.getString(1) == "EPSG:3857")
    // geometry kernel: output stays item-CRS with the same crs
    val buf = spark.sql(
      "SELECT st_buffer(st_itemcrs(st_point(1,2), 'EPSG:3857'), 1.0D) AS b")
      .collect()(0).getStruct(0)
    assert(buf.getString(1) == "EPSG:3857")
    // SRID seeded from the crs string -> st_srid/st_crs see it
    assert(q("st_srid(st_itemcrs(st_point(1,2), 'EPSG:3857'))") == 3857)
    assert(q("st_crs(st_centroid(st_itemcrs(st_point(1,2), 'EPSG:3857')))")
      == "EPSG:3857")
    // scalar kernels unwrap transparently
    assert(q("st_x(st_itemcrs(st_point(1,2), 'EPSG:4326'))") == 1.0)
    assert(q("st_area(st_itemcrs(st_makeenvelope(0,0,2,3), 'EPSG:32632'))") == 6.0)
    // two item args: equal crs fine, mismatch errors
    assert(q("st_intersects(st_itemcrs(st_point(1,1), 'EPSG:4326'), " +
      "st_itemcrs(st_makeenvelope(0,0,2,2), 'EPSG:4326'))") == true)
    val e = intercept[Exception](q(
      "st_distance(st_itemcrs(st_point(1,1), 'EPSG:4326'), " +
        "st_itemcrs(st_point(2,2), 'EPSG:3857'))"))
    assert(e.getMessage.contains("CRS mismatch") ||
      (e.getCause != null && e.getCause.getMessage.contains("CRS mismatch")))
    // raw-bytes outputs are NOT wrapped
    assert(q("st_astext(st_geomfromwkb(st_asbinary(" +
      "st_itemcrs(st_point(3,4), 'EPSG:4326'))))") == "POINT (3 4)")
    // raster footprint carries the raster's crs per row
    val fp = spark.sql(
      "SELECT rs_footprint(rs_setcrs(rs_makeraster(2, 2, 10.0D, 20.0D, 1.0D, " +
        "-1.0D, array(1.0D, 2.0D, 3.0D, 4.0D)), 'EPSG:2154')) AS fp")
      .collect()(0).getStruct(0)
    assert(fp.getString(1) == "EPSG:2154")
    assert(q("st_area(rs_footprint(rs_makeraster(2, 2, 10.0D, 20.0D, 1.0D, " +
      "-1.0D, array(1.0D, 2.0D, 3.0D, 4.0D))))") == 4.0)
  }

  test("outdb raster: missing file and unknown extension fail loudly") {
    import graft.sources.RasterLoaders
    intercept[java.io.FileNotFoundException] {
      RasterLoaders.readMeta("file:/tmp/graft_no_such_file_9z.tif")
    }
    val e = intercept[IllegalArgumentException] {
      RasterLoaders.readMeta("file:/tmp/x.xyzformat")
    }
    assert(e.getMessage.contains("no raster loader"))
  }

  test("outdb raster: a custom registered loader is invoked by rs_ensureloaded") {
    // the registry is pluggable like the reference's
    // (test_raster_loader.py test_py_raster_loader_registration):
    // register a loader for a private extension and drive it end-to-end
    // through rs_frompath + the planner-injected rs_ensureloaded
    import graft.functions.RasterModel.{Band, Raster}
    import graft.sources.RasterLoaders
    RasterLoaders.register("mockfmt", new RasterLoaders.Loader {
      def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster =
        Raster("EPSG:4326", Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), 2, 2, Vector.empty)
      def load(bytes: Array[Byte]): Raster = {
        // pixel values derived from the actual file bytes: proves the
        // loader (not a stub) produced the band
        val v = bytes.map(_.toDouble)
        Raster("EPSG:4326", Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), 2, 2,
          Vector(Band(Double.NaN, graft.functions.RasterModel.packDoubles(v))))
      }
    })
    val f = java.nio.file.Files.createTempFile("graft_mock", ".mockfmt")
    java.nio.file.Files.write(f, Array[Byte](7, 11, 13, 17))
    val row = spark.sql(
      s"SELECT rs_bandavg(rs_frompath('file:$f'), 1) AS a, " +
        s"rs_width(rs_frompath('file:$f')) AS w").collect()(0)
    assert(row.getInt(1) == 2)
    assert(row.getDouble(0) == (7 + 11 + 13 + 17) / 4.0)
  }

  test("UTM transform round-trips within 1e-6 deg") {
    val g = GeomIO.point(9.5, 47.25)
    val utm = CrsTransform.transform(g, "EPSG:4326", "EPSG:32632")
    val back = CrsTransform.transform(utm, "EPSG:32632", "EPSG:4326")
    val c = back.getCoordinate
    assert(math.abs(c.x - 9.5) < 1e-6, s"lon ${c.x}")
    assert(math.abs(c.y - 47.25) < 1e-6, s"lat ${c.y}")
    // known value: CN Tower, UTM zone 17N = 630084 E, 4833438 N
    val cn = CrsTransform.transform(
      GeomIO.point(-79.387139, 43.642567), "EPSG:4326", "EPSG:32617").getCoordinate
    assert(math.abs(cn.x - 630084.3) < 2.0, s"easting ${cn.x}")
    assert(math.abs(cn.y - 4833438.6) < 2.0, s"northing ${cn.y}")
    // southern hemisphere
    val s = CrsTransform.transform(GeomIO.point(-58.4, -34.6), "EPSG:4326", "EPSG:32721")
    val sb = CrsTransform.transform(s, "EPSG:32721", "EPSG:4326").getCoordinate
    assert(math.abs(sb.x + 58.4) < 1e-6 && math.abs(sb.y + 34.6) < 1e-6)
    // OSGB36/27700 is supported via a real Helmert leg (CrsSpec anchors);
    // a CRS we genuinely don't carry still errors loudly (Irish grid:
    // TM on the Ireland 1965 datum, no enumerated entry)
    intercept[IllegalArgumentException](CrsTransform.parse("EPSG:29902"))
  }

  test("hilbert curve: locality + bijectivity on a grid") {
    // bijective over a small grid
    val seen = collection.mutable.Set[Long]()
    for (x <- 0 until 32; y <- 0 until 32) {
      val h = SpaceCurve.hilbertIndex(x * 2048, y * 2048)
      assert(!seen.contains(h)); seen += h
    }
    // adjacent cells on the curve are adjacent in space (Hilbert property,
    // distance 1 step = 1 cell)
    val cellOf = (0 until 16).flatMap(x => (0 until 16).map(y =>
      SpaceCurve.hilbertIndex(x * 4096, y * 4096) / (4096L * 4096L) -> (x, y))).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = cellOf(d); val (x2, y2) = cellOf(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at $d")
    }
  }

  test("aggregates over SQL") {
    spark.range(10).selectExpr("id", "st_point(cast(id as double), cast(id % 3 as double)) AS g")
      .createOrReplaceTempView("pts")
    assert(spark.sql("SELECT st_astext(st_envelope_agg(g)) FROM pts").collect()(0).getString(0)
      == "POLYGON ((0 0, 0 2, 9 2, 9 0, 0 0))")
    assert(spark.sql("SELECT st_numgeometries(st_collect_agg(g)) FROM pts").collect()(0).getInt(0) == 10)
    assert(spark.sql("SELECT st_astext(st_convexhull_agg(g)) FROM pts").collect()(0).getString(0).startsWith("POLYGON"))
    val stats = spark.sql("SELECT st_analyze_agg(g) AS s FROM pts")
      .selectExpr("s.count", "s.total_points", "s.xmax").collect()(0)
    assert(stats.getLong(0) == 10 && stats.getLong(1) == 10 && stats.getDouble(2) == 9.0)
    // union of two overlapping envelopes
    spark.sql("SELECT st_makeenvelope(0, 0, 4, 4) AS g UNION ALL SELECT st_makeenvelope(2, 0, 6, 4)")
      .createOrReplaceTempView("boxes")
    assert(spark.sql("SELECT st_area(st_union_agg(g)) FROM boxes").collect()(0).getDouble(0) == 24.0)
    assert(spark.sql("SELECT st_area(st_intersection_agg(g)) FROM boxes").collect()(0).getDouble(0) == 8.0)
  }

  test("reference alias names resolve to the canonical kernels") {
    assert(q("st_aswkt(st_point(1,2))") == "POINT (1 2)")
    assert(q("st_astext(st_geomfromwkb(st_aswkb(st_point(1,2))))") == "POINT (1 2)")
    assert(q("st_astext(st_convex_hull(st_geomfromwkt('MULTIPOINT ((0 0),(1 0),(0 1))')))") ==
      q("st_astext(st_convexhull(st_geomfromwkt('MULTIPOINT ((0 0),(1 0),(0 1))')))"))
    assert(q("st_astext(st_sym_difference(st_makeenvelope(0,0,2,2), st_makeenvelope(0,0,2,2)))")
      == "POLYGON EMPTY")
    assert(q("st_astext(st_geometryfromtext('POINT (3 4)'))") == "POINT (3 4)")
    assert(q("st_astext(st_linestringfromtext('LINESTRING (0 0, 1 1)'))") == "LINESTRING (0 0, 1 1)")
    assert(q("st_astext(st_geogfromtext('POINT (3 4)'))") == "POINT (3 4)")
    assert(q("st_astext(st_geogfromwkb(st_asbinary(st_point(1,2))))") == "POINT (1 2)")
    assert(q("st_astext(st_geomfromwkbunchecked(st_asbinary(st_point(1,2))))") == "POINT (1 2)")
    // st_tessellategeom/geog are real 2-arg edge-splitting kernels now
    // (ReferenceCasesSpec pins the split tables); large tolerance = no-op
    assert(q("st_npoints(st_tessellategeom(st_makeenvelope(0,0,1,1), 1e9)) ") == 5)
  }

  test("m-ordinate min/max and CRS strings") {
    assert(q("st_mmin(st_pointm(1,2,5))") == 5.0)
    assert(q("st_mmax(st_pointm(1,2,5))") == 5.0)
    assert(q("st_mmin(st_point(1,2))") == null)
    assert(q("st_crs(st_setsrid(st_point(1,2), 3857))") == "EPSG:3857")
    assert(q("st_crs(st_point(1,2))") == null)
    assert(q("st_srid(st_setcrs(st_point(1,2), 'EPSG:32610'))") == 32610)
    assert(q("st_srid(st_setcrs(st_point(1,2), 'OGC:CRS84'))") == 4326)
    intercept[Exception](q("st_setcrs(st_point(1,2), 'bogus')"))
    // transform to a non-"EPSG:n" spelling stamps the SRID via the shared
    // parser instead of throwing NumberFormatException
    assert(q("st_srid(st_transform(st_point(500000.0, 4649776.0), " +
      "'EPSG:32610', 'OGC:CRS84'))") == 4326)
  }

  test("raster metadata batch: dims, shape, rotation, srid, setters, example") {
    val r = "rs_makeraster(3, 2, 10.0, 20.0, 2.0, -2.0, array(1d,2d,3d,4d,5d,6d))"
    assert(q(s"rs_numdimensions($r)") == 2)
    val dn = q(s"rs_dimnames($r)")
    assert(dn.asInstanceOf[scala.collection.Seq[Any]].toSeq.map(_.toString) == Seq("y", "x"),
      s"got ${dn.getClass}: $dn")
    assert(q(s"rs_dimsize($r, 'y')") == 2L && q(s"rs_dimsize($r, 'x')") == 3L)
    assert(q(s"rs_dimsize($r, 'z')") == null)
    assert(q(s"rs_shape($r)").asInstanceOf[scala.collection.Seq[Any]].toSeq == Seq(2L, 3L))
    assert(q(s"rs_isempty($r)") == false)
    assert(q(s"rs_rotation($r)") == 0.0)
    assert(q(s"rs_bandpixeltype($r)") == "REAL_64BITS")
    assert(q(s"rs_bandpixeltype($r, 9)") == null)
    assert(q(s"rs_bandpath($r)") == null)
    val bp = java.nio.file.Files.createTempFile("graft_bp", ".tif")
    java.nio.file.Files.write(bp, graft.sources.GeoTiff.write(
      graft.functions.RasterModel.Raster("EPSG:4326",
        Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), 1, 1,
        Vector(graft.functions.RasterModel.Band(Double.NaN,
          graft.functions.RasterModel.packDoubles(Array(7.0)))))))
    assert(q(s"rs_bandpath(rs_frompath('file:$bp'))") == s"file:$bp")
    assert(q(s"rs_srid(rs_setsrid($r, 4326))") == 4326)
    assert(q(s"rs_crs(rs_setcrs($r, 'EPSG:3857'))") == "EPSG:3857")
    assert(q(s"rs_bandnodatavalue(rs_setbandnodatavalue($r, 3.0), 1)") == 3.0)
    // nodata masks rs_value after the set
    assert(q(s"rs_value(rs_setbandnodatavalue($r, 3.0), 1, 2, 0)") == null)
    assert(q(s"rs_georeference(rs_setgeoreference($r, '1.0 0.0 0.0 -1.0 5.0 6.0'))") ==
      "1.0 0.0 0.0 -1.0 5.0 6.0")
    // ESRI pixel-center shift: ulx 5 - 0.5*(1+0) = 4.5, uly 6 - 0.5*(0-1) = 6.5
    assert(q(s"rs_upperleftx(rs_setgeoreference($r, '1.0 0.0 0.0 -1.0 5.0 6.0', 'ESRI'))") == 4.5)
    assert(q(s"rs_upperlefty(rs_setgeoreference($r, '1.0 0.0 0.0 -1.0 5.0 6.0', 'ESRI'))") == 6.5)
    // values at multipoint: centers of pixels (0,0) and (2,1); out-of-range -> null
    assert(q(s"rs_values($r, st_geomfromwkt('MULTIPOINT ((11 19), (15 17), (99 99))'))")
      .asInstanceOf[scala.collection.Seq[Any]].toSeq == Seq(1.0, 6.0, null))
    assert(q(s"st_astext(rs_rastertoworldcoord($r, 1, 1))") == "POINT (12 18)")
    assert(q(s"st_astext(rs_worldtorastercoord($r, 15.0, 17.0))") == "POINT (2 1)")
    assert(q("rs_width(rs_example())") == 64 && q("rs_height(rs_example())") == 32)
    assert(q("rs_numbands(rs_example())") == 3)
    assert(q("rs_value(rs_example(), 2, 5, 5)") == 2.0)
    assert(q("rs_value(rs_example(), 1, 0, 0)") == null) // nodata corner
    assert(q("st_astext(rs_convexhull(rs_example()))").toString.startsWith("POLYGON"))
  }

  test("N-D raster: bandtodim/dimtoband/slice/slicerange, C-order layout, metadata") {
    // 2 bands, 3x2: band1 = 1..6, band2 = 7..12
    val r = "rs_makeraster(3, 2, 10.0, 20.0, 2.0, -2.0, " +
      "array(1d,2d,3d,4d,5d,6d,7d,8d,9d,10d,11d,12d), 2)"
    assert(q(s"rs_numbands($r)") == 2)
    val m = s"rs_bandtodim($r, 'time')"
    assert(q(s"rs_numbands($m)") == 1)
    assert(q(s"rs_numdimensions($m)") == 3)
    assert(q(s"rs_dimnames($m)").asInstanceOf[scala.collection.Seq[Any]].toSeq
      .map(_.toString) == Seq("time", "y", "x"))
    assert(q(s"rs_shape($m)").asInstanceOf[scala.collection.Seq[Any]].toSeq ==
      Seq(2L, 2L, 3L))
    assert(q(s"rs_dimsize($m, 'time')") == 2L)
    // rs_value refuses 3D bands (layout is no longer row*width+col)
    assert(q(s"rs_value($m, 1, 0, 0)") == null)
    // slice index 1 along time -> band2 as plain 2D; pixel (2,1) = 12
    assert(q(s"rs_value(rs_slice($m, 'time', 1), 1, 2, 1)") == 12.0)
    assert(q(s"rs_numdimensions(rs_slice($m, 'time', 0))") == 2)
    // slicerange keeps the dim with reduced size
    assert(q(s"rs_dimsize(rs_slicerange($m, 'time', 1, 2), 'time')") == 1L)
    assert(q(s"rs_shape(rs_slicerange($m, 'time', 0, 2))")
      .asInstanceOf[scala.collection.Seq[Any]].toSeq == Seq(2L, 2L, 3L))
    // dimtoband expands back to two 2D bands with the original data
    val back = s"rs_dimtoband($m, 'time')"
    assert(q(s"rs_numbands($back)") == 2)
    assert(q(s"rs_value($back, 1, 0, 0)") == 1.0)
    assert(q(s"rs_value($back, 2, 2, 1)") == 12.0)
    // errors: spatial dim, unknown dim, bad index, dim collision
    intercept[Exception](q(s"rs_slice($m, 'y', 0)"))
    intercept[Exception](q(s"rs_slice($m, 'nope', 0)"))
    intercept[Exception](q(s"rs_slice($m, 'time', 2)"))
    intercept[Exception](q(s"rs_bandtodim($r, 'x')"))
    // metadata struct
    assert(q(s"rs_metadata($r).gridWidth") == 3L)
    assert(q(s"rs_metadata($r).numSampleDimensions") == 2)
    assert(q(s"rs_metadata($r).scaleY") == -2.0)
  }

  test("raster ops: clip, tile, resample, reprojectmatch, asraster, polygonize, zonalstatsall") {
    // 4x4 grid at (0,0), scale (1,-1): world env x [0,4], y [-4,0]
    // values row-major 1..16
    val r = "rs_makeraster(4, 4, 0.0, 0.0, 1.0, -1.0, " +
      "array(1d,2d,3d,4d,5d,6d,7d,8d,9d,10d,11d,12d,13d,14d,15d,16d))"
    // clip to the lower-right 2x2 world box: pixels (2..3, 2..3)
    val clip = s"rs_clip($r, 1, st_makeenvelope(2.0, -4.0, 4.0, -2.0))"
    assert(q(s"rs_width($clip)") == 2 && q(s"rs_height($clip)") == 2)
    assert(q(s"rs_upperleftx($clip)") == 2.0 && q(s"rs_upperlefty($clip)") == -2.0)
    assert(q(s"rs_value($clip, 1, 0, 0)") == 11.0)
    assert(q(s"rs_value($clip, 1, 1, 1)") == 16.0)
    // no-crop keeps the full extent, masks outside to the nodata arg
    val nc = s"rs_clip($r, 1, st_makeenvelope(2.0, -4.0, 4.0, -2.0), false, -9.0, false)"
    assert(q(s"rs_width($nc)") == 4)
    assert(q(s"rs_value($nc, 1, 0, 0)") == null) // masked -> nodata -9
    assert(q(s"rs_bandnodatavalue($nc, 1)") == -9.0)
    assert(q(s"rs_value($nc, 1, 2, 2)") == 11.0)
    // tile into 3x3 -> 2x2 tiles, last ones clipped (no pad)
    assert(q(s"size(rs_tile($r, 3, 3))") == 4)
    assert(q(s"rs_tile($r, 3, 3)[0].x") == 0 && q(s"rs_tile($r, 3, 3)[1].x") == 1)
    assert(q(s"rs_width(rs_tile($r, 3, 3)[1].tile)") == 1)
    assert(q(s"rs_value(rs_tile($r, 3, 3)[3].tile, 1, 0, 0)") == 16.0)
    assert(q(s"rs_upperleftx(rs_tile($r, 3, 3)[3].tile)") == 3.0)
    // padded tiles are full-size with nodata fill
    assert(q(s"rs_width(rs_tile($r, 3, 3, true, -1.0)[1].tile)") == 3)
    assert(q(s"rs_value(rs_tile($r, 3, 3, true, -1.0)[1].tile, 1, 1, 0)") == null)
    // resample 4x4 -> 2x2 nearest: out pixel (0,0) center (1,-1) -> src (1,1) = 6
    val rs2 = s"rs_resample($r, 2.0, 2.0, false, 'nearestneighbor')"
    assert(q(s"rs_width($rs2)") == 2 && q(s"rs_scalex($rs2)") == 2.0)
    assert(q(s"rs_value($rs2, 1, 0, 0)") == 6.0)
    assert(q(s"rs_value($rs2, 1, 1, 1)") == 16.0)
    // bilinear at same grid: out center (1,-1) sits exactly between src
    // centers (0.5..1.5) -> average of 1,2,5,6 pixel quad = 3.5
    assert(q(s"rs_value(rs_resample($r, 2.0, 2.0, false, 'bilinear'), 1, 0, 0)") == 3.5)
    // useScale form: scale 2 halves the dims
    assert(q(s"rs_width(rs_resample($r, 2.0, -2.0, true, 'nn'))") == 2)
    // 4-arg reference-raster form
    val ref2 = "rs_makeraster(2, 2, 0.0, 0.0, 2.0, -2.0, array(0d,0d,0d,0d))"
    assert(q(s"rs_value(rs_resample($r, $ref2, false, 'nn'), 1, 1, 0)") == 8.0)
    // reprojectmatch: same CRS degenerates to grid match
    assert(q(s"rs_value(rs_reprojectmatch(rs_setcrs($r, 'EPSG:4326'), " +
      s"rs_setcrs($ref2, 'EPSG:4326')), 1, 0, 0)") == 6.0)
    // asraster: burn a 2x2 world box into the reference grid
    val burned = s"rs_asraster(st_makeenvelope(1.0, -3.0, 3.0, -1.0), $r, 'd', false, 7.0, 0.0)"
    assert(q(s"rs_width($burned)") == 2 && q(s"rs_height($burned)") == 2)
    assert(q(s"rs_upperleftx($burned)") == 1.0)
    assert(q(s"rs_value($burned, 1, 0, 0)") == 7.0)
    // polygonize: constant raster -> single region covering the extent
    val const = "rs_makeraster(2, 2, 0.0, 0.0, 1.0, -1.0, array(5d,5d,5d,5d))"
    assert(q(s"size(rs_polygonize($const, 1))") == 1)
    assert(q(s"rs_polygonize($const, 1)[0].value") == 5.0)
    assert(q(s"st_area(rs_polygonize($const, 1)[0].geom)") == 4.0)
    // two vertical stripes -> two regions in scan order
    val stripes = "rs_makeraster(2, 2, 0.0, 0.0, 1.0, -1.0, array(1d,2d,1d,2d))"
    assert(q(s"size(rs_polygonize($stripes, 1))") == 2)
    assert(q(s"rs_polygonize($stripes, 1)[0].value") == 1.0)
    assert(q(s"rs_polygonize($stripes, 1)[1].value") == 2.0)
    // zonalstatsall over the full extent of 1..16
    val zs = s"rs_zonalstatsall($r, st_makeenvelope(0.0, -4.0, 4.0, 0.0), 1)"
    assert(q(s"$zs.count") == 16L)
    assert(q(s"$zs.sum") == 136.0)
    assert(q(s"$zs.mean") == 8.5)
    assert(q(s"$zs.median") == 8.5)
    assert(q(s"$zs.min") == 1.0 && q(s"$zs.max") == 16.0)
    // sample variance of 1..16 = n(n+1)/12 = 22.666...
    assert(q(s"$zs.variance") == 16.0 * 17.0 / 12.0)
    // mode ties break to the LARGEST value (rs_zonal_stats.rs mode_of_sorted)
    assert(q(s"rs_zonalstatsall($stripes, st_makeenvelope(0.0, -2.0, 2.0, 0.0), 1).mode") == 2.0)
  }

  test("geotiff: roundtrip via rs_asgeotiff/rs_fromgdalraster, wire layout sane") {
    val r = "rs_setcrs(rs_makeraster(3, 2, 10.0, 20.0, 2.0, -2.0, " +
      "array(1d,2d,3d,4d,5d,6d)), 'EPSG:32633')"
    val rt = s"rs_fromgdalraster(rs_asgeotiff($r))"
    assert(q(s"rs_width($rt)") == 3 && q(s"rs_height($rt)") == 2)
    assert(q(s"rs_upperleftx($rt)") == 10.0 && q(s"rs_upperlefty($rt)") == 20.0)
    assert(q(s"rs_scalex($rt)") == 2.0 && q(s"rs_scaley($rt)") == -2.0)
    assert(q(s"rs_crs($rt)") == "EPSG:32633")
    assert(q(s"rs_value($rt, 1, 2, 1)") == 6.0)
    // nodata survives through the GDAL_NODATA ascii tag
    val nd = "rs_setbandnodatavalue(rs_makeraster(2, 2, 0.0, 0.0, 1.0, -1.0, " +
      "array(1d,2d,3d,4d)), -5.0)"
    assert(q(s"rs_bandnodatavalue(rs_fromgdalraster(rs_asgeotiff($nd)), 1)") == -5.0)
    // multi-band planar roundtrip
    val mb = "rs_makeraster(2, 2, 0.0, 0.0, 1.0, -1.0, " +
      "array(1d,2d,3d,4d,10d,20d,30d,40d), 2)"
    assert(q(s"rs_numbands(rs_fromgdalraster(rs_asgeotiff($mb)))") == 2)
    assert(q(s"rs_value(rs_fromgdalraster(rs_asgeotiff($mb)), 2, 1, 1)") == 40.0)
    // skewed transform goes through ModelTransformation
    val sk = s"rs_setgeoreference($r, '2.0 0.5 1.0 -2.0 7.0 9.0')"
    assert(q(s"rs_skewx(rs_fromgdalraster(rs_asgeotiff($sk)))") == 1.0)
    assert(q(s"rs_skewy(rs_fromgdalraster(rs_asgeotiff($sk)))") == 0.5)
    assert(q(s"rs_upperleftx(rs_fromgdalraster(rs_asgeotiff($sk)))") == 7.0)
    // 4326 goes through the geographic model-type geokey
    assert(q(s"rs_crs(rs_fromgdalraster(rs_asgeotiff(rs_setcrs($r, 'EPSG:4326'))))") ==
      "EPSG:4326")
    // wire sanity: II magic + TIFF 42
    assert(q(s"substring(rs_asgeotiff($r), 1, 2)")
      .asInstanceOf[Array[Byte]].toSeq == Seq('I'.toByte, 'I'.toByte))
    // lossless codec set roundtrips (quality is a 0-1 fraction — 0-100
    // style values error, test_rs_asgeotiff_out_of_range_quality_errors);
    // lossy/unknown errors loudly
    for (comp <- Seq("LZW", "DEFLATE", "PACKBITS", "NONE"))
      assert(q(s"rs_value(rs_fromgdalraster(rs_asgeotiff($r, '$comp', 0.75)), 1, 0, 1)") == 4.0)
    intercept[Exception](q(s"rs_asgeotiff($r, 'DEFLATE', 75.0)"))
    intercept[Exception](q(s"rs_asgeotiff($r, 'JPEG', 0.75)"))
  }

  test("geotiff: reads foreign layouts (big-endian, chunky uint8, multi-strip)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-build a big-endian chunky uint8 2-band 2x2 tiff, 2 strips of 1 row
    val bb = ByteBuffer.allocate(256).order(ByteOrder.BIG_ENDIAN)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    val nEntries = 9
    bb.putShort(8, nEntries.toShort)
    var p = 10
    def entry(tag: Int, typ: Int, count: Int, value: Int): Int = {
      bb.putShort(p, tag.toShort); bb.putShort(p + 2, typ.toShort)
      bb.putInt(p + 4, count)
      if (typ == 3 && count == 1) bb.putShort(p + 8, value.toShort)
      else bb.putInt(p + 8, value)
      p += 12
      p - 12
    }
    val dataOff = 10 + nEntries * 12 + 4 + 2 // IFD end + next-ifd + pad
    entry(256, 3, 1, 2) // width
    entry(257, 3, 1, 2) // height
    val bitsAt = entry(258, 3, 2, 0) // bits per sample [8,8]: 4 bytes, inline
    bb.putShort(bitsAt + 8, 8); bb.putShort(bitsAt + 10, 8)
    entry(259, 3, 1, 1) // uncompressed
    entry(273, 4, 2, dataOff) // strip offsets x2 (out-of-line)
    entry(277, 3, 1, 2) // samples/pixel
    entry(278, 4, 1, 1) // rows per strip = 1
    entry(279, 4, 2, dataOff + 8) // strip byte counts x2 (out-of-line)
    entry(284, 3, 1, 1) // chunky
    bb.putInt(p, 0) // next IFD
    val pix = dataOff + 16
    bb.putInt(dataOff, pix).putInt(dataOff + 4, pix + 4)
    bb.putInt(dataOff + 8, 4).putInt(dataOff + 12, 4)
    // chunky rows: (b1,b2) pairs; row0: (1,10),(2,20)  row1: (3,30),(4,40)
    bb.position(pix)
    bb.put(Array[Byte](1, 10, 2, 20, 3, 30, 4, 40))
    val tiff = java.util.Arrays.copyOf(bb.array(), pix + 8)
    val r = graft.sources.GeoTiff.read(tiff)
    assert(r.width == 2 && r.height == 2 && r.bands.length == 2)
    assert(r.value(1, 1, 0) == 2.0 && r.value(2, 1, 1) == 40.0)
    assert(r.crs == "EPSG:0")
  }

  test("geotiff: BigTIFF (magic 43, 8-byte offsets) decodes via read and readMeta") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-build a little-endian BigTIFF: 1 band, 2x2 f64, 1 strip, with
    // pixel-scale/tiepoint georeferencing and a GeoKey CRS
    val bb = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(43)
    bb.putShort(8).putShort(0) // offset size marker + pad
    bb.putLong(16L) // IFD offset
    val nEntries = 13
    bb.putLong(16, nEntries.toLong)
    var p = 24
    def entry(tag: Int, typ: Int, count: Long, value: Long): Int = {
      bb.putShort(p, tag.toShort); bb.putShort(p + 2, typ.toShort)
      bb.putLong(p + 4, count)
      bb.putLong(p + 12, value)
      p += 20
      p - 20
    }
    val dataOff = 24 + nEntries * 20 + 8 // entries + next-ifd pointer
    entry(256, 16, 1, 2) // width as LONG8
    entry(257, 4, 1, 2) // height as LONG (inline in 8-byte slot)
    entry(258, 3, 1, 64) // bits per sample
    entry(259, 3, 1, 1) // uncompressed
    entry(273, 16, 1, dataOff + 96) // strip offset (LONG8)
    entry(277, 3, 1, 1) // samples/pixel
    entry(278, 3, 1, 2) // rows per strip
    entry(279, 16, 1, 32) // strip byte count
    entry(284, 3, 1, 1) // chunky
    entry(339, 3, 1, 3) // sample format: float
    entry(33550, 12, 3, dataOff) // ModelPixelScale -> out-of-line
    entry(33922, 12, 6, dataOff + 40) // ModelTiepoint -> out-of-line
    entry(34735, 3, 8, dataOff + 24) // GeoKeyDirectory (8 shorts)
    bb.putLong(p, 0L) // next IFD
    bb.position(dataOff)
    bb.putDouble(0.5).putDouble(0.25).putDouble(0.0) // pixel scale
    // GeoKeys: header + ProjectedCSType 32633
    Seq(1, 1, 0, 1, 3072, 0, 1, 32633).foreach(v => bb.putShort(v.toShort))
    bb.position(dataOff + 40)
    Seq(0.0, 0.0, 0.0, 100.0, 200.0, 0.0).foreach(bb.putDouble) // tiepoint
    // pixels at dataOff + 96
    bb.position(dataOff + 96)
    Seq(1.5, 2.5, 3.5, 4.5).foreach(bb.putDouble)
    val tiff = java.util.Arrays.copyOf(bb.array(), dataOff + 96 + 32)
    val r = graft.sources.GeoTiff.read(tiff)
    assert(r.width == 2 && r.height == 2 && r.bands.length == 1)
    assert(r.value(1, 0, 0) == 1.5 && r.value(1, 1, 1) == 4.5)
    assert(r.crs == "EPSG:32633")
    assert(r.gt(1) == 0.5 && r.gt(5) == -0.25)
    // header-only metadata path with bounded fetches
    val meta = graft.sources.GeoTiff.readMeta((off, len) =>
      java.util.Arrays.copyOfRange(tiff, off.toInt, off.toInt + len))
    assert(meta.width == 2 && meta.height == 2 && meta.crs == "EPSG:32633")
    assert(meta.gt(1) == 0.5 && meta.gt(5) == -0.25)
  }

  test("geotiff: DEFLATE roundtrip and foreign predictor-2/3 strips decode") {
    // our writer+reader, deflate on
    val r = "rs_setcrs(rs_makeraster(3, 2, 10.0, 20.0, 2.0, -2.0, " +
      "array(1d,2d,3d,4d,5d,6d)), 'EPSG:32633')"
    val rt = s"rs_fromgdalraster(rs_asgeotiff($r, 'DEFLATE', 0.0))"
    assert(q(s"rs_value($rt, 1, 2, 1)") == 6.0)
    assert(q(s"rs_crs($rt)") == "EPSG:32633")

    // foreign little-endian single-band TIFFs with deflate + predictors,
    // encoded here straight from the TIFF 6.0 / Adobe extension spec text
    import java.nio.{ByteBuffer, ByteOrder}
    def build(pred: Int, strip: Array[Byte], w: Int, h: Int, bits: Int, fmt: Int): Array[Byte] = {
      def deflate(d: Array[Byte]): Array[Byte] = {
        val df = new java.util.zip.Deflater(); df.setInput(d); df.finish()
        val o = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](256)
        while (!df.finished()) o.write(buf, 0, df.deflate(buf))
        o.toByteArray
      }
      val comp = deflate(strip)
      val n = 11
      val bb = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      bb.putShort(8, n.toShort)
      var p = 10
      def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
        bb.putShort(p, tag.toShort); bb.putShort(p + 2, typ.toShort)
        bb.putInt(p + 4, count)
        if (typ == 3 && count == 1) bb.putShort(p + 8, value.toShort)
        else bb.putInt(p + 8, value)
        p += 12
      }
      val dataOff = 10 + n * 12 + 4
      entry(256, 3, 1, w); entry(257, 3, 1, h)
      entry(258, 3, 1, bits)
      entry(259, 3, 1, 8) // adobe deflate
      entry(273, 4, 1, dataOff)
      entry(277, 3, 1, 1)
      entry(278, 4, 1, h)
      entry(279, 4, 1, comp.length)
      entry(284, 3, 1, 1)
      entry(317, 3, 1, pred)
      entry(339, 3, 1, fmt)
      bb.putInt(p, 0)
      bb.position(dataOff); bb.put(comp)
      java.util.Arrays.copyOf(bb.array(), dataOff + comp.length)
    }
    // predictor 2, int16, 2x2: values row0 (100, 250) row1 (7, -3)
    // differenced: (100, 150), (7, -10)
    val p2 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    p2.putShort(100).putShort(150).putShort(7).putShort(-10)
    val r2 = graft.sources.GeoTiff.read(build(2, p2.array(), 2, 2, 16, 2))
    assert(r2.value(1, 0, 0) == 100.0 && r2.value(1, 1, 0) == 250.0)
    assert(r2.value(1, 0, 1) == 7.0 && r2.value(1, 1, 1) == -3.0)
    // predictor 3, float32, 2x1 row (1.5f, -2.25f): shuffle big-endian byte
    // planes then delta-code bytes
    val s1 = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putFloat(1.5f).array()
    val s2 = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putFloat(-2.25f).array()
    val shuffled = Array(s1(0), s2(0), s1(1), s2(1), s1(2), s2(2), s1(3), s2(3))
    val delta = shuffled.clone()
    for (i <- (1 until delta.length).reverse) delta(i) = (delta(i) - delta(i - 1)).toByte
    val r3 = graft.sources.GeoTiff.read(build(3, delta, 2, 1, 32, 3))
    assert(r3.value(1, 0, 0) == 1.5 && r3.value(1, 1, 0) == -2.25)
  }

  test("geotiff: LZW strips and tiled layouts (incl. partial edge tiles) decode") {
    import java.nio.{ByteBuffer, ByteOrder}
    // minimal TIFF-variant LZW encoder (spec §13), independent of the codec
    def lzwEncode(d: Array[Byte]): Array[Byte] = {
      val dict = new java.util.HashMap[String, Integer]()
      def str(bs: Seq[Byte]) = new String(bs.map(b => (b & 0xff).toChar).toArray)
      var next = 258; var width = 9
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nacc = 0
      def writeCode(c: Int): Unit = {
        acc = (acc << width) | c; nacc += width
        while (nacc >= 8) { bits.write(((acc >> (nacc - 8)) & 0xff).toInt); nacc -= 8 }
      }
      def reset(): Unit = {
        dict.clear(); (0 until 256).foreach(i => dict.put(str(Seq(i.toByte)), i))
        next = 258; width = 9
      }
      reset(); writeCode(256)
      var omega = Seq.empty[Byte]
      d.foreach { b =>
        val k = omega :+ b
        if (dict.containsKey(str(k))) omega = k
        else {
          writeCode(dict.get(str(omega)))
          dict.put(str(k), next); next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
          omega = Seq(b)
        }
      }
      if (omega.nonEmpty) writeCode(dict.get(str(omega)))
      writeCode(257)
      if (nacc > 0) bits.write(((acc << (8 - nacc)) & 0xff).toInt)
      bits.toByteArray
    }
    def buildStrip(comp: Int, strip: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = 10
      val bb = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      bb.putShort(8, n.toShort)
      var p = 10
      def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
        bb.putShort(p, tag.toShort); bb.putShort(p + 2, typ.toShort)
        bb.putInt(p + 4, count)
        if (typ == 3 && count == 1) bb.putShort(p + 8, value.toShort)
        else bb.putInt(p + 8, value)
        p += 12
      }
      val dataOff = 10 + n * 12 + 4
      entry(256, 3, 1, w); entry(257, 3, 1, h)
      entry(258, 3, 1, 8); entry(259, 3, 1, comp)
      entry(273, 4, 1, dataOff); entry(277, 3, 1, 1)
      entry(278, 4, 1, h); entry(279, 4, 1, strip.length)
      entry(284, 3, 1, 1); entry(339, 3, 1, 1)
      bb.putInt(p, 0)
      bb.position(dataOff); bb.put(strip)
      java.util.Arrays.copyOf(bb.array(), dataOff + strip.length)
    }
    // LZW: 3x2 uint8 with repetition to exercise dictionary growth
    val pix = Array[Byte](7, 7, 7, 7, 9, 9)
    val rl = graft.sources.GeoTiff.read(buildStrip(5, lzwEncode(pix), 3, 2))
    assert((0 until 3).map(c => rl.value(1, c, 0)) == Seq(7.0, 7.0, 7.0))
    assert(rl.value(1, 1, 1) == 9.0 && rl.value(1, 2, 1) == 9.0)

    // tiled: 3x3 uint8, 2x2 tiles (partial right/bottom tiles), uncompressed
    def buildTiled(w: Int, h: Int, tw: Int, th: Int, tiles: Seq[Array[Byte]]): Array[Byte] = {
      val n = 11
      val bb = ByteBuffer.allocate(1024).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      bb.putShort(8, n.toShort)
      var p = 10
      def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
        bb.putShort(p, tag.toShort); bb.putShort(p + 2, typ.toShort)
        bb.putInt(p + 4, count)
        if (typ == 3 && count == 1) bb.putShort(p + 8, value.toShort)
        else bb.putInt(p + 8, value)
        p += 12
      }
      val arraysOff = 10 + n * 12 + 4
      val tilesOff = arraysOff + tiles.length * 8
      entry(256, 3, 1, w); entry(257, 3, 1, h)
      entry(258, 3, 1, 8); entry(259, 3, 1, 1)
      entry(277, 3, 1, 1); entry(284, 3, 1, 1); entry(339, 3, 1, 1)
      entry(322, 3, 1, tw); entry(323, 3, 1, th)
      entry(324, 4, tiles.length, arraysOff)
      entry(325, 4, tiles.length, arraysOff + tiles.length * 4)
      bb.putInt(p, 0)
      var off = tilesOff
      tiles.zipWithIndex.foreach { case (t, i) =>
        bb.putInt(arraysOff + i * 4, off)
        bb.putInt(arraysOff + tiles.length * 4 + i * 4, t.length)
        bb.position(off); bb.put(t); off += t.length
      }
      java.util.Arrays.copyOf(bb.array(), off)
    }
    // image rows: (1 2 3 / 4 5 6 / 7 8 9); tiles row-major, padded to 2x2
    val t00 = Array[Byte](1, 2, 4, 5)
    val t01 = Array[Byte](3, 0, 6, 0)
    val t10 = Array[Byte](7, 8, 0, 0)
    val t11 = Array[Byte](9, 0, 0, 0)
    val rt = graft.sources.GeoTiff.read(buildTiled(3, 3, 2, 2, Seq(t00, t01, t10, t11)))
    val got = for (y <- 0 until 3; x <- 0 until 3) yield rt.value(1, x, y)
    assert(got == (1 to 9).map(_.toDouble), got)
  }

  test("spherical overlay: high-latitude boxes where planar lon/lat overlay distorts") {
    // two boxes at lat 78..80 overlapping in lon: planar-degree overlay
    // would be 'correct' here too, but the areas must come out spherical.
    // Overlay outputs are densified (tolDeg 0.5) parallel-following
    // rings; a bare envelope is a 4-corner geodesic quad — under the
    // geodesic edge model those differ by the chord-vs-parallel sliver
    // (~2e-4 rel at lat 80), which bounds the comparisons here.
    val inter = q("st_areasphere(st_intersectionsphere(" +
      "st_makeenvelope(10.0, 78.0, 14.0, 80.0), st_makeenvelope(12.0, 78.0, 16.0, 80.0)))")
      .asInstanceOf[Double]
    val exact = q("st_areasphere(st_makeenvelope(12.0, 78.0, 14.0, 80.0))")
      .asInstanceOf[Double]
    assert(math.abs(inter - exact) / exact < 5e-4, s"$inter vs $exact")
    // inclusion-exclusion: union + intersection == a + b (mixed models
    // bound the tolerance as above)
    val a = q("st_areasphere(st_makeenvelope(10.0, 78.0, 14.0, 80.0))").asInstanceOf[Double]
    val b = q("st_areasphere(st_makeenvelope(12.0, 78.0, 16.0, 80.0))").asInstanceOf[Double]
    val uni = q("st_areasphere(st_unionsphere(" +
      "st_makeenvelope(10.0, 78.0, 14.0, 80.0), st_makeenvelope(12.0, 78.0, 16.0, 80.0)))")
      .asInstanceOf[Double]
    assert(math.abs((uni + inter) - (a + b)) / (a + b) < 1e-3)
    // symdifference is disjoint from the intersection
    assert(q("st_intersects(st_symdifferencesphere(" +
      "st_makeenvelope(10.0, 78.0, 14.0, 80.0), st_makeenvelope(12.0, 78.0, 16.0, 80.0))," +
      "st_point(13.0, 79.0))") == false)
  }

  test("spherical buffer: area of a point buffer tracks pi*r^2, even at lat 60") {
    val r = 100000.0
    val area = q(s"st_areasphere(st_buffersphere(st_point(30.0, 60.0), $r))")
      .asInstanceOf[Double]
    val expected = math.Pi * r * r
    // planar lon/lat degree-buffering would be off by ~cos(60) = 2x in lon
    assert(math.abs(area - expected) / expected < 0.01, s"$area vs $expected")
  }

  test("spherical line interpolation follows the great circle, not the chart line") {
    // east-west line at lat 60: the geodesic midpoint bulges poleward
    val lat = q("st_y(st_lineinterpolatepointsphere(" +
      "st_makeline(st_point(-30.0, 60.0), st_point(30.0, 60.0)), 0.5))")
      .asInstanceOf[Double]
    assert(lat > 63.0, s"midpoint lat $lat should be well above 60")
    // endpoints at the fraction extremes
    assert(q("st_astext(st_lineinterpolatepointsphere(" +
      "st_makeline(st_point(0.0, 0.0), st_point(0.0, 10.0)), 0.0))") == "POINT (0 0)")
    assert(q("st_astext(st_lineinterpolatepointsphere(" +
      "st_makeline(st_point(0.0, 0.0), st_point(0.0, 10.0)), 1.0))") == "POINT (0 10)")
  }

  test("oriented sphere: CW cap ring denotes its complement (> hemisphere)") {
    // densified 60-vertex circle of angular radius 20° around (10, 45),
    // authored CCW (cap) and CW (complement). The smaller-side family
    // reads both as the cap; the oriented family honors the winding.
    def capWkt(cw: Boolean): String = {
      val (cx, cy) = (10.0, 45.0)
      val rho = math.toRadians(20.0)
      val (ux, uy, uz) = (math.cos(math.toRadians(cy)) * math.cos(math.toRadians(cx)),
        math.cos(math.toRadians(cy)) * math.sin(math.toRadians(cx)),
        math.sin(math.toRadians(cy)))
      // orthonormal frame at the center
      val (e1x, e1y, e1z) = (-math.sin(math.toRadians(cx)), math.cos(math.toRadians(cx)), 0.0)
      val (e2x, e2y, e2z) = (uy * e1z - uz * e1y, uz * e1x - ux * e1z, ux * e1y - uy * e1x)
      val pts = (0 to 60).map { i =>
        val t = 2 * math.Pi * i / 60.0 * (if (cw) -1 else 1)
        val px = math.cos(rho) * ux + math.sin(rho) * (math.cos(t) * e1x + math.sin(t) * e2x)
        val py = math.cos(rho) * uy + math.sin(rho) * (math.cos(t) * e1y + math.sin(t) * e2y)
        val pz = math.cos(rho) * uz + math.sin(rho) * (math.cos(t) * e1z + math.sin(t) * e2z)
        f"${math.toDegrees(math.atan2(py, px))}%.10f ${math.toDegrees(math.asin(pz))}%.10f"
      }
      s"POLYGON ((${pts.mkString(", ")}))"
    }
    val inCap = "st_point(10.0, 45.0)" // the center
    val farSide = "st_point(-170.0, -45.0)" // the exact antipode (sum = -2π·σ)
    val midBand = "st_point(-60.0, 0.0)" // mid complement (winding sum = 0)
    for ((pt, cwExpect, ccwExpect) <- Seq((inCap, false, true),
        (farSide, true, false), (midBand, true, false))) {
      assert(q(s"st_containssphereoriented(st_geomfromtext('${capWkt(cw = true)}'), $pt)")
        == cwExpect, s"CW(complement) containment of $pt")
      assert(q(s"st_containssphereoriented(st_geomfromtext('${capWkt(cw = false)}'), $pt)")
        == ccwExpect, s"CCW(cap) containment of $pt")
    }
    // areas: CCW measures the cap (2π(1−cos ρ)R²; inscribed polygon
    // slightly smaller), CW measures the complement, and they sum to the
    // full sphere exactly (same excess, opposite sign)
    val r = 6371008.7714
    val capA = q(s"st_areasphereoriented(st_geomfromtext('${capWkt(cw = false)}'))")
      .asInstanceOf[Double]
    val compA = q(s"st_areasphereoriented(st_geomfromtext('${capWkt(cw = true)}'))")
      .asInstanceOf[Double]
    val capExact = 2 * math.Pi * (1 - math.cos(math.toRadians(20.0))) * r * r
    assert(math.abs(capA - capExact) / capExact < 0.01, s"cap area $capA vs $capExact")
    assert(compA > 2 * math.Pi * r * r, "complement must exceed a hemisphere")
    assert(math.abs(capA + compA - 4 * math.Pi * r * r) < 1e-3 * r * r,
      "cap + complement = full sphere")
    // smaller-side family is unchanged: both windings read as the cap
    assert(q(s"st_containssphere(st_geomfromtext('${capWkt(cw = true)}'), $inCap)") == true)
    assert(q(s"st_areasphere(st_geomfromtext('${capWkt(cw = true)}'))")
      .asInstanceOf[Double] < 2 * math.Pi * r * r)
    // conventionally-wound polygons agree across families
    val box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert(q(s"st_areasphereoriented(st_geomfromtext('$box'))") ==
      q(s"st_areasphere(st_geomfromtext('$box'))"))
    assert(q(s"st_containssphereoriented(st_geomfromtext('$box'), st_point(5.0, 5.0))") == true)
    // oriented hole: CCW shell with a properly-wound (CW) hole excludes it
    val holed = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (5 5, 5 9, 9 9, 9 5, 5 5))"
    assert(q(s"st_containssphereoriented(st_geomfromtext('$holed'), st_point(7.0, 7.0))") == false)
    assert(q(s"st_containssphereoriented(st_geomfromtext('$holed'), st_point(2.0, 2.0))") == true)
  }

  test("oriented sphere: polygon-polygon containment and intersection") {
    // densified circle of angular radius 20° around (cx, cy); cw=true
    // authors the COMPLEMENT (region larger than a hemisphere)
    def circWkt(cx: Double, cy: Double, cw: Boolean): String = {
      val rho = math.toRadians(20.0)
      val (ux, uy, uz) = (math.cos(math.toRadians(cy)) * math.cos(math.toRadians(cx)),
        math.cos(math.toRadians(cy)) * math.sin(math.toRadians(cx)),
        math.sin(math.toRadians(cy)))
      val (e1x, e1y, e1z) = (-math.sin(math.toRadians(cx)), math.cos(math.toRadians(cx)), 0.0)
      val (e2x, e2y, e2z) = (uy * e1z - uz * e1y, uz * e1x - ux * e1z, ux * e1y - uy * e1x)
      val pts = (0 to 60).map { i =>
        val t = 2 * math.Pi * i / 60.0 * (if (cw) -1 else 1)
        val px = math.cos(rho) * ux + math.sin(rho) * (math.cos(t) * e1x + math.sin(t) * e2x)
        val py = math.cos(rho) * uy + math.sin(rho) * (math.cos(t) * e1y + math.sin(t) * e2y)
        val pz = math.cos(rho) * uz + math.sin(rho) * (math.cos(t) * e1z + math.sin(t) * e2z)
        f"${math.toDegrees(math.atan2(py, px))}%.10f ${math.toDegrees(math.asin(pz))}%.10f"
      }
      s"POLYGON ((${pts.mkString(", ")}))"
    }
    def cnt(a: String, b: String) =
      q(s"st_containssphereoriented(st_geomfromtext('$a'), st_geomfromtext('$b'))")
    def ix(a: String, b: String) =
      q(s"st_intersectssphereoriented(st_geomfromtext('$a'), st_geomfromtext('$b'))")
    val cap = circWkt(10, 45, cw = false)
    val comp = circWkt(10, 45, cw = true)
    val boxFar = "POLYGON ((-62 -2, -58 -2, -58 2, -62 2, -62 -2))"
    val boxNear = "POLYGON ((8 43, 12 43, 12 47, 8 47, 8 43))"
    // the complement covers ground far from the cap and excludes the cap
    assert(cnt(comp, boxFar) == true, "complement must cover the far box")
    assert(ix(comp, boxFar) == true)
    assert(cnt(cap, boxFar) == false)
    assert(ix(cap, boxFar) == false, "cap and far box are disjoint")
    assert(cnt(cap, boxNear) == true, "cap covers the box at its center")
    assert(ix(comp, boxNear) == false, "complement excludes the cap interior")
    // two complements always intersect (each exceeds a hemisphere) but
    // neither contains the other — the reverse-nesting leg must fire
    val compB = circWkt(-170, -45, cw = true)
    assert(ix(comp, compB) == true)
    assert(cnt(comp, compB) == false,
      "complement cannot contain the complement of its antipodal cap")
    // Venn overlap with every vertex outside the other region: only the
    // arc-crossing sweep can see it
    val vennA = "POLYGON ((0 -10, 4 -10, 4 30, 0 30, 0 -10))"
    val vennB = "POLYGON ((-10 0, 30 0, 30 4, -10 4, -10 0))"
    assert(ix(vennA, vennB) == true, "crossing boxes must intersect")
    assert(cnt(vennA, vennB) == false)
    // a holed frame does NOT contain a box spanning its hole, even though
    // every box vertex lies in the frame and no arcs cross — the
    // hole-ring-inside-b leg catches it
    val frame = "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), " +
      "(10 10, 10 30, 30 30, 30 10, 10 10))"
    val spanning = "POLYGON ((5 5, 35 5, 35 35, 5 35, 5 5))"
    assert(cnt(frame, spanning) == false,
      "frame must not contain a box spanning its hole")
    assert(ix(frame, spanning) == true)
    val inHole = "POLYGON ((15 15, 25 15, 25 25, 15 25, 15 15))"
    assert(cnt(frame, inHole) == false)
    assert(ix(frame, inHole) == false,
      "box strictly inside the hole is disjoint from the frame")
  }

  test("oriented sphere: boolean intersection/union via arc stitching") {
    def circ(cx: Double, cy: Double, rhoDeg: Double, cw: Boolean): String = {
      val rho = math.toRadians(rhoDeg)
      val (ux, uy, uz) = (math.cos(math.toRadians(cy)) * math.cos(math.toRadians(cx)),
        math.cos(math.toRadians(cy)) * math.sin(math.toRadians(cx)),
        math.sin(math.toRadians(cy)))
      val (e1x, e1y, e1z) = (-math.sin(math.toRadians(cx)), math.cos(math.toRadians(cx)), 0.0)
      val (e2x, e2y, e2z) = (uy * e1z - uz * e1y, uz * e1x - ux * e1z, ux * e1y - uy * e1x)
      val pts = (0 to 48).map { i =>
        val t = 2 * math.Pi * i / 48.0 * (if (cw) -1 else 1)
        val px = math.cos(rho) * ux + math.sin(rho) * (math.cos(t) * e1x + math.sin(t) * e2x)
        val py = math.cos(rho) * uy + math.sin(rho) * (math.cos(t) * e1y + math.sin(t) * e2y)
        val pz = math.cos(rho) * uz + math.sin(rho) * (math.cos(t) * e1z + math.sin(t) * e2z)
        f"${math.toDegrees(math.atan2(py, px))}%.10f ${math.toDegrees(math.asin(pz))}%.10f"
      }
      s"POLYGON ((${pts.mkString(", ")}))"
    }
    def areaO(e: String): Double =
      q(s"st_areasphereoriented($e)").asInstanceOf[Double]
    def inter(a: String, b: String): String =
      s"st_intersectionsphereoriented(st_geomfromtext('$a'), st_geomfromtext('$b'))"
    def uni(a: String, b: String): String =
      s"st_unionsphereoriented(st_geomfromtext('$a'), st_geomfromtext('$b'))"
    def cntE(container: String, lon: Double, lat: Double): Boolean =
      q(s"st_containssphereoriented($container, st_point($lon, $lat))")
        .asInstanceOf[Boolean]
    def cntW(wkt: String, lon: Double, lat: Double): Boolean =
      cntE(s"st_geomfromtext('$wkt')", lon, lat)

    val configs = Seq(
      // Venn quads, conventional winding
      ("POLYGON ((0 0, 30 0, 30 20, 0 20, 0 0))",
        "POLYGON ((15 -10, 45 -10, 45 10, 15 10, 15 -10))"),
      // cap complement (CW) against an overlapping quad
      (circ(10, 45, 20, cw = true),
        "POLYGON ((-20 20, 25 20, 25 50, -20 50, -20 20))"),
      // two caps, Venn overlap
      (circ(0, 20, 18, cw = false), circ(14, 28, 18, cw = false)))
    for (((a, b), ci) <- configs.zipWithIndex) {
      // global invariant: the stitched overlay satisfies
      // area(A) + area(B) = area(A∩B) + area(A∪B)
      val lhs = areaO(s"st_geomfromtext('$a')") + areaO(s"st_geomfromtext('$b')")
      val rhs = areaO(inter(a, b)) + areaO(uni(a, b))
      assert(math.abs(lhs - rhs) / lhs < 1e-9, s"config $ci incl-excl: $lhs vs $rhs")
      // point-sampling differential, only at neighborhood-stable points
      // (skip the float-sensitive band near any boundary)
      var checked = 0
      for (lon <- -28 to 52 by 8; lat <- -20 to 60 by 8) {
        def expectAt(lo: Double, la: Double) = cntW(a, lo, la) && cntW(b, lo, la)
        val e0 = expectAt(lon, lat)
        val stable = Seq((1.2, 0.0), (-1.2, 0.0), (0.0, 1.2), (0.0, -1.2))
          .forall { case (dl, dp) => expectAt(lon + dl, lat + dp) == e0 }
        if (stable) {
          checked += 1
          assert(cntE(inter(a, b), lon, lat) == e0,
            s"config $ci intersection membership at ($lon, $lat)")
        }
      }
      assert(checked > 40, s"config $ci: too few stable sample points")
    }
    // complement ∩ complement = the band between the two circles: a
    // 2-ring polygon whose area is the sphere minus both caps
    val compN = circ(0, 60, 20, cw = true)
    val compS = circ(0, -60, 20, cw = true)
    val r = 6371008.7714
    val capArea = 2 * math.Pi * (1 - math.cos(math.toRadians(20))) * r * r
    val bandArea = areaO(inter(compN, compS))
    assert(math.abs(bandArea - (4 * math.Pi * r * r - 2 * capArea)) / bandArea < 0.01,
      s"band area $bandArea")
    assert(cntE(inter(compN, compS), 0, 0) &&
      !cntE(inter(compN, compS), 0, 65) && !cntE(inter(compN, compS), 0, -65))
    // disjoint caps intersect to POLYGON EMPTY
    assert(q(s"st_isempty(${inter(circ(0, 0, 10, cw = false), circ(90, 0, 10, cw = false))})")
      == true)
    // a union covering the full sphere has no boundary: loud error
    val ex = intercept[Exception] {
      q(s"st_astext(${uni(compN, compS)})")
    }
    assert(ex.getMessage != null)
  }

  test("null propagation") {
    assert(q("st_area(NULL)") == null)
    assert(q("st_x(st_geomfromwkt('LINESTRING (0 0, 1 1)'))") == null)
    // ST_StartPoint follows PostGIS 3.2 any-geometry semantics now
    // (point -> itself); a linestring-only accessor that IS null there:
    assert(q("st_endpoint(st_point(1, 2))") == null)
    assert(q("st_geometryn(st_geomfromwkt('MULTIPOINT ((1 2))'), 5)") == null)
  }
}
