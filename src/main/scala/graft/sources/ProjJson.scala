package graft.sources

/** PROJJSON (proj.org schema) emitter for the EPSG codes the engine's
  * CrsTransform supports. GeoParquet requires column `crs` metadata to be
  * a PROJJSON object (reference writes via PROJ,
  * rust/sedona-geoparquet/src/writer.rs + test_write_geoparquet_ensure_
  * projjson_crs asserts `crs.id.authority/code`); strict readers
  * (GeoPandas→pyproj) parse the object form. Parameters are the public
  * EPSG registry definitions — the same constants CrsTransform's math
  * uses.
  */
object ProjJson {

  private case class Ell(name: String, code: Int, a: Double, rf: Double)
  private val Wgs84 = Ell("WGS 84", 7030, 6378137.0, 298.257223563)
  private val Grs80 = Ell("GRS 1980", 7019, 6378137.0, 298.257222101)
  private val Airy = Ell("Airy 1830", 7001, 6377563.396, 299.3249646)

  private case class Geog(name: String, code: Int, datumName: String,
      datumCode: Int, ell: Ell)
  private val Geo4326 = Geog("WGS 84", 4326, "World Geodetic System 1984", 6326, Wgs84)
  private val Geo4258 = Geog("ETRS89", 4258, "European Terrestrial Reference System 1989", 6258, Grs80)
  private val Geo4269 = Geog("NAD83", 4269, "North American Datum 1983", 6269, Grs80)
  private val Geo4277 = Geog("OSGB36", 4277, "Ordnance Survey of Great Britain 1936", 6277, Airy)
  private val Geo4171 = Geog("RGF93 v1", 4171, "Reseau Geodesique Francais 1993 v1", 6171, Grs80)

  /** One conversion parameter: EPSG name/code, value, unit. */
  private case class P(name: String, code: Int, v: Double, unit: String)
  private def deg(name: String, code: Int, v: Double) = P(name, code, v, "degree")
  private def m(name: String, code: Int, v: Double) = P(name, code, v, "metre")
  private def k(v: Double) = P("Scale factor at natural origin", 8805, v, "unity")

  private def latO(v: Double) = deg("Latitude of natural origin", 8801, v)
  private def lonO(v: Double) = deg("Longitude of natural origin", 8802, v)
  private def fe(v: Double) = m("False easting", 8806, v)
  private def fn(v: Double) = m("False northing", 8807, v)
  // false-origin family (LCC 2SP / Albers)
  private def latF(v: Double) = deg("Latitude of false origin", 8821, v)
  private def lonF(v: Double) = deg("Longitude of false origin", 8822, v)
  private def sp1(v: Double) = deg("Latitude of 1st standard parallel", 8823, v)
  private def sp2(v: Double) = deg("Latitude of 2nd standard parallel", 8824, v)
  private def eF(v: Double) = m("Easting at false origin", 8826, v)
  private def nF(v: Double) = m("Northing at false origin", 8827, v)

  private case class Conv(name: String, methodName: String, methodCode: Int,
      params: Seq[P])

  private def tm(name: String, lat0: Double, lon0: Double, k0: Double,
      e: Double, n: Double) =
    Conv(name, "Transverse Mercator", 9807,
      Seq(latO(lat0), lonO(lon0), k(k0), fe(e), fn(n)))

  private def utm(zone: Int): Conv =
    tm(s"UTM zone ${zone}N", 0, zone * 6 - 183, 0.9996, 500000, 0)

  private def lcc2sp(name: String, lat0: Double, lon0: Double, p1: Double,
      p2: Double, e: Double, n: Double) =
    Conv(name, "Lambert Conic Conformal (2SP)", 9802,
      Seq(latF(lat0), lonF(lon0), sp1(p1), sp2(p2), eF(e), nF(n)))

  /** (name, base geographic CRS, conversion) for a supported projected
    * EPSG code; None for codes without a table entry. */
  private def projected(code: Int): Option[(String, Geog, Conv)] = code match {
    case 3857 => Some(("WGS 84 / Pseudo-Mercator", Geo4326,
      Conv("Popular Visualisation Pseudo-Mercator",
        "Popular Visualisation Pseudo Mercator", 1024,
        Seq(latO(0), lonO(0), fe(0), fn(0)))))
    case 3395 => Some(("WGS 84 / World Mercator", Geo4326,
      Conv("World Mercator", "Mercator (variant A)", 9804,
        Seq(latO(0), lonO(0), k(1.0), fe(0), fn(0)))))
    case z if z >= 32601 && z <= 32660 =>
      Some((s"WGS 84 / UTM zone ${z - 32600}N", Geo4326, utm(z - 32600)))
    case z if z >= 32701 && z <= 32760 =>
      val c = utm(z - 32700)
      Some((s"WGS 84 / UTM zone ${z - 32700}S", Geo4326,
        c.copy(name = s"UTM zone ${z - 32700}S",
          params = c.params.map(p => if (p.code == 8807) fn(10000000) else p))))
    case z if z >= 25828 && z <= 25838 =>
      Some((s"ETRS89 / UTM zone ${z - 25800}N", Geo4258, utm(z - 25800)))
    case z if z >= 26901 && z <= 26923 =>
      Some((s"NAD83 / UTM zone ${z - 26900}N", Geo4269, utm(z - 26900)))
    case 2154 => Some(("RGF93 v1 / Lambert-93", Geo4171,
      lcc2sp("Lambert-93", 46.5, 3.0, 49.0, 44.0, 700000, 6600000)))
    case 3035 => Some(("ETRS89-extended / LAEA Europe", Geo4258,
      Conv("Europe Equal Area 2001", "Lambert Azimuthal Equal Area", 9820,
        Seq(latO(52), lonO(10), fe(4321000), fn(3210000)))))
    case 5070 => Some(("NAD83 / Conus Albers", Geo4269,
      Conv("Conus Albers", "Albers Equal Area", 9822,
        Seq(latF(23), lonF(-96), sp1(29.5), sp2(45.5), eF(0), nF(0)))))
    case 27700 => Some(("OSGB36 / British National Grid", Geo4277,
      tm("British National Grid", 49, -2, 0.9996012717, 400000, -100000)))
    case 3031 => Some(("WGS 84 / Antarctic Polar Stereographic", Geo4326,
      Conv("Antarctic Polar Stereographic", "Polar Stereographic (variant B)", 9829,
        Seq(deg("Latitude of standard parallel", 8832, -71),
          deg("Longitude of origin", 8833, 0), fe(0), fn(0)))))
    case 3413 => Some(("WGS 84 / NSIDC Sea Ice Polar Stereographic North", Geo4326,
      Conv("US NSIDC Sea Ice polar stereographic north",
        "Polar Stereographic (variant B)", 9829,
        Seq(deg("Latitude of standard parallel", 8832, 70),
          deg("Longitude of origin", 8833, -45), fe(0), fn(0)))))
    case 3976 => Some(("WGS 84 / NSIDC Sea Ice Polar Stereographic South", Geo4326,
      Conv("US NSIDC Sea Ice polar stereographic south",
        "Polar Stereographic (variant B)", 9829,
        Seq(deg("Latitude of standard parallel", 8832, -70),
          deg("Longitude of origin", 8833, 0), fe(0), fn(0)))))
    case 5041 => Some(("WGS 84 / UPS North (E,N)", Geo4326,
      Conv("Universal Polar Stereographic North",
        "Polar Stereographic (variant A)", 9810,
        Seq(latO(90), lonO(0), k(0.994), fe(2000000), fn(2000000)))))
    case 5042 => Some(("WGS 84 / UPS South (E,N)", Geo4326,
      Conv("Universal Polar Stereographic South",
        "Polar Stereographic (variant A)", 9810,
        Seq(latO(-90), lonO(0), k(0.994), fe(2000000), fn(2000000)))))
    case 32118 => Some(("NAD83 / New York Long Island", Geo4269,
      lcc2sp("SPCS83 New York Long Island zone (meters)",
        40.0 + 10.0 / 60, -74.0, 41.0 + 2.0 / 60, 40.0 + 40.0 / 60, 300000, 0)))
    case 32139 => Some(("NAD83 / Texas South Central", Geo4269,
      lcc2sp("SPCS83 Texas South Central zone (meters)",
        29.0 + 40.0 / 60, -98.5, 31.0 + 53.0 / 60, 30.0 + 7.0 / 60,
        700000, 3000000)))
    case _ => None
  }

  // ---- JSON assembly (no external deps; numbers via toString minus
  // trailing ".0" so integral values print as integers, matching PROJ) ----

  private def num(v: Double): String = {
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString
  }

  private def idJson(authority: String, code: Int): String =
    s"""{"authority":"$authority","code":$code}"""

  private def ellJson(e: Ell): String =
    s"""{"name":"${e.name}","semi_major_axis":${num(e.a)},"inverse_flattening":${num(e.rf)},"id":${idJson("EPSG", e.code)}}"""

  private def geogJson(g: Geog, topLevel: Boolean): String = {
    val schema = if (topLevel)
      """"$schema":"https://proj.org/schemas/v0.7/projjson.schema.json",""" else ""
    s"""{$schema"type":"GeographicCRS","name":"${g.name}","datum":{"type":"GeodeticReferenceFrame","name":"${g.datumName}","ellipsoid":${ellJson(g.ell)},"id":${idJson("EPSG", g.datumCode)}},"coordinate_system":{"subtype":"ellipsoidal","axis":[{"name":"Geodetic latitude","abbreviation":"Lat","direction":"north","unit":"degree"},{"name":"Geodetic longitude","abbreviation":"Lon","direction":"east","unit":"degree"}]},"id":${idJson("EPSG", g.code)}}"""
  }

  private def paramJson(p: P): String =
    s"""{"name":"${p.name}","value":${num(p.v)},"unit":"${p.unit}","id":${idJson("EPSG", p.code)}}"""

  private def projJson(code: Int, name: String, base: Geog, conv: Conv): String =
    s"""{"$$schema":"https://proj.org/schemas/v0.7/projjson.schema.json","type":"ProjectedCRS","name":"$name","base_crs":${geogJson(base, topLevel = false)},"conversion":{"name":"${conv.name}","method":{"name":"${conv.methodName}","id":${idJson("EPSG", conv.methodCode)}},"parameters":[${conv.params.map(paramJson).mkString(",")}]},"coordinate_system":{"subtype":"Cartesian","axis":[{"name":"Easting","abbreviation":"E","direction":"east","unit":"metre"},{"name":"Northing","abbreviation":"N","direction":"north","unit":"metre"}]},"id":${idJson("EPSG", code)}}"""

  /** PROJJSON for `EPSG:nnnn` / `OGC:CRS84` strings; None when the code
    * has no table entry (caller falls back to the plain string form). */
  def forCrs(crs: String): Option[String] = {
    val t = crs.trim
    if (t.equalsIgnoreCase("OGC:CRS84")) {
      // CRS84 is axis-swapped WGS 84; emit it as its own identity
      return Some(s"""{"$$schema":"https://proj.org/schemas/v0.7/projjson.schema.json","type":"GeographicCRS","name":"WGS 84 (CRS84)","datum":{"type":"GeodeticReferenceFrame","name":"World Geodetic System 1984","ellipsoid":${ellJson(Wgs84)},"id":${idJson("EPSG", 6326)}},"coordinate_system":{"subtype":"ellipsoidal","axis":[{"name":"Geodetic longitude","abbreviation":"Lon","direction":"east","unit":"degree"},{"name":"Geodetic latitude","abbreviation":"Lat","direction":"north","unit":"degree"}]},"id":${idJson("OGC", 0).replace("\"code\":0", "\"code\":\"CRS84\"")}}""")
    }
    if (!t.toUpperCase.startsWith("EPSG:")) return None
    val code = try t.drop(5).trim.toInt catch { case _: NumberFormatException => return None }
    code match {
      case 4326 => Some(geogJson(Geo4326, topLevel = true))
      case 4258 => Some(geogJson(Geo4258, topLevel = true))
      case 4269 => Some(geogJson(Geo4269, topLevel = true))
      case 4277 => Some(geogJson(Geo4277, topLevel = true))
      case 4171 => Some(geogJson(Geo4171, topLevel = true))
      case c => projected(c).map { case (name, base, conv) =>
        projJson(c, name, base, conv)
      }
    }
  }

  // ------------------------------------------------------------------
  // PROJJSON parsing — the READ side. Extracts the ellipsoid, datum
  // name, conversion method and normalized parameters so CrsTransform
  // can drive its projection kernels from ANY parameterized PROJJSON,
  // not only enumerated EPSG codes — the behavior the reference gets
  // from PROJ itself (c/sedona-proj/src/transform.rs:36,258 builds the
  // pipeline from the CRS definition, not from an id table).

  /** One parsed conversion: EPSG method code + (EPSG parameter code ->
    * value in degrees / metres / unity). */
  final case class ParsedConv(methodName: String, methodCode: Int,
      params: Map[Int, Double])

  /** Parsed CRS subset: kind ("geographic" | "projected"), EPSG id (0 if
    * the JSON carries none), ellipsoid (a, 1/f — rf 0 means a sphere),
    * datum name, and the conversion for projected CRS. */
  final case class ParsedCrs(kind: String, name: String, code: Int,
      a: Double, rf: Double, datumName: String, conv: Option[ParsedConv])

  /** EPSG parameter codes by lowercase name, for writers that omit the
    * optional parameter ids (the proj.org schema allows it). */
  private[graft] val ParamCodeByName: Map[String, Int] = Map(
    "latitude of natural origin" -> 8801,
    "longitude of natural origin" -> 8802,
    "scale factor at natural origin" -> 8805,
    "false easting" -> 8806,
    "false northing" -> 8807,
    "latitude of false origin" -> 8821,
    "longitude of false origin" -> 8822,
    "latitude of 1st standard parallel" -> 8823,
    "latitude of 2nd standard parallel" -> 8824,
    "easting at false origin" -> 8826,
    "northing at false origin" -> 8827,
    "latitude of standard parallel" -> 8832,
    "longitude of origin" -> 8833,
    "latitude of projection centre" -> 8811,
    "longitude of projection centre" -> 8812,
    "azimuth at projection centre" -> 8813,
    "azimuth of initial line" -> 8813,
    "angle from rectified to skew grid" -> 8814,
    "scale factor at projection centre" -> 8815,
    "scale factor on initial line" -> 8815,
    "easting at projection centre" -> 8816,
    "northing at projection centre" -> 8817,
    "latitude of pseudo standard parallel" -> 8818,
    "scale factor on pseudo standard parallel" -> 8819,
    "co-latitude of cone axis" -> 1036)

  private[graft] val MethodCodeByName: Map[String, Int] = Map(
    "transverse mercator" -> 9807,
    "lambert conic conformal (2sp)" -> 9802,
    "lambert azimuthal equal area" -> 9820,
    "albers equal area" -> 9822,
    "polar stereographic (variant a)" -> 9810,
    "polar stereographic (variant b)" -> 9829,
    "mercator (variant a)" -> 9804,
    "mercator (variant b)" -> 9805,
    "popular visualisation pseudo mercator" -> 1024,
    "lambert conic conformal (1sp)" -> 9801,
    "hotine oblique mercator (variant a)" -> 9812,
    "hotine oblique mercator (variant b)" -> 9815,
    "krovak" -> 9819,
    "krovak (north orientated)" -> 1041)

  /** Parse a PROJJSON Geographic/Geodetic/Projected CRS; None for other
    * types (compound, bound, engineering) or malformed JSON. */
  def parseCrs(json: String): Option[ParsedCrs] = try {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.readTree(json)
    def idCode(node: com.fasterxml.jackson.databind.JsonNode): Int = {
      val c = node.path("id").path("code")
      if (c.isInt || c.isLong) c.asInt else 0
    }
    // numeric-or-{value,unit} scalar; converted to metres for linear
    // units and DEGREES for angular units via the conversion_factor
    def scalarOf(node: com.fasterxml.jackson.databind.JsonNode): Double =
      if (node.isObject) {
        val v = node.path("value").asDouble
        val unit = node.path("unit")
        if (unit.isObject) {
          val cf = unit.path("conversion_factor").asDouble(1.0)
          val utype = unit.path("type").asText("")
          if (utype.equalsIgnoreCase("AngularUnit"))
            math.toDegrees(v * cf) // cf converts to radians (SI)
          else v * cf // LinearUnit cf converts to metres
        } else unitScaled(v, unit.asText("metre"))
      } else node.asDouble
    def unitScaled(v: Double, unit: String): Double = unit.toLowerCase match {
      case "degree" | "metre" | "meter" | "unity" | "" => v
      case "grad" => v * 0.9
      case "arc-second" => v / 3600.0
      case other => throw new IllegalArgumentException(s"PROJJSON unit '$other'")
    }
    def ellOf(crsNode: com.fasterxml.jackson.databind.JsonNode): (Double, Double, String) = {
      val datum =
        if (!crsNode.path("datum").isMissingNode) crsNode.path("datum")
        else crsNode.path("datum_ensemble")
      val ell = datum.path("ellipsoid")
      if (ell.isMissingNode) throw new IllegalArgumentException("PROJJSON: no ellipsoid")
      val a =
        if (!ell.path("semi_major_axis").isMissingNode)
          scalarOf(ell.path("semi_major_axis"))
        else scalarOf(ell.path("radius"))
      val rf =
        if (!ell.path("inverse_flattening").isMissingNode)
          scalarOf(ell.path("inverse_flattening"))
        else if (!ell.path("semi_minor_axis").isMissingNode) {
          val b = scalarOf(ell.path("semi_minor_axis"))
          if (a == b) 0.0 else a / (a - b)
        } else if (ell.path("radius").isMissingNode)
          throw new IllegalArgumentException("PROJJSON: no flattening")
        else 0.0 // sphere
      (a, rf, datum.path("name").asText(""))
    }
    n.path("type").asText("") match {
      case "GeographicCRS" | "GeodeticCRS" =>
        val (a, rf, dn) = ellOf(n)
        Some(ParsedCrs("geographic", n.path("name").asText(""), idCode(n), a, rf, dn, None))
      case "ProjectedCRS" =>
        val base = n.path("base_crs")
        val (a, rf, dn) = ellOf(base)
        val conv = n.path("conversion")
        val method = conv.path("method")
        val mCode = {
          val c = idCode(method)
          if (c != 0) c
          else MethodCodeByName.getOrElse(method.path("name").asText("").trim.toLowerCase,
            throw new IllegalArgumentException(
              s"PROJJSON: unknown conversion method '${method.path("name").asText("")}'"))
        }
        val params = {
          val it = conv.path("parameters").elements()
          val b = Map.newBuilder[Int, Double]
          while (it.hasNext) {
            val p = it.next()
            val c0 = idCode(p)
            val code = if (c0 != 0) c0
              else ParamCodeByName.getOrElse(p.path("name").asText("").trim.toLowerCase, 0)
            if (code != 0) {
              val raw = p.path("value")
              val v =
                if (p.path("unit").isMissingNode) scalarOf(raw)
                else if (p.path("unit").isObject) {
                  val cf = p.path("unit").path("conversion_factor").asDouble(1.0)
                  val utype = p.path("unit").path("type").asText("")
                  if (utype.equalsIgnoreCase("AngularUnit")) math.toDegrees(raw.asDouble * cf)
                  else raw.asDouble * cf
                } else unitScaled(raw.asDouble, p.path("unit").asText(""))
              b += code -> v
            }
          }
          b.result()
        }
        Some(ParsedCrs("projected", n.path("name").asText(""), idCode(n), a, rf, dn,
          Some(ParsedConv(method.path("name").asText(""), mCode, params))))
      case _ => None
    }
  } catch { case _: IllegalArgumentException => None
            case _: com.fasterxml.jackson.core.JacksonException => None }
}
