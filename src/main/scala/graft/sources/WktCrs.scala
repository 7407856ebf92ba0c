package graft.sources

/** WKT1 / WKT2 CRS parameter extraction into the same `ParsedCrs` shape
  * PROJJSON parsing produces, so a WKT body WITHOUT an EPSG authority id
  * (common in GeoTIFF/GeoPackage exports of custom CRS) still drives the
  * parameterized projection kernels. The reference reaches the same
  * behavior by handing any CRS text to PROJ
  * (c/sedona-proj/src/transform.rs:36,258).
  *
  * Supported roots: PROJCRS/PROJCS (projected), GEOGCRS/GEOGCS/GEODCRS
  * (geographic). WKT2 parameters carry their own ANGLEUNIT/LENGTHUNIT
  * and optional ID[] nodes; WKT1 parameter names are method-contextual
  * snake_case (GDAL convention) and use the GEOGCS/PROJCS units.
  */
object WktCrs {

  /** One WKT node: `NAME[arg, arg, ...]`; args are String | Double | Node. */
  final case class Node(name: String, args: Vector[Any]) {
    def children: Seq[Node] = args.collect { case n: Node => n }
    def child(names: String*): Option[Node] = {
      val up = names.map(_.toUpperCase).toSet
      children.find(c => up.contains(c.name.toUpperCase))
    }
    def str(i: Int): Option[String] = args.lift(i).collect { case s: String => s }
    def num(i: Int): Option[Double] = args.lift(i).collect { case d: Double => d }
    /** First numeric argument anywhere in the arg list. */
    def firstNum: Option[Double] = args.collectFirst { case d: Double => d }
  }

  /** Parse a WKT tree; None on malformed text. */
  def parseTree(wkt: String): Option[Node] = try {
    val s = wkt.trim
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def node(): Node = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      val name = s.substring(start, i)
      ws()
      val open = s(i)
      require(open == '[' || open == '(', s"expected bracket after $name")
      val close = if (open == '[') ']' else ')'
      i += 1
      val args = Vector.newBuilder[Any]
      var done = false
      while (!done) {
        ws()
        s(i) match {
          case `close` => i += 1; done = true
          case ',' => i += 1
          case '"' =>
            i += 1
            val sb = new StringBuilder
            while (!(s(i) == '"' && (i + 1 >= s.length || s(i + 1) != '"'))) {
              if (s(i) == '"') { sb += '"'; i += 2 } else { sb += s(i); i += 1 }
            }
            i += 1
            args += sb.result()
          case c if c.isLetter =>
            // identifier: a nested node when followed by a bracket, else
            // a bare keyword arg (WKT2 writes CS[Cartesian,2])
            val ns = i
            while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
            val word = s.substring(ns, i)
            ws()
            if (i < s.length && (s(i) == '[' || s(i) == '(')) {
              i = ns
              args += node()
            } else args += word
          case _ =>
            val ns = i
            while (i < s.length && "+-.0123456789eE".indexOf(s(i)) >= 0) i += 1
            args += s.substring(ns, i).toDouble
        }
      }
      Node(name, args.result())
    }
    val root = node()
    ws()
    if (i == s.length) Some(root) else None
  } catch { case _: Exception => None }

  /** WKT1 PROJECTION names (GDAL snake_case and ESRI spaced forms) to
    * EPSG method codes. */
  private val Wkt1MethodByName: Map[String, Int] = Map(
    "transverse_mercator" -> 9807,
    "lambert_conformal_conic_2sp" -> 9802,
    "lambert_conformal_conic_1sp" -> 9801,
    "albers_conic_equal_area" -> 9822,
    "lambert_azimuthal_equal_area" -> 9820,
    "polar_stereographic" -> 9810,
    "mercator_1sp" -> 9804,
    "hotine_oblique_mercator" -> 9812,
    "hotine_oblique_mercator_azimuth_center" -> 9815,
    "krovak" -> 1041) // GDAL WKT1 Krovak is the East-North (GIS) form

  /** WKT1 parameter name -> EPSG parameter code, contextual on the
    * method (latitude_of_origin is 8801 for TM but 8821 for LCC-2SP;
    * scale_factor is 8805/8815/8819 by family — the PROJ mapping). */
  private def wkt1ParamCode(method: Int, name: String): Option[Int] = {
    val n = name.toLowerCase
    method match {
      case 9802 | 9822 => n match { // false-origin family
        case "latitude_of_origin" | "latitude_of_center" => Some(8821)
        case "central_meridian" | "longitude_of_center" => Some(8822)
        case "standard_parallel_1" => Some(8823)
        case "standard_parallel_2" => Some(8824)
        case "false_easting" => Some(8826)
        case "false_northing" => Some(8827)
        case _ => None
      }
      case 9812 | 9815 => n match { // oblique mercator
        case "latitude_of_center" => Some(8811)
        case "longitude_of_center" => Some(8812)
        case "azimuth" => Some(8813)
        case "rectified_grid_angle" => Some(8814)
        case "scale_factor" => Some(8815)
        case "false_easting" => Some(if (method == 9815) 8816 else 8806)
        case "false_northing" => Some(if (method == 9815) 8817 else 8807)
        case _ => None
      }
      case 9819 | 1041 => n match { // krovak
        case "latitude_of_center" => Some(8811)
        case "longitude_of_center" => Some(8833)
        case "azimuth" => Some(1036)
        case "pseudo_standard_parallel_1" => Some(8818)
        case "scale_factor" => Some(8819)
        case "false_easting" => Some(8806)
        case "false_northing" => Some(8807)
        case _ => None
      }
      case _ => n match { // natural-origin family (TM, LCC-1SP, merc, PS, LAEA)
        case "latitude_of_origin" | "latitude_of_center" => Some(8801)
        case "central_meridian" | "longitude_of_center" => Some(8802)
        case "scale_factor" => Some(8805)
        case "false_easting" => Some(8806)
        case "false_northing" => Some(8807)
        case "standard_parallel_1" => Some(8832) // polar stereographic B
        case _ => None
      }
    }
  }

  private def epsgId(n: Node): Int =
    n.child("ID", "AUTHORITY").filter(_.str(0).exists(_.equalsIgnoreCase("EPSG")))
      .flatMap(id => id.num(1).map(_.toInt).orElse(id.str(1).map(_.trim.toInt)))
      .getOrElse(0)

  /** Unit conversion factor of a WKT2 unit node argument list:
    * ANGLEUNIT["degree", 0.0174...] (to radians) or LENGTHUNIT
    * ["metre", 1]. Returns the parameter value normalized to
    * degrees/metres. */
  private def normalized(value: Double, param: Node): Double =
    param.child("ANGLEUNIT", "UNIT").flatMap(_.num(1)) match {
      case Some(cf) if param.child("ANGLEUNIT").isDefined =>
        math.toDegrees(value * cf)
      case _ =>
        param.child("LENGTHUNIT").flatMap(_.num(1)) match {
          case Some(cf) => value * cf
          case None => value // degree/metre/unity defaults
        }
    }

  /** Extract the `ParsedCrs` parameter set from WKT1/WKT2 text; None if
    * the text is not a parseable geographic/projected CRS. */
  def parseCrs(wkt: String): Option[ProjJson.ParsedCrs] =
    parseTree(wkt).flatMap { root =>
      root.name.toUpperCase match {
        case "GEOGCRS" | "GEOGCS" | "GEODCRS" => geographic(root)
        case "PROJCRS" | "PROJCS" => projectedCrs(root)
        case _ => None
      }
    }

  private def geographic(g: Node): Option[ProjJson.ParsedCrs] = {
    val datum = g.child("DATUM", "TRF", "GEODETICDATUM")
      .orElse(g.child("ENSEMBLE"))
    val ell = datum.flatMap(_.child("ELLIPSOID", "SPHEROID"))
    for {
      d <- datum
      e <- ell
      a <- e.num(1)
    } yield ProjJson.ParsedCrs("geographic", g.str(0).getOrElse(""), epsgId(g),
      a, e.num(2).getOrElse(0.0), d.str(0).getOrElse(""), None)
  }

  private def projectedCrs(p: Node): Option[ProjJson.ParsedCrs] = {
    val base = p.child("BASEGEOGCRS", "GEOGCS", "BASEGEODCRS")
    val geog = base.flatMap(geographic)
    if (geog.isEmpty) return None
    val g = geog.get
    // WKT2: CONVERSION[..., METHOD[...], PARAMETER[...]*]
    // WKT1: PROJECTION["name"] + PARAMETER["name", v]* directly under PROJCS
    val conv = p.child("CONVERSION")
    val (methodName, methodCode, isWkt2) = conv match {
      case Some(c) =>
        val m = c.child("METHOD", "PROJECTION")
        val name = m.flatMap(_.str(0)).getOrElse("")
        val code = m.map(epsgId).filter(_ != 0).getOrElse(
          ProjJson.MethodCodeByName.getOrElse(name.toLowerCase,
            Wkt1MethodByName.getOrElse(name.toLowerCase.replace(' ', '_'), 0)))
        (name, code, true)
      case None =>
        val name = p.child("PROJECTION").flatMap(_.str(0)).getOrElse("")
        val code = Wkt1MethodByName.getOrElse(name.toLowerCase,
          ProjJson.MethodCodeByName.getOrElse(name.toLowerCase, 0))
        (name, code, false)
    }
    if (methodCode == 0) return None
    // WKT1 lengths are in the PROJCS UNIT (metre factor), angles in the
    // GEOGCS UNIT (degree factor)
    val wkt1LenCf = p.children.filter(_.name.equalsIgnoreCase("UNIT"))
      .flatMap(_.num(1)).headOption.getOrElse(1.0)
    val wkt1AngCf = base.flatMap(_.child("UNIT")).flatMap(_.num(1))
      .map(cf => math.toDegrees(cf)).getOrElse(1.0)
    val paramNodes =
      (if (isWkt2) conv.get.children else p.children)
        .filter(_.name.equalsIgnoreCase("PARAMETER"))
    val params = paramNodes.flatMap { pn =>
      val name = pn.str(0).getOrElse("")
      val raw = pn.firstNum.getOrElse(0.0)
      val code =
        if (isWkt2 && epsgId(pn) != 0) Some(epsgId(pn))
        else ProjJson.ParamCodeByName.get(name.toLowerCase)
          .orElse(wkt1ParamCode(methodCode, name))
      val value =
        if (isWkt2 && (pn.child("ANGLEUNIT").isDefined ||
          pn.child("LENGTHUNIT").isDefined)) normalized(raw, pn)
        else code match {
          // angular parameter codes get the WKT1 angle factor, linear
          // ones the length factor (scale factors are unitless)
          case Some(c) if Set(8801, 8802, 8811, 8812, 8813, 8814, 8818,
            8821, 8822, 8823, 8824, 8832, 8833, 1036).contains(c) =>
            raw * wkt1AngCf
          case Some(c) if Set(8806, 8807, 8816, 8817, 8826, 8827).contains(c) =>
            raw * wkt1LenCf
          case _ => raw
        }
      code.map(_ -> value)
    }.toMap
    Some(ProjJson.ParsedCrs("projected", p.str(0).getOrElse(""), epsgId(p),
      g.a, g.rf, g.datumName,
      Some(ProjJson.ParsedConv(methodName, methodCode, params))))
  }
}
