package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.PreparedGeometryFactory
import graft.geom.GeomIO
import RasterModel.{Band, Raster}

/** Window / resample / rasterize / vectorize raster kernels — pure-math
  * ports of the reference's GDAL-backed surface
  * (rust/sedona-raster-gdal/src: rs_clip.rs, rs_tile.rs, rs_resample.rs,
  * rs_reproject_match.rs, rs_as_raster.rs, rs_polygonize.rs,
  * rs_zonal_stats.rs) over the in-db f64 band model. CRS warps use the
  * hand-coded EPSG subset in [[CrsTransform]] (no GDAL/PROJ offline).
  */
object RasterOps {
  import ArgKind._

  type B = Seq[Expression] => Expression

  private def fnv(name: String, out: DataType, arities: Seq[Seq[ArgKind.Value]])(
      k: Array[Any] => Any): (String, B) = {
    val byArity = arities.map(ks => ks.length -> ks).toMap
    name -> ((children: Seq[Expression]) => GeomScalar(name, children, out,
      byArity.getOrElse(children.length, throw new IllegalArgumentException(
        s"$name: expected ${byArity.keys.toSeq.sorted.mkString("/")} args, got ${children.length}")),
      k))
  }

  @inline private def rast(a: Array[Any], i: Int = 0): Raster =
    RasterModel.fromRow(a(i).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
  @inline private def d(a: Array[Any], i: Int): Double = a(i).asInstanceOf[Double]
  @inline private def ii(a: Array[Any], i: Int): Int = a(i).asInstanceOf[Int]
  @inline private def bb(a: Array[Any], i: Int): Boolean = a(i).asInstanceOf[Boolean]

  /** Raw band value at (col, row) ignoring nodata masking; NaN outside.
    * N-D bands (dims beyond y/x) would silently alias slice 0 under the
    * 2D row-major layout assumed here — fail loudly instead. */
  @inline private def rawValue(r: Raster, band1: Int, c: Int, row: Int): Double = {
    val band = r.bands(band1 - 1)
    require(band.dims == null || band.dims.length == 2,
      s"band $band1 carries ${band.dims.length} dims (${band.dims.mkString(",")}); " +
        "2D pixel kernels require a y/x band — rs_dimtoband/rs_slice first")
    if (c < 0 || c >= r.width || row < 0 || row >= r.height) return Double.NaN
    val data = band.data
    java.lang.Double.longBitsToDouble(
      readLongLE(data, (row.toLong * r.width + c).toInt * 8))
  }

  @inline private def readLongLE(b: Array[Byte], off: Int): Long = {
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24) | ((b(off + 4) & 0xffL) << 32) |
      ((b(off + 5) & 0xffL) << 40) | ((b(off + 6) & 0xffL) << 48) |
      ((b(off + 7) & 0xffL) << 56)
  }

  @inline private def isNd(v: Double, nodata: Double): Boolean =
    v.isNaN || v == nodata

  /** Pixel window (inclusive col/row bounds, clamped) covering a world
    * envelope under the raster's inverse affine. `pad` widens the window
    * by that many pixels on every side before clamping — all-touched
    * scans pass 1 so edge-touching cells enter the scan symmetrically
    * (the exact pixelHit intersects test still decides membership). */
  private def windowOf(r: Raster, env: org.locationtech.jts.geom.Envelope,
      pad: Int = 0): Option[(Int, Int, Int, Int)] = {
    val cs = Seq(
      r.rasterCoord(env.getMinX, env.getMinY), r.rasterCoord(env.getMinX, env.getMaxY),
      r.rasterCoord(env.getMaxX, env.getMinY), r.rasterCoord(env.getMaxX, env.getMaxY))
    val c0 = math.max(0, math.floor(cs.map(_._1).min).toInt - pad)
    val c1 = math.min(r.width - 1, math.ceil(cs.map(_._1).max).toInt - 1 + pad)
    val r0 = math.max(0, math.floor(cs.map(_._2).min).toInt - pad)
    val r1 = math.min(r.height - 1, math.ceil(cs.map(_._2).max).toInt - 1 + pad)
    if (c0 > c1 || r0 > r1) None else Some((c0, c1, r0, r1))
  }

  /** Geotransform translated so pixel (c0, r0) becomes the origin. */
  private def shiftGt(gt: Array[Double], c0: Double, r0: Double): Array[Double] =
    Array(gt(0) + c0 * gt(1) + r0 * gt(2), gt(1), gt(2),
      gt(3) + c0 * gt(4) + r0 * gt(5), gt(4), gt(5))

  /** Pixel hit test: center covered, or (allTouched) cell box intersects. */
  private def pixelHit(r: Raster, pg: org.locationtech.jts.geom.prep.PreparedGeometry,
      c: Int, row: Int, allTouched: Boolean): Boolean = {
    if (allTouched) {
      val xs = Seq(r.worldX(c, row), r.worldX(c + 1, row), r.worldX(c, row + 1),
        r.worldX(c + 1, row + 1))
      val ys = Seq(r.worldY(c, row), r.worldY(c + 1, row), r.worldY(c, row + 1),
        r.worldY(c + 1, row + 1))
      pg.intersects(GeomIO.envelope(xs.min, ys.min, xs.max, ys.max))
    } else pg.covers(GeomIO.point(r.worldX(c + 0.5, row + 0.5), r.worldY(c + 0.5, row + 0.5)))
  }

  /** Zone pixel values for the zonal kernels (band `band1`, ROI hit test,
    * optional nodata exclusion), window-clipped to the ROI envelope. */
  private def zoneValues(r: Raster, zone: Geometry, band1: Int,
      allTouched: Boolean, excludeNoData: Boolean): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    windowOf(r, zone.getEnvelopeInternal, if (allTouched) 1 else 0)
        .foreach { case (c0, c1, r0, r1) =>
      val pg = PreparedGeometryFactory.prepare(zone)
      val nodata = r.bands(band1 - 1).nodata
      var row = r0
      while (row <= r1) {
        var c = c0
        while (c <= c1) {
          if (pixelHit(r, pg, c, row, allTouched)) {
            val v = rawValue(r, band1, c, row)
            // nodata-only exclusion: a NaN pixel is dropped only when the
            // band's nodata is itself NaN — otherwise it stays and poisons
            // the statistics (rs_zonal_stats.rs / numpy semantics)
            if (!(excludeNoData && (v == nodata || (v.isNaN && nodata.isNaN))))
              out += v
          }
          c += 1
        }
        row += 1
      }
    }
    out.toArray
  }

  /** (short name, min, max, integral) for a declared pixel type; null
    * ptype = natively f64. Short names follow the reference's
    * BandDataType Display (raster.rs), used in error messages. */
  private def dtypeInfo(ptype: String): (String, Double, Double, Boolean) =
    ptype match {
      case "UNSIGNED_8BITS" => ("UInt8", 0.0, 255.0, true)
      case "SIGNED_8BITS" => ("Int8", -128.0, 127.0, true)
      case "UNSIGNED_16BITS" => ("UInt16", 0.0, 65535.0, true)
      case "SIGNED_16BITS" => ("Int16", -32768.0, 32767.0, true)
      case "UNSIGNED_32BITS" => ("UInt32", 0.0, 4294967295.0, true)
      case "SIGNED_32BITS" => ("Int32", Int.MinValue.toDouble, Int.MaxValue.toDouble, true)
      case "UNSIGNED_64BITS" => ("UInt64", 0.0, 1.8446744073709552E19, true)
      case "SIGNED_64BITS" => ("Int64", Long.MinValue.toDouble, Long.MaxValue.toDouble, true)
      case "REAL_32BITS" => ("Float32", -java.lang.Float.MAX_VALUE.toDouble,
        java.lang.Float.MAX_VALUE.toDouble, false)
      case _ => ("Float64", -Double.MaxValue, Double.MaxValue, false)
    }

  /** The dtype minimum — the default nodata sentinel when neither an
    * explicit value nor a band nodata exists (rs_clip.rs). */
  private def declaredDtypeMin(ptype: String): Double = dtypeInfo(ptype)._2

  /** RS_AsRaster pixelType tokens -> declared ptype name
    * (rs_as_raster.rs:271-290 parse_pixel_type). */
  private def parsePixelTypeToken(s: String): String =
    s.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "d" | "float64" => "REAL_64BITS"
      case "f" | "float32" => "REAL_32BITS"
      case "i" | "int32" => "SIGNED_32BITS"
      case "ui" | "uint32" => "UNSIGNED_32BITS"
      case "s" | "int16" => "SIGNED_16BITS"
      case "us" | "uint16" => "UNSIGNED_16BITS"
      case "b" | "uint8" => "UNSIGNED_8BITS"
      case "i8" | "int8" => "SIGNED_8BITS"
      case "u64" | "uint64" => "UNSIGNED_64BITS"
      case "i64" | "int64" => "SIGNED_64BITS"
      case other => throw new IllegalArgumentException(
        s"Unsupported pixelType: $other (expected one of D/F/I/UI/S/US/B/I8/U64/I64 " +
          "or int8/uint8/int16/uint16/int32/uint32/int64/uint64/float32/float64)")
    }

  /** Validating cast of a fill/nodata value into the declared dtype
    * (rs_as_raster.rs:342-407): integral dtypes require an exactly-
    * representable integer in range; float32 narrows. Returns the value
    * as stored in the band. */
  private def castToDtype(role: String, v: Double, ptype: String): Double = {
    val (name, min, max, integral) = dtypeInfo(ptype)
    if (integral) {
      require(java.lang.Double.isFinite(v), s"$role must be finite for $name: $v")
      require(v == math.rint(v), s"$role must be an integer for $name: $v")
      require(v >= min && v <= max, s"$role is out of range for $name: $v")
      v
    } else if (name == "Float32") {
      val f = v.toFloat
      require(!java.lang.Double.isFinite(v) || java.lang.Float.isFinite(f),
        s"$role is out of range for $name: $v")
      f.toDouble
    } else v
  }

  /** GDAL-style burn-value write conversion (GDALCopyWords semantics):
    * round to nearest and clamp for integral dtypes, narrow for f32. */
  private def storeToDtype(v: Double, ptype: String): Double = {
    val (name, min, max, integral) = dtypeInfo(ptype)
    if (integral) {
      if (v.isNaN) 0.0 else math.min(max, math.max(min, math.rint(v)))
    } else if (name == "Float32") v.toFloat.toDouble
    else v
  }

  /** An explicit nodata must be representable in the band's declared
    * dtype (integral + in range for integer dtypes, in range for floats). */
  private def validateNodata(fname: String, v: Double, ptype: String): Unit = {
    val (name, min, max, integral) = dtypeInfo(ptype)
    val ok = if (integral) v == math.rint(v) && v >= min && v <= max
      else v.isNaN || (v >= min && v <= max)
    require(ok, s"$fname: $v is not a valid $name value")
  }

  private def sampleNearest(src: Raster, band1: Int, fc: Double, fr: Double): Double = {
    val c = math.floor(fc).toInt; val row = math.floor(fr).toInt
    rawValue(src, band1, c, row)
  }

  /** Bilinear sample in pixel-center space; nodata/outside neighbors make
    * the result nodata (NaN). */
  private def sampleBilinear(src: Raster, band1: Int, fc: Double, fr: Double,
      nodata: Double): Double = {
    val cx = fc - 0.5; val cy = fr - 0.5
    val c0 = math.floor(cx).toInt; val r0 = math.floor(cy).toInt
    val tx = cx - c0; val ty = cy - r0
    val v00 = rawValue(src, band1, c0, r0)
    val v10 = rawValue(src, band1, c0 + 1, r0)
    val v01 = rawValue(src, band1, c0, r0 + 1)
    val v11 = rawValue(src, band1, c0 + 1, r0 + 1)
    if (isNd(v00, nodata) || isNd(v10, nodata) || isNd(v01, nodata) || isNd(v11, nodata))
      Double.NaN
    else (v00 * (1 - tx) + v10 * tx) * (1 - ty) + (v01 * (1 - tx) + v11 * tx) * ty
  }

  private def parseAlgorithm(s: String): Boolean = s.toLowerCase match {
    case "nearestneighbor" | "nearestneighbour" | "nearest" | "nn" | "near" => false
    case "bilinear" => true
    case other => throw new IllegalArgumentException(
      s"unknown algorithm '$other' (NearestNeighbor/Bilinear)")
  }

  /** Resample `src` band-for-band onto the grid (gt, w, h) in the same
    * coordinate space as `worldToSrc` maps from (identity for RS_Resample,
    * a CRS warp for RS_ReprojectMatch).
    *
    * `fillNoNodata`: value for uncovered output cells when the band has no
    * nodata — RS_ReprojectMatch prefills with 0.0 like GDAL's warp
    * (rs_reproject_match.rs:198 `.unwrap_or(0.0)`), RS_Resample keeps NaN.
    * `maskBilinearNodata=false` reproduces the warp's pass-through: source
    * nodata values blend raw instead of poisoning the sample. */
  private def resampleTo(src: Raster, gt: Array[Double], w: Int, h: Int, crs: String,
      bilinear: Boolean, worldToSrc: (Double, Double) => (Double, Double),
      fillNoNodata: Double = Double.NaN,
      maskBilinearNodata: Boolean = true): Any = {
    val out = Raster(crs, gt, w, h, IndexedSeq.empty)
    val bands = src.bands.zipWithIndex.map { case (b, bi) =>
      val fill = if (!b.nodata.isNaN) b.nodata else fillNoNodata
      val vals = new Array[Double](w * h)
      var row = 0
      while (row < h) {
        var c = 0
        while (c < w) {
          val wx = out.worldX(c + 0.5, row + 0.5)
          val wy = out.worldY(c + 0.5, row + 0.5)
          val (sx, sy) = worldToSrc(wx, wy)
          val (fc, fr) = src.rasterCoord(sx, sy)
          val v =
            if (bilinear && maskBilinearNodata)
              sampleBilinear(src, bi + 1, fc, fr, b.nodata)
            else if (bilinear) sampleBilinearRaw(src, bi + 1, fc, fr)
            else sampleNearest(src, bi + 1, fc, fr)
          vals(row * w + c) = if (v.isNaN) fill else v
          c += 1
        }
        row += 1
      }
      Band(b.nodata, RasterModel.packDoubles(vals), ptype = b.ptype)
    }
    RasterModel.toRow(crs, gt, w, h, bands, src.path)
  }

  /** Bilinear without source-nodata masking (GDAL warp pass-through):
    * in-bounds nodata pixels blend as raw numbers; a sample touching any
    * out-of-bounds neighbor is NaN (→ caller's fill). */
  private def sampleBilinearRaw(src: Raster, band1: Int, fc: Double, fr: Double): Double = {
    val cx = fc - 0.5; val cy = fr - 0.5
    val c0 = math.floor(cx).toInt; val r0 = math.floor(cy).toInt
    val tx = cx - c0; val ty = cy - r0
    val v00 = rawValue(src, band1, c0, r0)
    val v10 = rawValue(src, band1, c0 + 1, r0)
    val v01 = rawValue(src, band1, c0, r0 + 1)
    val v11 = rawValue(src, band1, c0 + 1, r0 + 1)
    (v00 * (1 - tx) + v10 * tx) * (1 - ty) + (v01 * (1 - tx) + v11 * tx) * ty
  }

  /** Int64/UInt64 bands cannot survive a float-routed warp — rejected up
    * front with the reference's message (utils.rs:369, shared by
    * RS_Resample's regrid path and RS_ReprojectMatch always). */
  private def rejectInt64Warp(fname: String, r: Raster): Unit =
    r.bands.foreach { b =>
      require(b.ptype != "SIGNED_64BITS" && b.ptype != "UNSIGNED_64BITS",
        s"$fname does not support Int64/UInt64 rasters: GDAL routes 64-bit " +
          "integer pixels through a floating working type that cannot represent " +
          "them exactly; cast to Int32/Float64 first.")
    }

  private val tileStructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("tile", RasterModel.dataType)))

  val registry: Map[String, B] = Map(
    // ------------------------------------------------------------------
    // RS_Clip(raster, band, geom[, allTouched[, noDataValue[, crop]]])
    // (rs_clip.rs:57-65; lenient arg omitted — we always error loudly).
    // Single selected band, pixels outside `geom` set to nodata; crop
    // (default true) shrinks the extent to the geometry's pixel window.
    // RS_Clip(raster, band, geom[, allTouched[, noData[, crop[, lenient]]]])
    // (rs_clip.rs; defaults all_touched=false, noData=the band's own —
    // falling back to the declared dtype's minimum when the band has
    // none — crop=true, lenient=true). An empty mask is NULL when
    // lenient; strict distinguishes a disjoint geometry ("do not
    // intersect") from one that covers no pixel center ("selects no
    // pixels"). An explicit noData must be representable in the band's
    // declared dtype.
    fnv("rs_clip", RasterModel.dataType,
        Seq(Seq(Raw, Int_, Geom), Seq(Raw, Int_, Geom, Bool),
          Seq(Raw, Int_, Geom, Bool, Dbl), Seq(Raw, Int_, Geom, Bool, Dbl, Bool),
          Seq(Raw, Int_, Geom, Bool, Dbl, Bool, Bool)))(a => {
      val r = rast(a)
      val band = ii(a, 1)
      val g = a(2).asInstanceOf[Geometry]
      val allTouched = a.length > 3 && bb(a, 3)
      require(band >= 1 && band <= r.bands.length, s"rs_clip: band $band out of range")
      val srcBand = r.bands(band - 1)
      val nodata =
        if (a.length > 4) {
          val nd = d(a, 4); validateNodata("rs_clip", nd, srcBand.ptype); nd
        } else if (!srcBand.nodata.isNaN) srcBand.nodata
        else declaredDtypeMin(srcBand.ptype)
      val crop = a.length <= 5 || bb(a, 5)
      val lenient = a.length <= 6 || bb(a, 6)
      // strict empty-mask errors distinguish a truly disjoint geometry
      // from one that overlaps the footprint but covers no pixel center
      def emptyResult(): Any =
        if (lenient) null
        else {
          val quad = GeomIO.factory.createPolygon(Array((0, 0), (r.width, 0),
            (r.width, r.height), (0, r.height), (0, 0)).map { case (c, row) =>
            new org.locationtech.jts.geom.Coordinate(r.worldX(c, row), r.worldY(c, row))
          })
          if (!g.intersects(quad)) throw new IllegalArgumentException(
            "rs_clip: the raster and geometry do not intersect")
          else throw new IllegalArgumentException(
            "rs_clip: the geometry selects no pixels (pass all_touched or lenient)")
        }
      // crop extent is always the tight envelope window (GDAL cutline
      // semantics); all-touched only widens the *scan* when the full
      // extent is kept, so edge-touching cells can be written.
      windowOf(r, g.getEnvelopeInternal,
          if (allTouched && !crop) 1 else 0) match {
        case None => emptyResult()
        case Some((c0, c1, r0, r1)) =>
          val (w0, h0, cOff, rOff) =
            if (crop) (c1 - c0 + 1, r1 - r0 + 1, c0, r0)
            else (r.width, r.height, 0, 0)
          val pg = PreparedGeometryFactory.prepare(g)
          val vals = Array.fill(w0 * h0)(nodata)
          var hits = 0
          var row = r0
          while (row <= r1) {
            var c = c0
            while (c <= c1) {
              if (pixelHit(r, pg, c, row, allTouched)) {
                val v = rawValue(r, band, c, row)
                vals((row - rOff) * w0 + (c - cOff)) = v
                hits += 1
              }
              c += 1
            }
            row += 1
          }
          if (hits == 0) emptyResult()
          else RasterModel.toRow(r.crs, shiftGt(r.gt, cOff, rOff), w0, h0,
            Seq(Band(nodata, RasterModel.packDoubles(vals),
              ptype = srcBand.ptype)), r.path)
      }
    }),

    // ------------------------------------------------------------------
    // RS_Tile(raster, width, height[, padWithNoData[, noDataVal]])
    // (rs_tile.rs:55-66; the bandIndices shape is covered by composing
    // rs_tile over rs_clip/band selection). Returns list<struct<x,y,tile>>
    // in row-major (y, x) tile order.
    // RS_Tile(raster[, bandIndices], w, h[, padWithNoData[, noDataVal]])
    // (rs_tile.rs): row-major (y, x) tile grid; edge tiles keep their
    // partial size unless padding; a noDataVal without padding is an
    // error rather than silently ignored (documented divergence from
    // Sedona Spark); the bandIndices overload keeps only those 1-based
    // bands, in the given order.
    "rs_tile" -> ((children: Seq[Expression]) => {
      val kinds = children.length match {
        case 3 => Seq(Raw, Int_, Int_)
        case 4 if children(1).dataType.isInstanceOf[ArrayType] =>
          Seq(Raw, Raw, Int_, Int_)
        case 4 => Seq(Raw, Int_, Int_, Bool)
        case 5 => Seq(Raw, Int_, Int_, Bool, Dbl)
        case n => throw new IllegalArgumentException(
          s"rs_tile: expected 3/4/5 args, got $n")
      }
      GeomScalar("rs_tile", children,
        ArrayType(tileStructType, containsNull = false), kinds, a => {
      val r0full = rast(a)
      val bandSel = a(1) match {
        case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
          arr.toIntArray().toIndexedSeq
        case _ => 1 to r0full.bands.length
      }
      bandSel.foreach(b => require(b >= 1 && b <= r0full.bands.length,
        s"rs_tile: band $b out of range"))
      val argOff = if (a(1).isInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]) 1 else 0
      val r = r0full.copy(bands = bandSel.map(b => r0full.bands(b - 1)).toIndexedSeq)
      val tw = ii(a, 1 + argOff); val th = ii(a, 2 + argOff)
      val pad = a.length > 3 + argOff && bb(a, 3 + argOff)
      require(tw > 0 && th > 0, s"rs_tile: tile size ${tw}x$th must be positive")
      require(a.length <= 4 + argOff || pad,
        "rs_tile: noDataVal is only meaningful with pad_with_nodata = true")
      val ndOverride = if (a.length > 4 + argOff) Some(d(a, 4 + argOff)) else None
      val nTx = (r.width + tw - 1) / tw
      val nTy = (r.height + th - 1) / th
      val tiles = new Array[Any](nTx * nTy)
      var ty = 0
      while (ty < nTy) {
        var tx = 0
        while (tx < nTx) {
          val c0 = tx * tw; val r0 = ty * th
          val w0 = if (pad) tw else math.min(tw, r.width - c0)
          val h0 = if (pad) th else math.min(th, r.height - r0)
          val bands = r.bands.zipWithIndex.map { case (b, bi) =>
            val nd = ndOverride.getOrElse(b.nodata)
            val vals = new Array[Double](w0 * h0)
            var row = 0
            while (row < h0) {
              var c = 0
              while (c < w0) {
                val v = rawValue(r, bi + 1, c0 + c, r0 + row)
                vals(row * w0 + c) = if (v.isNaN && !nd.isNaN) nd else v
                c += 1
              }
              row += 1
            }
            Band(nd, RasterModel.packDoubles(vals), ptype = b.ptype)
          }
          tiles(ty * nTx + tx) = new GenericInternalRow(Array[Any](tx, ty,
            RasterModel.toRow(r.crs, shiftGt(r.gt, c0, r0), w0, h0, bands, r.path)))
          tx += 1
        }
        ty += 1
      }
      new GenericArrayData(tiles)
    })}),

    // ------------------------------------------------------------------
    // RS_Resample (rs_resample.rs:75-81, Sedona Spark overload ladder):
    //   (raster, refRaster, useScale, algorithm)
    //   (raster, widthOrScale, heightOrScale, useScale, algorithm)
    //   (raster, widthOrScale, heightOrScale, gridX, gridY, useScale, algorithm)
    // Same-CRS grid change; nearestneighbor or bilinear sampling.
    fnv("rs_resample", RasterModel.dataType,
        Seq(Seq(Raw, Raw, Bool, Str), Seq(Raw, Dbl, Dbl, Bool, Str),
          Seq(Raw, Dbl, Dbl, Dbl, Dbl, Bool, Str)))(a => {
      val src = rast(a)
      // scale mode keeps the pixel size exact and grows the extent to
      // whole pixels: dims = ceil(|extent| / |scale|), the grown border
      // filling with nodata (rs_resample.rs:601-602, Sedona Spark
      // semantics)
      def scaleDims(sx: Double, sy: Double): (Int, Int) = {
        require(sx != 0 && sy != 0 && java.lang.Double.isFinite(sx) &&
          java.lang.Double.isFinite(sy),
          "rs_resample: scaleX and scaleY must be finite and non-zero")
        (math.max(1, math.ceil(math.abs(src.width * src.gt(1)) / math.abs(sx)).toInt),
          math.max(1, math.ceil(math.abs(src.height * src.gt(5)) / math.abs(sy)).toInt))
      }
      val (gt, w, h, bilinear) =
        if (a.length == 4) {
          // grid and origin from the reference raster (rs_resample.rs:175-177)
          val ref = rast(a, 1)
          require(ref.crs == src.crs,
            s"rs_resample: reference CRS ${ref.crs} != source CRS ${src.crs}; " +
              "RS_Resample does not reproject")
          val useScale = bb(a, 2)
          val alg = parseAlgorithm(a(3).asInstanceOf[String])
          if (useScale) {
            // reference scale, dims sized to cover the source extent
            val (w2, h2) = scaleDims(ref.gt(1), ref.gt(5))
            (Array(src.gt(0), ref.gt(1), 0.0, src.gt(3), 0.0, ref.gt(5)), w2, h2, alg)
          } else (ref.gt.clone(), ref.width, ref.height, alg)
        } else {
          val useScale = bb(a, a.length - 2)
          val alg = parseAlgorithm(a(a.length - 1).asInstanceOf[String])
          val (nsx, nsy, w2, h2) =
            if (useScale) {
              val sx = d(a, 1); val sy = d(a, 2)
              val (w2, h2) = scaleDims(sx, sy)
              (sx, sy, w2, h2)
            } else {
              // explicit dimensions must be whole positive numbers rather
              // than silently truncating (rs_resample.rs:463-475)
              def dim(name: String, v: Double): Int = {
                require(v == math.rint(v),
                  s"rs_resample: $name must be a whole number when useScale is false (got $v)")
                require(v > 0, s"rs_resample: $name must be positive (got $v)")
                v.toInt
              }
              val w2 = dim("width", d(a, 1)); val h2 = dim("height", d(a, 2))
              (src.width * src.gt(1) / w2, src.height * src.gt(5) / h2, w2, h2)
            }
          var ulx = src.gt(0); var uly = src.gt(3)
          var ww = w2; var hh = h2
          if (a.length == 7) {
            // snap the grid so (gridX, gridY) lies on a pixel corner, then
            // re-cover the source extent from the snapped origin
            // (rs_resample.rs:621-632)
            val gx = d(a, 3); val gy = d(a, 4)
            ulx = gx + math.round((ulx - gx) / nsx) * nsx
            uly = gy + math.round((uly - gy) / nsy) * nsy
            if (useScale) {
              val maxX = src.gt(0) + src.width * src.gt(1)
              val minY = src.gt(3) + src.height * src.gt(5)
              ww = math.max(1, math.ceil(math.abs(maxX - ulx) / math.abs(nsx)).toInt)
              hh = math.max(1, math.ceil(math.abs(minY - uly) / math.abs(nsy)).toInt)
            }
          }
          (Array(ulx, nsx, 0.0, uly, 0.0, nsy), ww, hh, alg)
        }
      // Int64/UInt64 survive only the extent-preserving nearest dimension
      // path (pure value selection); scale mode, grid snap, the reference-
      // grid form, and any interpolating algorithm route through float
      // (rs_resample.rs:522-539)
      // out-db sources resolve their own pixels (rs_resample is excluded
      // from the rs_ensureloaded pre-wrap): a nearest-neighbor downsample
      // reads the coarsest COG overview that still satisfies the target
      // grid — the GDAL overview selection the reference gets from
      // rust/sedona-raster-gdal — while bilinear keeps full resolution
      // for reference-faithful interpolation
      val srcPix =
        if (!src.isOutDb) src
        else if (bilinear) graft.sources.RasterLoaders.load(src.path)
        else {
          val factor = math.min(math.abs(gt(1)) / math.abs(src.gt(1)),
            math.abs(gt(5)) / math.abs(src.gt(5)))
          graft.sources.RasterLoaders.loadAtFactor(src.path, factor)
        }
      val isRegrid = a.length == 4 || a.length == 7 || (a.length == 5 && bb(a, 3))
      if (isRegrid || bilinear) rejectInt64Warp("RS_Resample", srcPix)
      resampleTo(srcPix, gt, w, h, src.crs, bilinear, (x, y) => (x, y))
    }),

    // ------------------------------------------------------------------
    // RS_ReprojectMatch(raster, reference[, algorithm])
    // (rs_reproject_match.rs:66-73): warp onto the reference's CRS + grid
    // + envelope through the hand-coded EPSG transforms.
    fnv("rs_reprojectmatch", RasterModel.dataType,
        Seq(Seq(Raw, Raw), Seq(Raw, Raw, Str)))(a => {
      val src = rast(a)
      val ref = rast(a, 1)
      val bilinear = a.length > 2 && parseAlgorithm(a(2).asInstanceOf[String])
      // the warp always routes pixels through a floating working type
      rejectInt64Warp("RS_ReprojectMatch", src)
      val warp: (Double, Double) => (Double, Double) =
        if (src.crs == ref.crs) (x, y) => (x, y)
        else {
          val from = CrsTransform.parse(ref.crs)
          val to = CrsTransform.parse(src.crs)
          (x, y) => CrsTransform.transformPoint(x, y, from, to)
        }
      // warp semantics: uncovered reference cells prefill with the input
      // band's nodata (0 when none); source nodata passes through unmasked
      resampleTo(src, ref.gt.clone(), ref.width, ref.height, ref.crs, bilinear, warp,
        fillNoNodata = 0.0, maskBilinearNodata = false)
    }),

    // ------------------------------------------------------------------
    // RS_AsRaster(geom, raster, pixelType[, allTouched[, value[, noData
    // [, useGeometryExtent]]]]) (rs_as_raster.rs:53-66,418-486): burn
    // `value` (default 1.0) into the geometry's pixel footprint on a grid
    // aligned with the reference raster. useGeometryExtent (default true)
    // picks between the geometry envelope snapped out to whole reference
    // pixels and the full reference grid. The output grid is initialized
    // with noData (0 when absent); the band carries noData only when one
    // was given, in the declared pixelType.
    fnv("rs_asraster", RasterModel.dataType,
        Seq(Seq(Geom, Raw, Str), Seq(Geom, Raw, Str, Bool),
          Seq(Geom, Raw, Str, Bool, Dbl), Seq(Geom, Raw, Str, Bool, Dbl, DblN),
          Seq(Geom, Raw, Str, Bool, Dbl, DblN, Bool)))(a => {
      val g = a(0).asInstanceOf[Geometry]
      val ref = rast(a, 1)
      val ptype = parsePixelTypeToken(a(2).asInstanceOf[String])
      val allTouched = a.length > 3 && bb(a, 3)
      val burn = if (a.length > 4) d(a, 4) else 1.0
      val nodataOpt: Option[Double] =
        if (a.length > 5 && a(5) != null) Some(d(a, 5)) else None
      val useGeomExtent = a.length <= 6 || bb(a, 6)
      require(ref.gt(2) == 0.0 && ref.gt(4) == 0.0,
        "RS_AsRaster currently requires skew_x=0 and skew_y=0 in the reference raster")
      val sx = ref.gt(1); val sy = ref.gt(5)
      require(sx != 0.0 && sy != 0.0, "Reference raster has zero scale")
      // window arithmetic verbatim from the reference (rs_as_raster.rs:
      // 440-478): rows measured from MaxY with the raster's own scale_y
      // sign, so a south-up reference grid yields an empty extent error
      // rather than a flipped window.
      val (w, h, gt) =
        if (useGeomExtent) {
          val env = g.getEnvelopeInternal
          val c0 = math.floor((env.getMinX - ref.gt(0)) / sx).toLong
          val c1 = math.ceil((env.getMaxX - ref.gt(0)) / sx).toLong
          val r0 = math.floor((env.getMaxY - ref.gt(3)) / sy).toLong
          val r1 = math.ceil((env.getMinY - ref.gt(3)) / sy).toLong
          val w = math.max(0L, c1 - c0); val h = math.max(0L, r1 - r0)
          require(w > 0 && h > 0, "Geometry extent produced an empty raster")
          (w.toInt, h.toInt, shiftGt(ref.gt, c0.toDouble, r0.toDouble))
        } else (ref.width, ref.height, ref.gt.clone())
      // fill is validated like the reference's "initial fill value"; the
      // burn value goes through GDAL's write path (round + clamp)
      val fill = castToDtype("initial fill value", nodataOpt.getOrElse(0.0), ptype)
      nodataOpt.foreach(nd => castToDtype("nodata value", nd, ptype))
      val burnStored = storeToDtype(burn, ptype)
      val out = Raster(ref.crs, gt, w, h, IndexedSeq.empty)
      val pg = PreparedGeometryFactory.prepare(g)
      val vals = Array.fill(w * h)(fill)
      var row = 0
      while (row < h) {
        var c = 0
        while (c < w) {
          if (pixelHit(out, pg, c, row, allTouched)) vals(row * w + c) = burnStored
          c += 1
        }
        row += 1
      }
      RasterModel.toRow(ref.crs, gt, w, h, Seq(Band(
        nodataOpt.getOrElse(Double.NaN), RasterModel.packDoubles(vals),
        ptype = ptype)))
    }),

    // ------------------------------------------------------------------
    // RS_Polygonize(raster, band) -> list<struct<geom, value>>
    // (rs_polygonize.rs:48-65): 4-connected regions of equal pixel value,
    // nodata skipped; one polygon per region (union of its pixel cells),
    // regions emitted in scan order of their first pixel.
    fnv("rs_polygonize", ArrayType(StructType(Seq(
        StructField("geom", BinaryType), StructField("value", DoubleType))),
        containsNull = false), Seq(Seq(Raw, Int_)))(a => {
      val r = rast(a)
      val band = ii(a, 1)
      require(band >= 1 && band <= r.bands.length, s"rs_polygonize: band $band out of range")
      val nodata = r.bands(band - 1).nodata
      val w = r.width; val h = r.height
      val seen = new Array[Boolean](w * h)
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      val queue = new java.util.ArrayDeque[Int]()
      var start = 0
      while (start < w * h) {
        if (!seen(start)) {
          val v0 = rawValue(r, band, start % w, start / w)
          seen(start) = true
          if (!isNd(v0, nodata)) {
            // BFS the region, collecting cell rectangles
            val cells = scala.collection.mutable.ArrayBuffer[Geometry]()
            queue.clear(); queue.add(start)
            while (!queue.isEmpty) {
              val p = queue.poll()
              val c = p % w; val row = p / w
              val xs = Seq(r.worldX(c, row), r.worldX(c + 1, row),
                r.worldX(c, row + 1), r.worldX(c + 1, row + 1))
              val ys = Seq(r.worldY(c, row), r.worldY(c + 1, row),
                r.worldY(c, row + 1), r.worldY(c + 1, row + 1))
              cells += GeomIO.envelope(xs.min, ys.min, xs.max, ys.max)
              Seq((c - 1, row), (c + 1, row), (c, row - 1), (c, row + 1)).foreach {
                case (nc, nr) =>
                  if (nc >= 0 && nc < w && nr >= 0 && nr < h && !seen(nr * w + nc) &&
                      rawValue(r, band, nc, nr) == v0) {
                    seen(nr * w + nc) = true
                    queue.add(nr * w + nc)
                  }
              }
            }
            val merged = org.locationtech.jts.operation.overlayng.OverlayNGRobust
              .union(scala.jdk.CollectionConverters.BufferHasAsJava(cells).asJava)
            out += new GenericInternalRow(Array[Any](GeomIO.write(merged), v0))
          }
        }
        start += 1
      }
      new GenericArrayData(out.toArray)
    }),

    // ------------------------------------------------------------------
    // RS_AsGeoTiff(raster[, compressionType, imageQuality]) -> binary
    // (rs_as_geotiff.rs:313-330): hand-implemented TIFF 6.0 + GeoTIFF 1.1
    // writer (sources.GeoTiff); NONE or DEFLATE (java.util.zip) output.
    fnv("rs_asgeotiff", BinaryType,
        Seq(Seq(Raw), Seq(Raw, Str, Dbl)))(a => {
      // the lossless codec set the reference suite pins
      // (test_rs_asgeotiff.py COMPRESSIONS) plus JPEG, the one lossy
      // member (rs_as_geotiff.rs imageQuality); the quality fraction is
      // honored for JPEG and ignored for the lossless codecs
      val quality = if (a.length > 2) {
        val q = d(a, 2)
        require(q >= 0.0 && q <= 1.0,
          s"rs_asgeotiff: quality $q out of range: must be between " +
            "0.0 and 1.0 (a fraction, not a 0-100 percentage)")
        q
      } else 0.75
      val code = if (a.length <= 1) 1 else {
        a(1).asInstanceOf[String].trim.toLowerCase(java.util.Locale.ROOT) match {
          case "" | "none" => 1
          case "deflate" => 8
          case "lzw" => 5
          case "jpeg" => 7
          case "packbits" => 32773
          case other => throw new IllegalArgumentException(
            s"rs_asgeotiff: compression '$other' not supported offline " +
              "(NONE/DEFLATE/LZW/JPEG/PACKBITS)")
        }
      }
      graft.sources.GeoTiff.writeCompressed(rast(a), code, quality = quality)
    }),

    // RS_AsJPEG2000(raster[, levels]) -> binary: JP2 container with a
    // LOSSLESS (reversible 5/3) Part-1 codestream — the raster format
    // the reference reaches only through GDAL's openjpeg driver
    // (rust/sedona-raster-gdal/src/register.rs:23-34), implemented
    // offline in sources/Jpeg2000. Integer band types up to 16 bits;
    // georeferencing travels as a GeoJP2 uuid box (embedded degenerate
    // GeoTIFF). Roundtrips through RS_FromGDALRaster's JP2/SOC sniff.
    // The 4-arg form RS_AsJPEG2000(raster, levels, tileW, tileH) writes
    // a TILED codestream (independent tiles + TLM byte directory — the
    // Sentinel-2 layout); tile dims must be multiples of 2^levels. The
    // 5/6-arg forms add the progression order (0..4 = LRCP/RLCP/RPCL/
    // PCRL/CPRL) and a nonzero tileparts flag for ONE TILE-PART PER
    // RESOLUTION (TLM ST=2 per-part directory — what production
    // encoders emit so overview readers fetch only leading parts).
    fnv("rs_asjpeg2000", BinaryType,
      Seq(Seq(Raw), Seq(Raw, Int_), Seq(Raw, Int_, Int_, Int_),
        Seq(Raw, Int_, Int_, Int_, Int_),
        Seq(Raw, Int_, Int_, Int_, Int_, Int_)))(a => {
      val levels = if (a.length > 1) a(1).asInstanceOf[Int] else 5
      require(levels >= 0 && levels <= 32,
        s"rs_asjpeg2000: decomposition levels $levels out of range 0..32")
      val tiles = if (a.length > 3)
        Some((a(2).asInstanceOf[Int], a(3).asInstanceOf[Int])) else None
      val order = if (a.length > 4) a(4).asInstanceOf[Int] else 0
      val parts = a.length > 5 && a(5).asInstanceOf[Int] != 0
      graft.sources.Jp2Raster.write(rast(a), levels, tiles, order = order,
        partsPerResolution = parts)
    }),

    // RS_AsJPEG2000_Lossy(raster, levels, qstep[, tileW, tileH]) ->
    // binary: the LOSSY 9/7 + scalar-quantization path (Annex E/F) —
    // quicklooks and lossy archives; qstep (in sample units) is the rate
    // knob, signalled per subband so the stream self-describes its grid.
    fnv("rs_asjpeg2000_lossy", BinaryType,
      Seq(Seq(Raw, Int_, Dbl), Seq(Raw, Int_, Dbl, Int_, Int_)))(a => {
      val levels = a(1).asInstanceOf[Int]
      val qstep = a(2).asInstanceOf[Double]
      require(levels >= 0 && levels <= 32,
        s"rs_asjpeg2000_lossy: decomposition levels $levels out of range 0..32")
      require(qstep > 0,
        s"rs_asjpeg2000_lossy: quantization step must be positive: $qstep")
      val tiles = if (a.length > 4)
        Some((a(3).asInstanceOf[Int], a(4).asInstanceOf[Int])) else None
      graft.sources.Jp2Raster.write(rast(a), levels, tiles, qstep)
    }),

    // RS_AsJPEG2000_Profile(raster, levels, qstep, derived, cocSpec) ->
    // binary: the full signalling surface in one call. qstep = 0 keeps
    // the 5/3 lossless path; derived != 0 selects scalar-DERIVED
    // quantization (QCD style 1: one (ε0, μ0) word, ε_b derived per
    // resolution — the common openjpeg lossy signalling). cocSpec emits
    // per-component COC overrides: ';'-separated entries of
    // '<comp>:cb=<exp>' (code-block size), '<comp>:pp=<x>x<y>'
    // (precinct exponents), '<comp>:nl=<levels>' (decomposition levels,
    // <= the COD's), and '<comp>:tr=<0|1>' (wavelet transform: 0 = 9/7
    // lossy, 1 = 5/3 reversible — e.g. keep a mask band exact inside a
    // lossy stream); empty = none.
    fnv("rs_asjpeg2000_profile", BinaryType,
      Seq(Seq(Raw, Int_, Dbl, Int_, Str)))(a => {
      val levels = a(1).asInstanceOf[Int]
      val qstep = a(2).asInstanceOf[Double]
      val derived = a(3).asInstanceOf[Int] != 0
      val spec = a(4).asInstanceOf[String].trim
      require(levels >= 0 && levels <= 32,
        s"rs_asjpeg2000_profile: decomposition levels $levels out of range 0..32")
      require(qstep >= 0,
        s"rs_asjpeg2000_profile: negative quantization step: $qstep")
      var cb = Map.empty[Int, Int]
      var pp = Map.empty[Int, (Int, Int)]
      var nlM = Map.empty[Int, Int]
      var trM = Map.empty[Int, Int]
      var roiM = Map.empty[Int, (Int, Int, Int, Int)]
      var ssM = Map.empty[Int, (Int, Int)]
      var ph = 0
      var pocSegs = Seq.empty[(Int, Int, Int, Int, Int, Int)]
      if (spec.nonEmpty) spec.split(";").foreach { ent =>
        val cv = ent.split(":", 2)
        require(cv.length == 2, s"rs_asjpeg2000_profile: bad COC entry '$ent'")
        if (cv(0).trim == "*") cv(1).trim match {
          // global signalling: '*:ph=<1|2>' packs packet headers (PPM /
          // PPT), '*:poc=<rb>/<o1>/<o2>' emits a two-segment POC split
          // at resolution rb (order o1 below, o2 from rb up — the
          // "thumbnail progression first" layout)
          case s if s.startsWith("ph=") => ph = s.drop(3).toInt
          case s if s.startsWith("poc=") =>
            val parts = s.drop(4).split("/", 3)
            require(parts.length == 3, s"rs_asjpeg2000_profile: bad poc in '$ent'")
            val rb = parts(0).toInt
            pocSegs = Seq((0, 0, 65535, rb, 255, parts(1).toInt),
              (rb, 0, 65535, 255, 255, parts(2).toInt))
          case other => throw new IllegalArgumentException(
            s"rs_asjpeg2000_profile: unknown global override '$other'")
        } else {
          val comp = cv(0).trim.toInt
          cv(1).trim match {
            case s if s.startsWith("cb=") => cb += comp -> s.drop(3).toInt
            case s if s.startsWith("pp=") =>
              val xy = s.drop(3).split("x", 2)
              require(xy.length == 2, s"rs_asjpeg2000_profile: bad pp in '$ent'")
              pp += comp -> (xy(0).toInt, xy(1).toInt)
            case s if s.startsWith("nl=") => nlM += comp -> s.drop(3).toInt
            case s if s.startsWith("tr=") => trM += comp -> s.drop(3).toInt
            case s if s.startsWith("roi=") =>
              // '<comp>:roi=<x>,<y>,<w>,<h>' — RGN maxshift ROI rect
              val q = s.drop(4).split(",", 4)
              require(q.length == 4, s"rs_asjpeg2000_profile: bad roi in '$ent'")
              roiM += comp -> (q(0).toInt, q(1).toInt, q(2).toInt, q(3).toInt)
            case s if s.startsWith("ss=") =>
              // '<comp>:ss=<sx>x<sy>' — SIZ component subsampling: the
              // band is top-left decimated onto a ceil(w/sx) x ceil(h/sy)
              // plane (4:2:0 chroma = '1:ss=2x2;2:ss=2x2'); the reader
              // replication-upsamples back onto the canvas grid
              val xy = s.drop(3).split("x", 2)
              require(xy.length == 2, s"rs_asjpeg2000_profile: bad ss in '$ent'")
              val (sx, sy) = (xy(0).toInt, xy(1).toInt)
              // range-checked HERE: the band is decimated before the
              // codestream encoder's own check could fire
              require(sx >= 1 && sx <= 255 && sy >= 1 && sy <= 255,
                s"rs_asjpeg2000_profile: ss factors out of range 1..255 in '$ent'")
              ssM += comp -> (sx, sy)
            case other => throw new IllegalArgumentException(
              s"rs_asjpeg2000_profile: unknown COC override '$other'")
          }
        }
      }
      graft.sources.Jp2Raster.write(rast(a), levels, qstep = qstep,
        derivedQuant = derived, cocCbExp = cb, cocPrecinct = pp,
        cocLevels = nlM, cocTransform = trM, subsampling = ssM,
        poc = pocSegs, packedHeaders = ph, roi = roiM)
    }),

    // RS_AsNetCDF(raster) -> binary: classic CDF-2 serialization through
    // sources.NetCdf (writer symmetry with RS_AsGeoTiff; the reference's
    // GDAL side can write netCDF through the same driver it reads with).
    // Roundtrips through RS_FromGDALRaster's CDF byte sniff.
    fnv("rs_asnetcdf", BinaryType, Seq(Seq(Raw)))(a =>
      graft.sources.NetCdf.write(rast(a))),

    // RS_FromGDALRaster(binary) -> raster (rs_from_gdal_raster.rs:49,143):
    // magic-sniffed like GDAL driver selection — GeoTIFF (II/MM), netCDF
    // classic (CDF), and JPEG 2000 (JP2 box signature or raw SOC
    // codestream) are the formats with offline codecs here.
    fnv("rs_fromgdalraster", RasterModel.dataType, Seq(Seq(Bin)))(a => {
      val bytes = a(0).asInstanceOf[Array[Byte]]
      val r =
        if (bytes.length >= 3 && bytes(0) == 'C'.toByte &&
            bytes(1) == 'D'.toByte && bytes(2) == 'F'.toByte)
          graft.sources.NetCdf.read(bytes)
        else if (graft.sources.Jp2Raster.sniff(bytes))
          graft.sources.Jp2Raster.read(bytes)
        else graft.sources.GeoTiff.read(bytes)
      RasterModel.toRow(r.crs, r.gt, r.width, r.height, r.bands, r.path)
    }),

    // ------------------------------------------------------------------
    // RS_ZonalStats(raster, roi[, band], stat[, allTouched[, excludeNoData
    // [, lenient]]]) -> Float64 and RS_ZonalStatsAll with the same ladder
    // minus stat -> struct (rs_zonal_stats.rs:23-43). Band-less overloads
    // are only legal on single-band rasters; a non-intersecting roi is
    // NULL when lenient (default) and an error when not; an intersecting
    // roi that selects no pixel center is count 0 with NULL stats; a NaN
    // pixel poisons every statistic (numpy semantics); variance/stddev
    // are sample (n-1), 0.0 for a single pixel; mode ties take the
    // largest value.
    fnv("rs_zonalstats", DoubleType,
        Seq(Seq(Raw, Geom, Str), Seq(Raw, Geom, Int_, Str),
          Seq(Raw, Geom, Int_, Str, Bool), Seq(Raw, Geom, Int_, Str, Bool, Bool),
          Seq(Raw, Geom, Int_, Str, Bool, Bool, Bool)))(a => {
      val statName = (if (a.length == 3) a(2) else a(3)).asInstanceOf[String]
      val statIdx = ZonalStatIndex.getOrElse(statName.toLowerCase,
        throw new IllegalArgumentException(
          s"rs_zonalstats: unknown statistic '$statName'"))
      zonalCompute("rs_zonalstats", a, hasStat = true) match {
        case null => null
        case stats =>
          if (statIdx == 0) stats(0).asInstanceOf[Long].toDouble
          else stats(statIdx)
      }
    }),
    fnv("rs_zonalstatsall", StructType(Seq(
        StructField("count", LongType), StructField("sum", DoubleType),
        StructField("mean", DoubleType), StructField("median", DoubleType),
        StructField("mode", DoubleType), StructField("stddev", DoubleType),
        StructField("variance", DoubleType), StructField("min", DoubleType),
        StructField("max", DoubleType))),
        Seq(Seq(Raw, Geom), Seq(Raw, Geom, Int_), Seq(Raw, Geom, Int_, Bool),
          Seq(Raw, Geom, Int_, Bool, Bool), Seq(Raw, Geom, Int_, Bool, Bool, Bool)))(a =>
      zonalCompute("rs_zonalstatsall", a, hasStat = false) match {
        case null => null
        case stats => new GenericInternalRow(stats)
      })
  )

  /** Statistic name -> index in the stats array; `avg`/`average` and `sd`
    * are the reference's accepted aliases (rs_zonal_stats.rs:97-106). */
  private val ZonalStatIndex: Map[String, Int] = Map(
    "count" -> 0, "sum" -> 1, "mean" -> 2, "avg" -> 2, "average" -> 2,
    "median" -> 3, "mode" -> 4, "stddev" -> 5, "sd" -> 5, "variance" -> 6,
    "min" -> 7, "max" -> 8)

  /** Shared zonal pipeline: resolve the ladder args, gate on true-geometry
    * roi/raster intersection, select pixels, compute statistics. Returns
    * null for the lenient non-intersecting case, else the 9-slot stats
    * array (count, sum, mean, median, mode, stddev, variance, min, max). */
  private def zonalCompute(fname: String, a: Array[Any],
      hasStat: Boolean): Array[Any] = {
    val r0 = rast(a)
    val zone = a(1).asInstanceOf[Geometry]
    val statOff = if (hasStat) 1 else 0
    val band =
      if (a.length > 2 && a(2).isInstanceOf[Int]) ii(a, 2)
      else {
        val nb = RasterFunctions.bandCountOf(r0)
        require(nb == 1,
          s"$fname: raster has $nb bands; specify which band " +
            "(the band-less overload is only allowed for a single-band raster)")
        1
      }
    val flagBase = 3 + statOff
    val allTouched = a.length > flagBase && bb(a, flagBase)
    val excludeNoData = a.length <= flagBase + 1 || bb(a, flagBase + 1)
    val lenient = a.length <= flagBase + 2 || bb(a, flagBase + 2)
    // in-db: validate the band up front (error ordering unchanged);
    // out-db learns its band count only after the windowed fetch below
    if (!r0.isOutDb) require(band >= 1 && band <= r0.bands.length,
      s"$fname: band $band out of range")
    // true-geometry intersection with the raster footprint quad — a roi
    // whose bbox overlaps but whose geometry is disjoint is still a
    // no-intersection case (rs_zonal_stats.rs roi gate). Computed on the
    // FULL raster extent — pure header math, no pixels fetched.
    val quad = {
      val cs = Array((0, 0), (r0.width, 0), (r0.width, r0.height), (0, r0.height),
        (0, 0)).map { case (c, row) =>
        new org.locationtech.jts.geom.Coordinate(r0.worldX(c, row), r0.worldY(c, row))
      }
      GeomIO.factory.createPolygon(cs)
    }
    if (!zone.intersects(quad)) {
      if (lenient) return null
      throw new IllegalArgumentException(
        s"$fname: the roi geometry does not intersect the raster; " +
          "pass lenient to get NULL instead")
    }
    // out-db: fetch only the blocks under the roi's pixel bbox (padded a
    // pixel for allTouched edge cells); in-db rasters pass through
    val r = if (!r0.isOutDb) r0 else {
      windowOf(r0, zone.getEnvelopeInternal, if (allTouched) 1 else 0) match {
        case None =>
          // roi intersects the footprint but selects no pixel range
          return zonalStatistics(Array.empty[Double])
        case Some((c0, c1, rr0, rr1)) =>
          RasterFunctions.outDbWindow(r0, c0, rr0, c1, rr1)._1
      }
    }
    require(band >= 1 && band <= r.bands.length,
      s"$fname: band $band out of range")
    zonalStatistics(zoneValues(r, zone, band, allTouched, excludeNoData))
  }

  /** compute_statistics (rs_zonal_stats.rs:864-922): count always real;
    * empty selection -> NULL stats; any NaN pixel -> all-NaN stats;
    * sample variance; mode of the sorted run-lengths with `>=` keeping
    * the later (larger) value on ties. */
  private def zonalStatistics(vs: Array[Double]): Array[Any] = {
    val n = vs.length
    if (n == 0)
      return Array[Any](0L, null, null, null, null, null, null, null, null)
    if (vs.exists(_.isNaN)) {
      val nan = Double.NaN
      return Array[Any](n.toLong, nan, nan, nan, nan, nan, nan, nan, nan)
    }
    val sum = vs.sum
    val mean = sum / n
    val variance =
      if (n <= 1) 0.0
      else vs.map(v => (v - mean) * (v - mean)).sum / (n - 1)
    val sorted = vs.sorted
    val median =
      if (n % 2 == 1) sorted(n / 2) else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    var bestVal = sorted(0); var bestLen = 1; var runLen = 1
    var i = 1
    while (i < n) {
      runLen = if (sorted(i) == sorted(i - 1)) runLen + 1 else 1
      if (runLen >= bestLen) { bestLen = runLen; bestVal = sorted(i) }
      i += 1
    }
    Array[Any](n.toLong, sum, mean, median, bestVal, math.sqrt(variance),
      variance, sorted(0), sorted(n - 1))
  }
}
