package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.geom.GeomIO
import RasterModel.Raster

/** RS_* raster functions over the in-db struct model — the GDAL-free
  * subset of the reference's raster surface
  * (rust/sedona-raster-functions/src/register.rs:41-89; geotransform math
  * from rust/sedona-raster/src/geo_transform.rs). File-IO kernels
  * (RS_FromPath, RS_AsGeoTiff, ...) need GDAL and stay v2.
  */
object RasterFunctions {
  import ArgKind._

  type B = Seq[Expression] => Expression

  private def fn(name: String, out: DataType, kinds: Seq[ArgKind.Value])(
      k: Array[Any] => Any): (String, B) =
    name -> ((children: Seq[Expression]) => GeomScalar(name, children, out, kinds, k))

  /** Reference-style optional trailing args: one SQL name, one kernel,
    * several accepted signatures keyed by arity (the kernel branches on
    * `args.length` — mirrors the multi-kernel SedonaScalarUDF dispatch,
    * rust/sedona-expr/src/scalar_udf.rs:69-158). */
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

  /** Pixel-reading kernels: RasterLoadRule wraps their raster arg in
    * rs_ensureloaded (reference `needs_pixels` annotation). */
  val needsPixels: Set[String] =
    Set("rs_value", "rs_values", "rs_bandmin", "rs_bandmax", "rs_bandavg",
      "rs_zonalstats", "rs_setbandnodatavalue",
      // RasterOps window/vectorize kernels all read pixels. rs_resample
      // is NOT pre-wrapped: it resolves its own pixels so an out-db COG
      // downsample can read an overview level instead of full resolution
      "rs_clip", "rs_tile", "rs_reprojectmatch",
      "rs_polygonize", "rs_zonalstatsall",
      // N-D reshaping copies band bytes
      "rs_slice", "rs_slicerange", "rs_dimtoband", "rs_bandtodim")

  /** The out-db SCALE path: these kernels are NOT wrapped in
    * rs_ensureloaded by RasterLoadRule — they resolve just the pixel
    * window their geometry touches through the per-executor block cache
    * (sources/RasterLoaders.window), so a point sample over a huge COG
    * fetches one tile, never the scene. Mirrors the reference's lazy
    * per-band out-db fetch (rust/sedona-schema/src/raster.rs outdb
    * bands + async RS_EnsureLoaded) with GDAL-style block caching. */
  val windowedAccess: Set[String] =
    Set("rs_value", "rs_values", "rs_zonalstats", "rs_zonalstatsall")

  /** Windowed raster covering full-raster pixel range [c0..c1]x[r0..r1]
    * of an out-db raster, plus the window's global pixel origin. */
  private[functions] def outDbWindow(r: Raster, c0: Int, r0: Int,
      c1: Int, r1: Int): (Raster, Int, Int) =
    graft.sources.RasterLoaders.windowWithOrigin(
      r.path, c0, r0, c1 - c0 + 1, r1 - r0 + 1)

  /** Band count for default-band resolution; an out-db raster answers
    * from one cached corner block (its header carries no band count). */
  private[functions] def bandCountOf(r: Raster): Int =
    if (r.isOutDb) graft.sources.RasterLoaders.window(r.path, 0, 0, 1, 1).bands.length
    else r.bands.length

  private def bandValues(r: Raster, band1: Int): Array[Double] = {
    val band = r.bands(band1 - 1)
    require(band.dims == null || band.dims.length == 2,
      s"band $band1 carries ${band.dims.length} dims (${band.dims.mkString(",")}); " +
        "2D band kernels require a y/x band — rs_dimtoband/rs_slice first")
    val data = band.data
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(r.width * r.height)(bb.getDouble)
  }

  @inline private def bandDims(r: Raster, b: Int): IndexedSeq[String] =
    r.bands(b - 1).dimsOf(r.height, r.width)
  @inline private def bandShape(r: Raster, b: Int): IndexedSeq[Long] =
    r.bands(b - 1).shapeOf(r.height, r.width)

  /** No-band arity of the dimension accessors: every band must agree on
    * the value (error otherwise); None when the raster has no bands. */
  private def agreeing[T](r: Raster, fname: String)(f: Int => T): Option[T] = {
    if (r.bands.isEmpty) return None
    val vs = (1 to r.bands.length).map(f)
    require(vs.distinct.length == 1, s"$fname: bands disagree: ${vs.distinct.mkString("; ")}")
    Some(vs.head)
  }

  /** Spatial dims cannot be sliced; a name no band carries is an error
    * (reference rs_slice.rs:329-364 pre-flight; verb differs per function:
    * "slice" for RS_Slice/RS_SliceRange, "expand" for RS_DimToBand,
    * rs_dim_band.rs:88). */
  private def validateSliceDim(r: Raster, name: String, fname: String,
      verb: String = "slice"): Unit = {
    require(name != "y" && name != "x", s"$fname: cannot $verb spatial dimension '$name'")
    require(r.bands.exists(b => b.dimsOf(r.height, r.width).contains(name)),
      s"$fname: no band has dimension '$name'")
  }

  /** C-order block slice (reference rs_slice.rs:365-377 extract_slice):
    * take `count` consecutive indices starting at `start` along dim
    * `di` of a band with the given full `shape`; f64 elements. */
  private def sliceBytes(data: Array[Byte], shape: IndexedSeq[Long], di: Int,
      start: Int, count: Int): Array[Byte] = {
    val inner = shape.drop(di + 1).product.toInt * 8
    val outer = shape.take(di).product.toInt
    val stride = shape(di).toInt * inner
    val out = new Array[Byte](outer * count * inner)
    var o = 0
    while (o < outer) {
      System.arraycopy(data, o * stride + start * inner, out, o * count * inner,
        count * inner)
      o += 1
    }
    out
  }

  /** 1-based band for the value functions: explicit bands must be >= 1;
    * the band-less arity is only unambiguous on a single-band raster
    * (reference sampling.rs default_band / next_band). */
  private def resolveSampleBand(fname: String, r: Raster, a: Array[Any],
      bandIdx: Int): Int =
    if (a.length > bandIdx) {
      val b = ii(a, bandIdx)
      require(b >= 1, s"$fname: Invalid band number $b: band numbers must be 1-based")
      b
    } else {
      val nb = bandCountOf(r)
      require(nb == 1,
        s"$fname: raster has $nb bands; specify which band to " +
          "sample (the 2-argument form is only allowed for a single-band raster)")
      1
    }

  /** SRID a raster's CRS string resolves to; 0 = no CRS (null/empty/
    * "EPSG:0" and unparseable strings all count as none). */
  private def rasterSrid(r: Raster): Int =
    if (r.crs == null || r.crs.isEmpty || r.crs == "EPSG:0") 0
    else (try GeomScalars.parseCrsSrid(r.crs) catch { case _: Exception => 0 })

  /** Sample one pixel at a world point: land the point in the raster's
    * CRS (error when exactly one side carries a CRS — sampling across a
    * known and an unknown CRS would silently mislocate the point,
    * sampling.rs point_crs_transform), guard non-finite coordinates,
    * floor the inverse affine (a point just west/north of the origin
    * maps to index -1, out of bounds — not edge pixel 0), and null out
    * out-of-bounds / nodata-valued pixels. */
  private def samplePoint(fname: String, r: Raster,
      p: org.locationtech.jts.geom.Point, band: Int): java.lang.Double = {
    var x = p.getX; var y = p.getY
    val gSrid = p.getSRID
    val rSrid = rasterSrid(r)
    if (gSrid != 0 && rSrid != 0) {
      if (gSrid != rSrid) {
        val t = CrsTransform.transformPoint(x, y,
          CrsTransform.parse(s"EPSG:$gSrid"), CrsTransform.parse(s"EPSG:$rSrid"))
        x = t._1; y = t._2
      }
    } else if (gSrid != 0) throw new IllegalArgumentException(
      s"$fname: geometry has a CRS but the raster does not")
    else if (rSrid != 0) throw new IllegalArgumentException(
      s"$fname: raster has a CRS but the geometry does not")
    if (!java.lang.Double.isFinite(x) || !java.lang.Double.isFinite(y)) return null
    val (fc, fr) = r.rasterCoord(x, y)
    val c = math.floor(fc).toInt
    val row = math.floor(fr).toInt
    if (r.isOutDb) {
      // out-of-bounds answers from the header alone — no fetch at all;
      // in-bounds fetches only the (cached) block holding the pixel
      if (c < 0 || row < 0 || c >= r.width || row >= r.height) null
      else {
        val (wr, ax, ay) = outDbWindow(r, c, row, c, row)
        wr.value(band, c - ax, row - ay)
      }
    } else r.value(band, c, row)
  }

  private def envelopeOf(r: Raster): org.locationtech.jts.geom.Geometry = {
    val xs = Seq(r.worldX(0, 0), r.worldX(r.width, 0), r.worldX(0, r.height),
      r.worldX(r.width, r.height))
    val ys = Seq(r.worldY(0, 0), r.worldY(r.width, 0), r.worldY(0, r.height),
      r.worldY(r.width, r.height))
    GeomIO.envelope(xs.min, ys.min, xs.max, ys.max)
  }

  val registry: Map[String, B] = Map(
    // constructor (test/bench path; reference: RS_MakeEmptyRaster/RS_AsRaster);
    // optional trailing band count splits `vals` into nb equal bands
    fnv("rs_makeraster", RasterModel.dataType,
      Seq(Seq(Int_, Int_, Dbl, Dbl, Dbl, Dbl, Raw),
        Seq(Int_, Int_, Dbl, Dbl, Dbl, Dbl, Raw, Int_)))(a => {
      val w = ii(a, 0); val h = ii(a, 1)
      val nb = if (a.length > 7) ii(a, 7) else 1
      val vals = a(6).asInstanceOf[ArrayData].toDoubleArray()
      require(vals.length == w * h * nb, s"need ${w * h * nb} values, got ${vals.length}")
      RasterModel.toRow("EPSG:0", Array(d(a, 2), d(a, 4), 0.0, d(a, 3), 0.0, d(a, 5)),
        w, h, (0 until nb).map(b => RasterModel.Band(Double.NaN,
          RasterModel.packDoubles(vals.slice(b * w * h, (b + 1) * w * h)))))
    }),

    // outdb reference constructor + explicit materialization (reference:
    // RS_FromPath + async RS_EnsureLoaded wrapped in by the planner,
    // rust/sedona-query-planner/src/ensure_loaded.rs:18-36). Backed by
    // the format-keyed loader registry (sources/RasterLoaders, mirroring
    // rust/sedona/src/context.rs:383-392): rs_frompath reads only the
    // file header (metadata accessors stay pixel-free); the
    // RasterLoadRule-injected rs_ensureloaded fetches and decodes bands.
    fn("rs_frompath", RasterModel.dataType, Seq(Str))(a => {
      val path = a(0).asInstanceOf[String]
      val r = graft.sources.RasterLoaders.readMeta(path)
      RasterModel.toRow(r.crs, r.gt, r.width, r.height, Seq.empty, path)
    }),
    fn("rs_ensureloaded", RasterModel.dataType, Seq(Raw))(a => {
      val r = rast(a)
      if (!r.isOutDb) a(0)
      else {
        val full = graft.sources.RasterLoaders.load(r.path)
        RasterModel.toRow(full.crs, full.gt, full.width, full.height,
          full.bands, r.path)
      }
    }),

    // metadata accessors
    fn("rs_width", IntegerType, Seq(Raw))(a => rast(a).width),
    fn("rs_height", IntegerType, Seq(Raw))(a => rast(a).height),
    fn("rs_numbands", IntegerType, Seq(Raw))(a => rast(a).bands.length),
    fn("rs_scalex", DoubleType, Seq(Raw))(a => rast(a).gt(1)),
    fn("rs_scaley", DoubleType, Seq(Raw))(a => rast(a).gt(5)),
    fn("rs_skewx", DoubleType, Seq(Raw))(a => rast(a).gt(2)),
    fn("rs_skewy", DoubleType, Seq(Raw))(a => rast(a).gt(4)),
    fn("rs_upperleftx", DoubleType, Seq(Raw))(a => rast(a).gt(0)),
    fn("rs_upperlefty", DoubleType, Seq(Raw))(a => rast(a).gt(3)),
    fn("rs_crs", StringType, Seq(Raw))(a => rast(a).crs),
    fn("rs_georeference", StringType, Seq(Raw))(a => {
      val g = rast(a).gt
      // world-file order: scalex, skewy, skewx, scaley, ulx, uly
      Seq(g(1), g(4), g(2), g(5), g(0), g(3)).mkString(" ")
    }),
    fn("rs_bandnodatavalue", DoubleType, Seq(Raw, Int_))(a => {
      val r = rast(a); val b = ii(a, 1)
      if (b < 1 || b > r.bands.length) null
      else { val nd = r.bands(b - 1).nodata; if (nd.isNaN) null else nd }
    }),

    // coordinate mapping. RS_PixelAs* take 1-based (col, row) pixel
    // coordinates (rs_pixel_functions.rs:43 — "the pixel coordinates are
    // 1-based", converted to 0-based before the affine) and extrapolate
    // for out-of-bounds pixels; the polygon is the affine parallelogram
    // with the UL, UR, LR, LL ring order pinned (test_rs_pixelas.py).
    fn("rs_pixelaspoint", BinaryType, Seq(Raw, Int_, Int_))(a => {
      val r = rast(a); val c = ii(a, 1) - 1; val row = ii(a, 2) - 1
      GeomIO.point(r.worldX(c, row), r.worldY(c, row))
    }),
    fn("rs_pixelascentroid", BinaryType, Seq(Raw, Int_, Int_))(a => {
      val r = rast(a); val c = ii(a, 1) - 0.5; val row = ii(a, 2) - 0.5
      GeomIO.point(r.worldX(c, row), r.worldY(c, row))
    }),
    fn("rs_pixelaspolygon", BinaryType, Seq(Raw, Int_, Int_))(a => {
      val r = rast(a); val c = ii(a, 1) - 1; val row = ii(a, 2) - 1
      val ring = Array((c, row), (c + 1, row), (c + 1, row + 1), (c, row + 1),
        (c, row)).map { case (pc, pr) =>
        new org.locationtech.jts.geom.Coordinate(
          r.worldX(pc, pr), r.worldY(pc, pr))
      }
      GeomIO.factory.createPolygon(ring)
    }),
    // world->raster maps through the inverse affine with truncation
    // toward zero (affine_transformation.rs:66 `as i64`), Int64 output,
    // erroring on a non-invertible geotransform
    fn("rs_worldtorastercoordx", LongType, Seq(Raw, Dbl, Dbl))(a =>
      rast(a).rasterCoord(d(a, 1), d(a, 2))._1.toLong),
    fn("rs_worldtorastercoordy", LongType, Seq(Raw, Dbl, Dbl))(a =>
      rast(a).rasterCoord(d(a, 1), d(a, 2))._2.toLong),
    fn("rs_rastertoworldcoordx", DoubleType, Seq(Raw, Int_, Int_))(a =>
      rast(a).worldX(ii(a, 1), ii(a, 2))),
    fn("rs_rastertoworldcoordy", DoubleType, Seq(Raw, Int_, Int_))(a =>
      rast(a).worldY(ii(a, 1), ii(a, 2))),

    // pixel access + band stats. The reference form samples at a POINT
    // (rs_value.rs: floor world->pixel, null for empty/non-finite/
    // out-of-bounds/nodata; band defaults to 1 only for a single-band
    // raster — sampling.rs default_band); the 4-arg (band, col, row)
    // int form is kept as a pixel-space extension.
    fnv("rs_value", DoubleType,
        Seq(Seq(Raw, Geom), Seq(Raw, Geom, Int_), Seq(Raw, Int_, Int_, Int_)))(a =>
      if (a.length == 4) {
        val r = rast(a)
        val c = ii(a, 2); val row = ii(a, 3)
        if (r.isOutDb) {
          if (c < 0 || row < 0 || c >= r.width || row >= r.height) null
          else {
            val (wr, ax, ay) = outDbWindow(r, c, row, c, row)
            wr.value(ii(a, 1), c - ax, row - ay)
          }
        } else r.value(ii(a, 1), c, row)
      } else {
        val r = rast(a)
        val band = resolveSampleBand("rs_value", r, a, 2)
        a(1).asInstanceOf[org.locationtech.jts.geom.Geometry] match {
          case p: org.locationtech.jts.geom.Point if !p.isEmpty =>
            samplePoint("rs_value", r, p, band)
          case g if g.isEmpty => null
          case g => throw new IllegalArgumentException(
            s"rs_value: expected a Point, got ${g.getGeometryType}")
        }
      }),
    fn("rs_bandmin", DoubleType, Seq(Raw, Int_))(a => bandValues(rast(a), ii(a, 1)).min),
    fn("rs_bandmax", DoubleType, Seq(Raw, Int_))(a => bandValues(rast(a), ii(a, 1)).max),
    fn("rs_bandavg", DoubleType, Seq(Raw, Int_))(a => {
      val vs = bandValues(rast(a), ii(a, 1)); vs.sum / vs.length
    }),

    // band metadata (rs_bandpath.rs, rs_band_accessors.rs; our bands are
    // all little-endian f64 -> pixel type is constant REAL_64BITS)
    fnv("rs_bandpath", StringType, Seq(Seq(Raw), Seq(Raw, Int_)))(a => {
      val r = rast(a)
      val b = if (a.length > 1) ii(a, 1) else 1
      if (b < 1 || (r.bands.nonEmpty && b > r.bands.length)) null else r.path
    }),
    fnv("rs_bandpixeltype", StringType, Seq(Seq(Raw), Seq(Raw, Int_)))(a => {
      val r = rast(a)
      val b = if (a.length > 1) ii(a, 1) else 1
      if (b < 1 || b > r.bands.length) null else r.bands(b - 1).pixelTypeName
    }),
    fn("rs_isempty", BooleanType, Seq(Raw))(a => {
      val r = rast(a); r.width <= 0 || r.height <= 0
    }),

    // N-D dimension surface (rs_dimensions.rs): per-band dims/shape,
    // C-order, spatial y/x last. No-band arity = all bands must agree
    // (band-0 value; error on disagreement — rs_dimensions.rs:33).
    fnv("rs_numdimensions", IntegerType, Seq(Seq(Raw), Seq(Raw, Int_)))(a => {
      val r = rast(a)
      if (a.length > 1) {
        if (ii(a, 1) < 1 || ii(a, 1) > r.bands.length) null
        else bandDims(r, ii(a, 1)).length
      } else agreeing(r, "rs_numdimensions")(b => bandDims(r, b).length)
        .map(Int.box).getOrElse(2)
    }),
    fnv("rs_dimnames", ArrayType(StringType, containsNull = false),
        Seq(Seq(Raw), Seq(Raw, Int_)))(a => {
      val r = rast(a)
      def arr(ds: Seq[String]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ds.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      if (a.length > 1) {
        if (ii(a, 1) < 1 || ii(a, 1) > r.bands.length) null
        else arr(bandDims(r, ii(a, 1)))
      } else arr(agreeing(r, "rs_dimnames")(b => bandDims(r, b))
        .getOrElse(Vector("y", "x")))
    }),
    fnv("rs_dimsize", LongType, Seq(Seq(Raw, Str), Seq(Raw, Str, Int_)))(a => {
      val r = rast(a)
      val name = a(1).asInstanceOf[String]
      val bs = if (a.length > 2) Seq(ii(a, 2)) else 1 to r.bands.length
      val sizes = bs.filter(b => b >= 1 && b <= r.bands.length).flatMap { b =>
        val i = bandDims(r, b).indexOf(name)
        if (i < 0) None else Some(bandShape(r, b)(i))
      }
      if (r.bands.isEmpty && (name == "y" || name == "x"))
        if (name == "y") r.height.toLong else r.width.toLong
      else if (sizes.isEmpty) null
      else {
        require(sizes.distinct.length == 1,
          s"rs_dimsize: bands disagree on dimension '$name': ${sizes.distinct.mkString(", ")}")
        sizes.head
      }
    }),
    fnv("rs_shape", ArrayType(LongType, containsNull = false),
        Seq(Seq(Raw), Seq(Raw, Int_)))(a => {
      val r = rast(a)
      def arr(s: Seq[Long]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(s.toArray)
      if (a.length > 1) {
        if (ii(a, 1) < 1 || ii(a, 1) > r.bands.length) null
        else arr(bandShape(r, ii(a, 1)))
      } else arr(agreeing(r, "rs_shape")(b => bandShape(r, b))
        .getOrElse(Vector(r.height.toLong, r.width.toLong)))
    }),

    // N-D manipulation (rs_slice.rs, rs_dim_band.rs): C-order slicing with
    // outer x stride x inner block copies; spatial dims cannot be sliced,
    // a dim name no band carries is an error (rs_slice.rs:329-354).
    fn("rs_slice", RasterModel.dataType, Seq(Raw, Str, Int_))(a => {
      val r = rast(a)
      val name = a(1).asInstanceOf[String]
      val idx = ii(a, 2)
      validateSliceDim(r, name, "rs_slice")
      val out = r.bands.map { b =>
        val dims = b.dimsOf(r.height, r.width); val shape = b.shapeOf(r.height, r.width)
        val di = dims.indexOf(name)
        if (di < 0) b
        else {
          require(idx >= 0, s"rs_slice: index must be non-negative, got $idx")
          require(idx < shape(di),
            s"rs_slice: index $idx out of range for dimension '$name' with size ${shape(di)}")
          val data = sliceBytes(b.data, shape, di, idx, 1)
          val nd = dims.patch(di, Nil, 1); val ns = shape.patch(di, Nil, 1)
          RasterModel.Band(b.nodata, data,
            if (nd == Vector("y", "x")) null else nd,
            if (nd == Vector("y", "x")) null else ns, b.ptype)
        }
      }
      RasterModel.toRow(r.crs, r.gt, r.width, r.height, out, r.path)
    }),
    fn("rs_slicerange", RasterModel.dataType, Seq(Raw, Str, Int_, Int_))(a => {
      val r = rast(a)
      val name = a(1).asInstanceOf[String]
      val start = ii(a, 2); val end = ii(a, 3)
      validateSliceDim(r, name, "rs_slicerange")
      val out = r.bands.map { b =>
        val dims = b.dimsOf(r.height, r.width); val shape = b.shapeOf(r.height, r.width)
        val di = dims.indexOf(name)
        if (di < 0) b
        else {
          require(start >= 0, s"rs_slicerange: start must be non-negative, got $start")
          require(end >= 0, s"rs_slicerange: end must be non-negative, got $end")
          require(end <= shape(di),
            s"rs_slicerange: end ($end) out of range for dimension '$name' with size ${shape(di)}")
          require(start < end,
            s"rs_slicerange: range [$start, $end) invalid for dimension '$name'")
          val data = sliceBytes(b.data, shape, di, start, end - start)
          b.copy(data = data, shape = shape.updated(di, (end - start).toLong))
        }
      }
      RasterModel.toRow(r.crs, r.gt, r.width, r.height, out, r.path)
    }),
    fn("rs_dimtoband", RasterModel.dataType, Seq(Raw, Str))(a => {
      val r = rast(a)
      val name = a(1).asInstanceOf[String]
      validateSliceDim(r, name, "rs_dimtoband", verb = "expand")
      val out = r.bands.flatMap { b =>
        val dims = b.dimsOf(r.height, r.width); val shape = b.shapeOf(r.height, r.width)
        val di = dims.indexOf(name)
        if (di < 0) Seq(b)
        else {
          val nd0 = dims.patch(di, Nil, 1); val ns0 = shape.patch(di, Nil, 1)
          val (nd, ns) =
            if (nd0 == Vector("y", "x")) (null, null) else (nd0, ns0)
          (0L until shape(di)).map(i => RasterModel.Band(b.nodata,
            sliceBytes(b.data, shape, di, i.toInt, 1), nd, ns, b.ptype))
        }
      }
      RasterModel.toRow(r.crs, r.gt, r.width, r.height, out, r.path)
    }),
    fn("rs_bandtodim", RasterModel.dataType, Seq(Raw, Str))(a => {
      val r = rast(a)
      val name = a(1).asInstanceOf[String]
      require(r.bands.nonEmpty, "rs_bandtodim: raster has no bands")
      val dims = r.bands.head.dimsOf(r.height, r.width)
      val shape = r.bands.head.shapeOf(r.height, r.width)
      val nodata = r.bands.head.nodata
      require(!dims.contains(name),
        s"rs_bandtodim: dimension '$name' already exists")
      r.bands.foreach { b =>
        require(b.dimsOf(r.height, r.width) == dims &&
          b.shapeOf(r.height, r.width) == shape,
          "rs_bandtodim: bands have mismatched dims/shape")
        require(b.nodata == nodata || (b.nodata.isNaN && nodata.isNaN),
          "rs_bandtodim: bands have mismatched nodata")
      }
      val data = new Array[Byte](r.bands.map(_.data.length).sum)
      var off = 0
      r.bands.foreach { b =>
        System.arraycopy(b.data, 0, data, off, b.data.length); off += b.data.length
      }
      RasterModel.toRow(r.crs, r.gt, r.width, r.height,
        Seq(RasterModel.Band(nodata, data, name +: dims, r.bands.length.toLong +: shape)),
        r.path)
    }),

    // flat metadata struct (rs_metadata.rs:46-62; tileWidth/Height = full
    // grid for our untiled in-db model)
    fn("rs_metadata", StructType(Seq(
        StructField("upperLeftX", DoubleType), StructField("upperLeftY", DoubleType),
        StructField("gridWidth", LongType), StructField("gridHeight", LongType),
        StructField("scaleX", DoubleType), StructField("scaleY", DoubleType),
        StructField("skewX", DoubleType), StructField("skewY", DoubleType),
        StructField("srid", IntegerType),
        StructField("numSampleDimensions", IntegerType),
        StructField("tileWidth", LongType), StructField("tileHeight", LongType))),
        Seq(Raw))(a => {
      val r = rast(a)
      val srid: Any =
        if (r.crs == null || r.crs.isEmpty) null else GeomScalars.parseCrsSrid(r.crs)
      new GenericInternalRow(Array[Any](r.gt(0), r.gt(3),
        r.width.toLong, r.height.toLong, r.gt(1), r.gt(5), r.gt(2), r.gt(4),
        srid, r.bands.length, r.width.toLong, r.height.toLong))
    }),

    // geotransform extras (rs_geotransform.rs; rotation formula from
    // rust/sedona-raster/src/geo_transform.rs:133 atan2(-skewX, scaleX))
    fn("rs_rotation", DoubleType, Seq(Raw))(a => {
      val g = rast(a).gt; math.atan2(-g(2), g(1))
    }),

    // CRS plumbing (rs_srid.rs, rs_setsrid.rs; EPSG-authority strings only)
    fn("rs_srid", IntegerType, Seq(Raw))(a => {
      val crs = rast(a).crs
      if (crs == null || crs.isEmpty) null else GeomScalars.parseCrsSrid(crs)
    }),
    fn("rs_setsrid", RasterModel.dataType, Seq(Raw, Int_))(a => {
      val r = rast(a)
      RasterModel.toRow(s"EPSG:${ii(a, 1)}", r.gt, r.width, r.height, r.bands, r.path)
    }),
    fn("rs_setcrs", RasterModel.dataType, Seq(Raw, Str))(a => {
      val r = rast(a)
      RasterModel.toRow(a(1).asInstanceOf[String], r.gt, r.width, r.height, r.bands, r.path)
    }),

    // setters (rs_set_band_nodata.rs, rs_set_georeference.rs)
    fnv("rs_setbandnodatavalue", RasterModel.dataType,
        Seq(Seq(Raw, Dbl), Seq(Raw, Int_, Dbl)))(a => {
      val r = rast(a)
      // the 2-arg form is ambiguous on a multiband raster — error rather
      // than silently setting band 1 (test_raster_functions.py
      // test_rs_setbandnodatavalue_two_arg_requires_single_band)
      if (a.length == 2) require(r.bands.length == 1,
        s"rs_setbandnodatavalue: raster has ${r.bands.length} bands; " +
          "specify which band to set (the 2-argument form is only allowed " +
          "for a single-band raster)")
      val (b, v) = if (a.length == 2) (1, d(a, 1)) else (ii(a, 1), d(a, 2))
      if (b < 1 || b > r.bands.length) null
      else RasterModel.toRow(r.crs, r.gt, r.width, r.height,
        r.bands.updated(b - 1, r.bands(b - 1).copy(nodata = v)), r.path)
    }),
    // declare the storage dtype of one band or all bands (the model's
    // pixels stay f64; the dtype governs how writers like RS_AsGeoTiff
    // serialize — e.g. UNSIGNED_8BITS is what the JPEG codec needs)
    fnv("rs_setbandpixeltype", RasterModel.dataType,
        Seq(Seq(Raw, Str), Seq(Raw, Int_, Str)))(a => {
      val r = rast(a)
      val (b, t) = if (a.length == 2) (0, a(1).asInstanceOf[String])
        else (ii(a, 1), a(2).asInstanceOf[String])
      val tt = t.trim.toUpperCase(java.util.Locale.ROOT)
      require(Set("UNSIGNED_8BITS", "SIGNED_8BITS", "UNSIGNED_16BITS",
        "SIGNED_16BITS", "UNSIGNED_32BITS", "SIGNED_32BITS",
        "UNSIGNED_64BITS", "SIGNED_64BITS", "REAL_32BITS",
        "REAL_64BITS")(tt), s"rs_setbandpixeltype: unknown pixel type '$t'")
      if (b != 0 && (b < 1 || b > r.bands.length)) null
      else {
        val bands = if (b == 0) r.bands.map(_.copy(ptype = tt))
          else r.bands.updated(b - 1, r.bands(b - 1).copy(ptype = tt))
        RasterModel.toRow(r.crs, r.gt, r.width, r.height, bands, r.path)
      }
    }),
    fnv("rs_setgeoreference", RasterModel.dataType,
        Seq(Seq(Raw, Str), Seq(Raw, Str, Str)))(a => {
      val r = rast(a)
      val fmt = if (a.length > 2) a(2).asInstanceOf[String].toUpperCase else "GDAL"
      val vs = a(1).asInstanceOf[String].trim.split("\\s+").map(_.toDouble)
      require(vs.length == 6,
        s"rs_setgeoreference: expected 6 world-file values, got ${vs.length}")
      // world-file order: scaleX skewY skewX scaleY upperLeftX upperLeftY
      var ulx = vs(4); var uly = vs(5)
      if (fmt == "ESRI") {
        // ESRI reports the upper-left pixel CENTER; shift through the full
        // affine back to the corner (reference rs_set_georeference.rs:188)
        ulx -= (vs(0) + vs(2)) * 0.5
        uly -= (vs(1) + vs(3)) * 0.5
      } else require(fmt == "GDAL", s"rs_setgeoreference: unknown format $fmt")
      RasterModel.toRow(r.crs, Array(ulx, vs(0), vs(2), uly, vs(1), vs(3)),
        r.width, r.height, r.bands, r.path)
    }),

    // point-sampling over a MultiPoint (rs_values.rs): per-sub-point value
    // in input order; null element when out of bounds / nodata / empty.
    // MULTIPOINT EMPTY -> empty list; band rules as rs_value.
    fnv("rs_values", ArrayType(DoubleType, containsNull = true),
        Seq(Seq(Raw, Geom), Seq(Raw, Geom, Int_)))(a => {
      val r = rast(a)
      val g = a(1).asInstanceOf[org.locationtech.jts.geom.Geometry]
      val band = resolveSampleBand("rs_values", r, a, 2)
      val out = new Array[Any](if (g.isEmpty) 0 else g.getNumGeometries)
      var i = 0
      while (i < out.length) {
        out(i) = g.getGeometryN(i) match {
          case p: org.locationtech.jts.geom.Point if !p.isEmpty =>
            samplePoint("rs_values", r, p, band)
          case _ => null
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }),

    // combined coordinate mapping -> POINT (rs_worldcoordinate.rs /
    // rs_rastercoordinate.rs geometry-returning kernels)
    fn("rs_rastertoworldcoord", BinaryType, Seq(Raw, Int_, Int_))(a => {
      val r = rast(a)
      GeomIO.point(r.worldX(ii(a, 1), ii(a, 2)), r.worldY(ii(a, 1), ii(a, 2)))
    }),
    fn("rs_worldtorastercoord", BinaryType, Seq(Raw, Dbl, Dbl))(a => {
      val (fc, fr) = rast(a).rasterCoord(d(a, 1), d(a, 2))
      GeomIO.point(fc.toLong.toDouble, fr.toLong.toDouble)
    }),

    // deterministic example raster (rs_example.rs: 64x32, ul (43.08,
    // 79.07), scale (2,2), skew (1,1), 3 bands valued by band id with the
    // top-left pixel set to the nodata sentinel 127)
    fn("rs_example", RasterModel.dataType, Seq())(_ => {
      val w = 64; val h = 32
      val bands = (1 to 3).map { b =>
        val vals = Array.fill(w * h)(b.toDouble); vals(0) = 127.0
        RasterModel.Band(127.0, RasterModel.packDoubles(vals), ptype = "UNSIGNED_8BITS")
      }
      RasterModel.toRow("EPSG:4326", Array(43.08, 2.0, 1.0, 79.07, 1.0, 2.0), w, h, bands)
    }),

    // raster-geometry relations (envelope-based, planar)
    fn("rs_envelope", BinaryType, Seq(Raw))(a => envelopeOf(rast(a))),
    // footprint with the raster's CRS carried per row (item-CRS struct —
    // the reference's raster footprint shape, datatypes.rs:126-151);
    // downstream geometry kernels unwrap it transparently
    fn("rs_footprint", graft.functions.ItemCrs.dataType, Seq(Raw))(a => {
      val r = rast(a)
      graft.functions.ItemCrs.row(
        graft.geom.GeomIO.write(envelopeOf(r)),
        if (r.crs == null) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(r.crs))
    }),
    // convex hull of the (possibly skewed) extent quadrilateral
    fn("rs_convexhull", BinaryType, Seq(Raw))(a => {
      val r = rast(a)
      val cs = Array(
        new org.locationtech.jts.geom.Coordinate(r.worldX(0, 0), r.worldY(0, 0)),
        new org.locationtech.jts.geom.Coordinate(r.worldX(r.width, 0), r.worldY(r.width, 0)),
        new org.locationtech.jts.geom.Coordinate(
          r.worldX(r.width, r.height), r.worldY(r.width, r.height)),
        new org.locationtech.jts.geom.Coordinate(r.worldX(0, r.height), r.worldY(0, r.height)))
      GeomIO.factory.createMultiPointFromCoords(cs).convexHull()
    }),
    fn("rs_intersects", BooleanType, Seq(Raw, Geom))(a =>
      envelopeOf(rast(a)).intersects(a(1).asInstanceOf[org.locationtech.jts.geom.Geometry])),
    fn("rs_contains", BooleanType, Seq(Raw, Geom))(a =>
      envelopeOf(rast(a)).contains(a(1).asInstanceOf[org.locationtech.jts.geom.Geometry])),
    fn("rs_within", BooleanType, Seq(Raw, Geom))(a =>
      a(1).asInstanceOf[org.locationtech.jts.geom.Geometry].contains(envelopeOf(rast(a))))
    // rs_zonalstats / rs_zonalstatsall live in RasterOps (full reference
    // overload ladder with all_touched/exclude_no_data/lenient)
  )
}
