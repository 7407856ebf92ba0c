package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.functions.RasterModel
import graft.functions.RasterModel.{Band, Raster}

/** NetCDF classic-format (CDF-1 32-bit / CDF-2 64-bit offsets / CDF-5
  * 64-bit data incl. its unsigned/64-bit integer types) raster
  * source, implemented directly from the published classic file format:
  * big-endian header with dim/attribute/variable lists, contiguous
  * row-major fixed variables, record variables interleaved per record.
  * The reference reads netCDF through its GDAL raster side
  * (rust/sedona-raster-gdal/src/register.rs registers the GDAL drivers,
  * netCDF among them); here the format is decoded natively so the same
  * out-db contract works offline.
  *
  * Raster mapping: every non-character variable with >= 2 dimensions is
  * a band; the trailing two dimensions are (y, x) and any leading
  * dimensions (including the record dimension) become the band's N-D
  * dims, so RS_Slice/RS_DimToBand work on a time-stacked cube exactly as
  * they do for Zarr. Georeferencing resolves, in order:
  *   1. global attributes `transform` (6 doubles, GDAL order) + `crs` —
  *      the engine-native contract shared with the Zarr source;
  *   2. CF convention 1-D coordinate variables named after the x/y
  *      dimensions: pixel size from the first two coordinate values,
  *      origin at the first value minus half a pixel (coordinates are
  *      cell centers).
  *
  * Scale path: the classic format is contiguous, not chunked, but
  * row-major layout means a pixel window is a set of per-row byte
  * ranges — `loadWindow` fetches exactly those (one coalesced range per
  * full-width window), so out-db sampling costs O(window), not O(file).
  */
object NetCdf {

  // classic nc_type codes (7-11 are the CDF-5 additions)
  private val NcByte = 1
  private val NcChar = 2
  private val NcShort = 3
  private val NcInt = 4
  private val NcFloat = 5
  private val NcDouble = 6
  private val NcUByte = 7
  private val NcUShort = 8
  private val NcUInt = 9
  private val NcInt64 = 10
  private val NcUInt64 = 11

  private def sizeOf(t: Int): Int = t match {
    case NcByte | NcChar | NcUByte => 1
    case NcShort | NcUShort => 2
    case NcInt | NcFloat | NcUInt => 4
    case NcDouble | NcInt64 | NcUInt64 => 8
    case other => throw new IllegalArgumentException(
      s"netcdf: nc_type $other is not a classic/CDF-5 type")
  }

  private def ptypeOf(t: Int): String = t match {
    case NcByte => "SIGNED_8BITS"
    case NcShort => "SIGNED_16BITS"
    case NcInt => "SIGNED_32BITS"
    case NcFloat => "REAL_32BITS"
    case NcUByte => "UNSIGNED_8BITS"
    case NcUShort => "UNSIGNED_16BITS"
    case NcUInt => "UNSIGNED_32BITS"
    case NcInt64 => "SIGNED_64BITS"
    case NcUInt64 => "UNSIGNED_64BITS"
    case NcDouble => null // natively f64
    case _ => null
  }

  final case class Dim(name: String, len: Int) // len == 0: the record dimension
  final case class Att(name: String, typ: Int, text: String, nums: Array[Double])
  final case class Var(name: String, dimids: IndexedSeq[Int], atts: Seq[Att],
      typ: Int, vsize: Long, begin: Long) {
    def att(n: String): Option[Att] = atts.find(_.name == n)
  }

  final case class Header(version: Int, numrecs: Int, dims: IndexedSeq[Dim],
      gatts: Seq[Att], vars: IndexedSeq[Var]) {
    def dimLen(i: Int): Int = if (dims(i).len == 0) numrecs else dims(i).len
    def isRecordVar(v: Var): Boolean =
      v.dimids.nonEmpty && dims(v.dimids.head).len == 0
    /** Per-record byte stride across all record variables. Each record
      * variable's stored vsize is its PADDED per-record slab; the classic
      * spec's special case — exactly one record variable of type byte,
      * char, or short — stores record slabs UNPADDED, so there the true
      * stride is the product of the non-record dimension lengths times
      * the element size, not the padded vsize. */
    lazy val recSize: Long = {
      val rv = vars.filter(isRecordVar)
      if (rv.isEmpty) 0L
      else if (rv.length == 1 &&
          (rv.head.typ == NcByte || rv.head.typ == NcChar || rv.head.typ == NcShort)) {
        val v = rv.head
        v.dimids.tail.map(dimLen(_).toLong).product * sizeOf(v.typ)
      } else rv.map(_.vsize).sum
    }
    def gatt(n: String): Option[Att] = gatts.find(_.name == n)
    /** Band variables: non-char with >= 2 dims (1-D coordinate variables
      * are excluded by the arity bound). */
    def dataVars: IndexedSeq[Var] =
      vars.filter(v => v.typ != NcChar && v.dimids.length >= 2)
    /** 1-D coordinate variable of dimension `di`, if present. */
    def coordVar(di: Int): Option[Var] =
      vars.find(v => v.dimids == IndexedSeq(di) && v.name == dims(di).name &&
        v.typ != NcChar)
  }

  // ------------------------------------------------------------------
  // header parsing (growable bounded fetch: headers are small; start at
  // 8 KiB and double on underflow, never past the file length)
  // ------------------------------------------------------------------

  private final class P(fetch: (Long, Int) => Array[Byte], fileLen: Long) {
    private var buf: Array[Byte] = fetch(0L, math.min(fileLen, 8192L).toInt)
    var pos: Int = 0
    /** Header format version; 5 widens every NON_NEG field to 64 bits. */
    var version: Int = 1
    private def ensure(n: Int): Unit = if (pos + n > buf.length) {
      val want = math.max(buf.length.toLong * 2, pos.toLong + n)
      require(want <= fileLen || pos + n <= fileLen,
        s"netcdf: truncated header (need ${pos + n} bytes of $fileLen)")
      buf = fetch(0L, math.min(want, fileLen).toInt)
      require(pos + n <= buf.length, "netcdf: truncated header")
    }
    def u8(): Int = { ensure(1); val v = buf(pos) & 0xff; pos += 1; v }
    def i32(): Int = { ensure(4)
      val v = ((buf(pos) & 0xff) << 24) | ((buf(pos + 1) & 0xff) << 16) |
        ((buf(pos + 2) & 0xff) << 8) | (buf(pos + 3) & 0xff)
      pos += 4; v }
    def i64(): Long = { val hi = i32().toLong; val lo = i32().toLong & 0xffffffffL
      (hi << 32) | lo }
    /** The spec's NON_NEG: INT classically, INT64 in CDF-5. */
    def nonNeg(): Long = if (version == 5) i64() else i32().toLong
    def bytes(n: Int): Array[Byte] = { ensure(n)
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out }
    def pad4(): Unit = { val r = pos & 3; if (r != 0) { ensure(4 - r); pos += 4 - r } }
    def name(): String = { val n = nonNeg().toInt
      require(n >= 0 && n < (1 << 20), s"netcdf: implausible name length $n")
      val b = bytes(n); pad4(); new String(b, "UTF-8") }
  }

  private def parseAtts(p: P): Seq[Att] = {
    val tag = p.i32(); val n = p.nonNeg().toInt
    require(tag == 0x0C || (tag == 0 && n == 0), s"netcdf: bad attribute-list tag $tag")
    (0 until n).map { _ =>
      val nm = p.name(); val typ = p.i32(); val cnt = p.nonNeg().toInt
      require(cnt >= 0 && cnt < (1 << 26), s"netcdf: implausible attribute count $cnt")
      val esz = sizeOf(typ)
      val raw = p.bytes(cnt * esz); p.pad4()
      if (typ == NcChar) Att(nm, typ, new String(raw, "UTF-8"), null)
      else Att(nm, typ, null, toDoubles(raw, typ, cnt))
    }
  }

  def parseHeader(fetch: (Long, Int) => Array[Byte], fileLen: Long): Header = {
    val p = new P(fetch, fileLen)
    val magic = p.bytes(3)
    require(magic.sameElements("CDF".getBytes("US-ASCII")), "netcdf: bad magic")
    val version = p.u8()
    require(version == 1 || version == 2 || version == 5,
      s"netcdf: classic format versions 1/2/5 only (got $version; " +
        "netCDF-4/HDF5 files are unsupported offline)")
    p.version = version
    val numrecs = {
      val v = p.nonNeg()
      require(v != -1L && v != 0xffffffffL, "netcdf: STREAMING numrecs unsupported")
      v.toInt
    }
    val dimTag = p.i32(); val nDims = p.nonNeg().toInt
    require(dimTag == 0x0A || (dimTag == 0 && nDims == 0), s"netcdf: bad dim-list tag $dimTag")
    val dims = (0 until nDims).map(_ => Dim(p.name(), p.nonNeg().toInt))
    val gatts = parseAtts(p)
    val varTag = p.i32(); val nVars = p.nonNeg().toInt
    require(varTag == 0x0B || (varTag == 0 && nVars == 0), s"netcdf: bad var-list tag $varTag")
    val vars = (0 until nVars).map { _ =>
      val nm = p.name()
      val nd = p.nonNeg().toInt
      require(nd >= 0 && nd <= 1024, s"netcdf: implausible ndims $nd")
      val dimids = (0 until nd).map(_ => p.nonNeg().toInt)
      val atts = parseAtts(p)
      val typ = p.i32()
      val vsize = if (version == 5) p.i64() else p.i32().toLong & 0xffffffffL
      val begin = if (version == 1) p.i32().toLong & 0xffffffffL else p.i64()
      Var(nm, dimids, atts, typ, vsize, begin)
    }
    Header(version, numrecs, dims, gatts, vars)
  }

  /** Big-endian raw values of classic type `typ` to doubles. */
  private def toDoubles(raw: Array[Byte], typ: Int, n: Int): Array[Double] = {
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    typ match {
      case NcByte => while (i < n) { out(i) = bb.get(i).toDouble; i += 1 }
      case NcShort => while (i < n) { out(i) = bb.getShort(i * 2).toDouble; i += 1 }
      case NcInt => while (i < n) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
      case NcFloat => while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
      case NcDouble => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
      case NcUByte => while (i < n) { out(i) = (bb.get(i) & 0xff).toDouble; i += 1 }
      case NcUShort => while (i < n) { out(i) = (bb.getShort(i * 2) & 0xffff).toDouble; i += 1 }
      case NcUInt => while (i < n) { out(i) = (bb.getInt(i * 4) & 0xffffffffL).toDouble; i += 1 }
      case NcInt64 => while (i < n) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
      case NcUInt64 => while (i < n) {
        val v = bb.getLong(i * 8)
        out(i) = if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552E19
        i += 1
      }
      case other => throw new IllegalArgumentException(s"netcdf: unreadable type $other")
    }
    out
  }

  // ------------------------------------------------------------------
  // georeferencing
  // ------------------------------------------------------------------

  /** (geotransform, crs) for a data variable: native transform/crs
    * attributes first, CF coordinate variables second, unit grid last.
    * Coordinate lookups fetch 16 bytes per axis — readMeta stays
    * header-bounded. */
  private def georef(h: Header, fetch: (Long, Int) => Array[Byte],
      v: Var): (Array[Double], String) = {
    val crs = h.gatt("crs").flatMap(a => Option(a.text)).orNull
    h.gatt("transform").filter(a => a.nums != null && a.nums.length >= 6) match {
      case Some(a) => (a.nums.take(6), crs)
      case None =>
        val yd = v.dimids(v.dimids.length - 2); val xd = v.dimids.last
        (h.coordVar(xd), h.coordVar(yd)) match {
          case (Some(xv), Some(yv))
              if h.dimLen(xd) >= 2 && h.dimLen(yd) >= 2 &&
                !h.isRecordVar(xv) && !h.isRecordVar(yv) =>
            def first2(cv: Var): (Double, Double) = {
              val esz = sizeOf(cv.typ)
              val d = toDoubles(fetch(cv.begin, 2 * esz), cv.typ, 2)
              (d(0), d(1))
            }
            val (x0, x1) = first2(xv); val (y0, y1) = first2(yv)
            val dx = x1 - x0; val dy = y1 - y0
            require(dx != 0 && dy != 0, "netcdf: degenerate coordinate spacing")
            (Array(x0 - dx / 2, dx, 0.0, y0 - dy / 2, 0.0, dy), crs)
          case _ => (Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), crs)
        }
    }
  }

  private def nodataOf(v: Var): Double =
    v.att("_FillValue").orElse(v.att("missing_value"))
      .filter(a => a.nums != null && a.nums.nonEmpty)
      .map(_.nums(0)).getOrElse(Double.NaN)

  // ------------------------------------------------------------------
  // reads
  // ------------------------------------------------------------------

  private def spatialDims(h: Header, v: Var): (Int, Int) =
    (h.dimLen(v.dimids(v.dimids.length - 2)), h.dimLen(v.dimids.last))

  /** Band.dims/shape for a variable: leading dims keep their file names,
    * the trailing two are normalized to the model's "y"/"x". Null for
    * plain 2D. */
  private def bandDims(h: Header, v: Var): (IndexedSeq[String], IndexedSeq[Long]) =
    if (v.dimids.length == 2) (null, null)
    else {
      val lead = v.dimids.dropRight(2)
      (lead.map(i => h.dims(i).name) ++ Vector("y", "x"),
        lead.map(i => h.dimLen(i).toLong) ++
          Vector(h.dimLen(v.dimids(v.dimids.length - 2)).toLong,
            h.dimLen(v.dimids.last).toLong))
    }

  /** All values of a variable, record-dim aware, as doubles in C order. */
  private def varDoubles(h: Header, fetch: (Long, Int) => Array[Byte],
      v: Var): Array[Double] = {
    val esz = sizeOf(v.typ)
    if (!h.isRecordVar(v)) {
      val n = v.dimids.map(h.dimLen(_).toLong).product
      require(n * esz <= Int.MaxValue, s"netcdf: variable ${v.name} too large for one decode")
      toDoubles(fetch(v.begin, (n * esz).toInt), v.typ, n.toInt)
    } else {
      val perRec = v.dimids.tail.map(h.dimLen(_).toLong).product
      require(perRec * esz <= Int.MaxValue, s"netcdf: record slab of ${v.name} too large")
      val out = new Array[Double]((h.numrecs * perRec).toInt)
      var r = 0
      while (r < h.numrecs) {
        val slab = toDoubles(fetch(v.begin + r * h.recSize, (perRec * esz).toInt),
          v.typ, perRec.toInt)
        System.arraycopy(slab, 0, out, (r * perRec).toInt, perRec.toInt)
        r += 1
      }
      out
    }
  }

  /** Full decode of in-memory file bytes. */
  def read(bytes: Array[Byte]): Raster = {
    val fetch: (Long, Int) => Array[Byte] =
      (off, n) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    readVia(fetch, bytes.length.toLong)
  }

  private def readVia(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster = {
    val h = parseHeader(fetch, fileLen)
    val dvs = h.dataVars
    require(dvs.nonEmpty, "netcdf: no >=2-D data variables (nothing to map to a raster)")
    val (ht, wd) = spatialDims(h, dvs.head)
    dvs.foreach { v =>
      require(spatialDims(h, v) == ((ht, wd)),
        s"netcdf: variable ${v.name} trailing dims ${spatialDims(h, v)} != ($ht, $wd)")
    }
    val (gt, crs) = georef(h, fetch, dvs.head)
    val bands = dvs.map { v =>
      val (dn, ds) = bandDims(h, v)
      Band(nodataOf(v), RasterModel.packDoubles(varDoubles(h, fetch, v)),
        dims = dn, shape = ds, ptype = ptypeOf(v.typ))
    }
    Raster(crs, gt, wd, ht, bands)
  }

  /** Header-bounded metadata (no pixel bytes). */
  def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster = {
    val h = parseHeader(fetch, fileLen)
    val dvs = h.dataVars
    require(dvs.nonEmpty, "netcdf: no >=2-D data variables")
    val (ht, wd) = spatialDims(h, dvs.head)
    val (gt, crs) = georef(h, fetch, dvs.head)
    Raster(crs, gt, wd, ht, Vector.empty)
  }

  /** Windowed decode: per band variable, fetch only the byte ranges of
    * the window's rows (one coalesced range per leading plane when the
    * window spans the full width). Leading N-D dims are preserved — the
    * window applies to the spatial trailing dims of every plane. */
  def readWindow(fetch: (Long, Int) => Array[Byte], fileLen: Long,
      xoff: Int, yoff: Int, ww: Int, wh: Int): Raster = {
    val h = parseHeader(fetch, fileLen)
    val dvs = h.dataVars
    require(dvs.nonEmpty, "netcdf: no >=2-D data variables")
    val (ht, wd) = spatialDims(h, dvs.head)
    require(xoff >= 0 && yoff >= 0 && ww > 0 && wh > 0 &&
      xoff + ww <= wd && yoff + wh <= ht,
      s"netcdf window [$xoff,$yoff ${ww}x$wh] outside ${wd}x$ht")
    val (gt, crs) = georef(h, fetch, dvs.head)
    val bands = dvs.map { v =>
      val esz = sizeOf(v.typ)
      val lead = v.dimids.dropRight(2)
      val isRec = h.isRecordVar(v)
      val leadLens = lead.map(h.dimLen)
      val nPlanes = leadLens.map(_.toLong).product
      // bytes of one plane past the record stride (record dim excluded)
      val innerLens = (if (isRec) lead.tail else lead).map(h.dimLen(_).toLong)
      val planeVals = wd.toLong * ht
      val out = new Array[Double](((nPlanes * wh) * ww).toInt)
      var plane = 0L
      while (plane < nPlanes) {
        // plane index -> (record index, inner flat index)
        val innerCount = innerLens.product
        val (recIdx, innerIdx) =
          if (isRec) (plane / innerCount, plane % innerCount) else (0L, plane)
        val base = v.begin +
          (if (isRec) recIdx * h.recSize + innerIdx * planeVals * esz
           else plane * planeVals * esz)
        if (xoff == 0 && ww == wd) {
          // one coalesced range per plane, split into ~4 MB stages so
          // the fetch of stage i+1 overlaps the double-conversion of
          // stage i (FetchPipeline: same bytes, one-ahead lookahead)
          val rowBytes = wd.toLong * esz
          val chunkRows = math.max(1,
            math.min(wh.toLong, FetchPipeline.ChunkBytes / rowBytes).toInt)
          val starts = (0 until wh by chunkRows).toIndexedSeq
          FetchPipeline.run(fetch, starts.map { r0 =>
            val rows = math.min(chunkRows, wh - r0)
            (base + (yoff + r0).toLong * wd * esz, rows * ww * esz)
          }) { (i, raw) =>
            val r0 = starts(i)
            val rows = math.min(chunkRows, wh - r0)
            val vals = toDoubles(raw, v.typ, rows * ww)
            System.arraycopy(vals, 0, out, ((plane * wh + r0) * ww).toInt, rows * ww)
          }
        } else {
          // per-row ranges: latency-bound, so the same one-ahead overlap
          // hides row i+1's fetch behind row i's convert
          FetchPipeline.run(fetch, (0 until wh).map(r =>
            (base + ((yoff + r).toLong * wd + xoff) * esz, ww * esz))) { (r, raw) =>
            val vals = toDoubles(raw, v.typ, ww)
            System.arraycopy(vals, 0, out, ((plane * wh + r) * ww).toInt, ww)
          }
        }
        plane += 1
      }
      val (dn, _) = bandDims(h, v)
      val ds = if (dn == null) null
        else lead.map(i => h.dimLen(i).toLong) ++ Vector(wh.toLong, ww.toLong)
      Band(nodataOf(v), RasterModel.packDoubles(out), dims = dn, shape = ds,
        ptype = ptypeOf(v.typ))
    }
    val gtW = Array(
      gt(0) + xoff * gt(1) + yoff * gt(2), gt(1), gt(2),
      gt(3) + xoff * gt(4) + yoff * gt(5), gt(4), gt(5))
    Raster(crs, gtW, ww, wh, bands)
  }

  // ------------------------------------------------------------------
  // writer (CDF-2: 64-bit begins; doubles; fixed variables only)
  // ------------------------------------------------------------------

  /** Serialize a raster as a classic file: one double variable per
    * band (band1..bandN), shared dimensions from the bands' N-D structure
    * (trailing "y"/"x"), global `transform` + `crs` attributes, per-band
    * `_FillValue`. All bands must share dims/shape. `version` 2 writes
    * CDF-2 (64-bit begins); 5 writes CDF-5 (64-bit data: every NON_NEG
    * header field widens to 64 bits — the format large model outputs
    * need once any dimension or variable passes 32-bit sizes). */
  def write(r: Raster, version: Int = 2): Array[Byte] = {
    require(version == 2 || version == 5, s"netcdf write: CDF-$version unsupported")
    require(r.bands.nonEmpty, "netcdf write: raster has no bands")
    val dimNames = r.bands.head.dimsOf(r.height, r.width)
    val dimLens = r.bands.head.shapeOf(r.height, r.width).map(_.toInt)
    r.bands.foreach { b =>
      require(b.dimsOf(r.height, r.width) == dimNames &&
        b.shapeOf(r.height, r.width).map(_.toInt) == dimLens,
        "netcdf write: all bands must share dims/shape")
    }
    require(dimLens.forall(_ > 0), "netcdf write: zero-length dimension")
    val nVals = dimLens.map(_.toLong).product
    require(nVals * 8 <= Int.MaxValue / 2, "netcdf write: raster too large for one file")

    // NON_NEG fields are 4 bytes classically, 8 in CDF-5
    val nn = if (version == 5) 8 else 4
    def nameSize(s: String): Int = {
      val n = s.getBytes("UTF-8").length; nn + ((n + 3) & ~3)
    }
    def attSize(a: (String, Either[String, Array[Double]])): Int = a._2 match {
      case Left(text) =>
        val n = text.getBytes("UTF-8").length
        nameSize(a._1) + 4 + nn + ((n + 3) & ~3)
      case Right(nums) => nameSize(a._1) + 4 + nn + nums.length * 8
    }
    val gatts: Seq[(String, Either[String, Array[Double]])] =
      Seq("transform" -> Right(r.gt.take(6))) ++
        (if (r.crs != null && r.crs.nonEmpty) Seq("crs" -> Left(r.crs)) else Nil)
    val vatts: IndexedSeq[Seq[(String, Either[String, Array[Double]])]] =
      r.bands.map { b =>
        if (b.nodata.isNaN) Nil
        else Seq("_FillValue" -> Right(Array(b.nodata)))
      }.toIndexedSeq
    val varNames = r.bands.indices.map(i => s"band${i + 1}")

    val headerSize = (4 + nn) +
      (4 + nn + dimNames.map(n => nameSize(n) + nn).sum) +
      (4 + nn + gatts.map(attSize).sum) +
      (4 + nn + varNames.zip(vatts).map { case (nm, va) =>
        nameSize(nm) + nn + nn * dimNames.length +
          (4 + nn + va.map(attSize).sum) + 4 + nn + 8
      }.sum)
    val vsize = nVals * 8
    val total = headerSize + vsize * r.bands.length
    require(total <= Int.MaxValue, "netcdf write: file exceeds 2 GiB")
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.BIG_ENDIAN)

    def putNonNeg(v: Long): Unit =
      if (version == 5) out.putLong(v) else out.putInt(v.toInt)
    def putName(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      putNonNeg(b.length.toLong); out.put(b)
      var p = b.length
      while ((p & 3) != 0) { out.put(0.toByte); p += 1 }
    }
    def putAtts(as: Seq[(String, Either[String, Array[Double]])]): Unit = {
      out.putInt(if (as.isEmpty) 0 else 0x0C); putNonNeg(as.length.toLong)
      as.foreach { case (nm, v) =>
        putName(nm)
        v match {
          case Left(text) =>
            val b = text.getBytes("UTF-8")
            out.putInt(NcChar); putNonNeg(b.length.toLong); out.put(b)
            var p = b.length
            while ((p & 3) != 0) { out.put(0.toByte); p += 1 }
          case Right(nums) =>
            out.putInt(NcDouble); putNonNeg(nums.length.toLong)
            nums.foreach(out.putDouble)
        }
      }
    }

    out.put("CDF".getBytes("US-ASCII")).put(version.toByte)
    putNonNeg(0L) // numrecs: all variables fixed-size
    out.putInt(0x0A); putNonNeg(dimNames.length.toLong)
    dimNames.zip(dimLens).foreach { case (nm, len) =>
      putName(nm); putNonNeg(len.toLong)
    }
    putAtts(gatts)
    out.putInt(0x0B); putNonNeg(varNames.length.toLong)
    varNames.zipWithIndex.foreach { case (nm, i) =>
      putName(nm)
      putNonNeg(dimNames.length.toLong)
      dimNames.indices.foreach(d => putNonNeg(d.toLong))
      putAtts(vatts(i))
      out.putInt(NcDouble)
      putNonNeg(vsize)
      out.putLong(headerSize + vsize * i)
    }
    require(out.position() == headerSize,
      s"netcdf write: header layout drift (${out.position()} != $headerSize)")
    r.bands.foreach { b =>
      val in = ByteBuffer.wrap(b.data).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0L
      while (i < nVals) { out.putDouble(in.getDouble((i * 8).toInt)); i += 1 }
    }
    out.array()
  }

  /** Out-db loader registered for `.nc`/`.cdf` (RasterLoaders registry). */
  object OutDb extends RasterLoaders.Loader {
    override def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster =
      NetCdf.readMeta(fetch, fileLen)
    override def load(bytes: Array[Byte]): Raster = NetCdf.read(bytes)
    override def loadWindow(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        xoff: Int, yoff: Int, w: Int, h: Int): Raster =
      NetCdf.readWindow(fetch, fileLen, xoff, yoff, w, h)
    // classic-format variables are row-major contiguous: a full-width
    // row band is one byte range (readWindow's coalesced branch)
    override def rowContiguous: Boolean = true
  }
}
