package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.functions.RasterModel
import graft.functions.RasterModel.{Band, Raster}

/** Minimal GeoTIFF codec, hand-implemented from the public TIFF 6.0 and
  * GeoTIFF 1.1 (OGC 19-008r4) specs — no GDAL offline. The analog of the
  * reference's RS_AsGeoTiff / RS_FromGDALRaster pair
  * (rust/sedona-raster-gdal/src/rs_as_geotiff.rs, rs_from_gdal_raster.rs),
  * restricted to what the in-db model stores:
  *
  *  - write: little-endian, uncompressed, PlanarConfiguration=2 (one
  *    strip per band), f64 samples (SampleFormat=3/64-bit), georeferencing
  *    as ModelPixelScale+ModelTiepoint (axis-aligned) or
  *    ModelTransformation (skewed), EPSG code via GeoKeyDirectory,
  *    band-1 nodata via the GDAL_NODATA ASCII tag.
  *  - read: II/MM byte orders, chunky or planar, multi-strip, integer
  *    (8/16/32-bit signed/unsigned) and float (32/64) samples widened to
  *    the model's f64.
  */
object GeoTiff {

  // TIFF tags
  private val TNewSubfileType = 254
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPlanarConfig = 284
  private val TPredictor = 317
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TSampleFormat = 339
  private val TJpegTables = 347
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TModelTransformation = 34264
  private val TGeoKeyDirectory = 34735
  private val TGdalNoData = 42113

  // GeoKey ids (OGC 19-008r4 §6.2)
  private val GKModelType = 1024
  private val GKRasterType = 1025
  private val GKGeographicType = 2048
  private val GKProjectedCSType = 3072

  // ------------------------------------------------------------------
  // writer

  def write(r: Raster, deflate: Boolean = false): Array[Byte] =
    writeCompressed(r, if (deflate) 8 else 1)

  /** Tiled layout (TileWidth/TileLength/TileOffsets, per TIFF 6.0 §15):
    * the shape COGs use, and what makes windowed out-db reads fetch only
    * the tiles a query touches. Tile dims must be multiples of 16 (spec
    * requirement); edge tiles are zero-padded to full size. */
  def writeTiled(r: Raster, tileW: Int, tileH: Int,
      compressionCode: Int = 1, bigTiff: Boolean = false,
      quality: Double = 0.75): Array[Byte] = {
    require(tileW > 0 && tileH > 0 && tileW % 16 == 0 && tileH % 16 == 0,
      s"rs_asgeotiff: tile dims must be positive multiples of 16, got ${tileW}x$tileH")
    writeChunked(r, compressionCode, Some((tileW, tileH)), bigTiff, quality)
  }

  /** compressionCode: TIFF tag 259 value — 1 none, 5 LZW, 8 deflate,
    * 32773 PackBits (the lossless set RS_AsGeoTiff's reference suite
    * pins, test_rs_asgeotiff.py COMPRESSIONS). Bands whose declared
    * ptype agrees are written in that dtype so load→encode→decode is
    * byte-identical; mixed/unknown ptypes fall back to f64.
    * `bigTiff` emits the BigTIFF layout (magic 43, 8-byte offsets,
    * LONG8 chunk tables) — the format GDAL switches to near 4 GB, so a
    * pipeline tiling large mosaics stays interoperable. */
  def writeCompressed(r: Raster, compressionCode: Int,
      bigTiff: Boolean = false, quality: Double = 0.75): Array[Byte] =
    writeChunked(r, compressionCode, None, bigTiff, quality)

  private def header(big: Boolean, total: Long): ByteBuffer = {
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    if (big) out.put('I'.toByte).put('I'.toByte).putShort(43)
      .putShort(8).putShort(0).putLong(16L)
    else out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    out
  }

  private def headerLen(big: Boolean): Long = if (big) 16L else 8L

  private def writeChunked(r: Raster, compressionCode: Int,
      tile: Option[(Int, Int)], big: Boolean = false,
      quality: Double = 0.75): Array[Byte] = {
    val h = headerLen(big)
    val (seg, _) = writeSegment(r, compressionCode, tile, h, subfile = false,
      big, quality)
    val out = header(big, h + seg.length)
    out.put(seg)
    out.array()
  }

  /** Cloud-Optimized-GeoTIFF-style file: a tiled main image followed by
    * tiled reduced-resolution overview IFDs (NewSubfileType = 1), chained
    * through the next-IFD pointers — the layout whose coarse levels
    * RS_Resample reads instead of decoding full resolution (the GDAL
    * overview-selection behavior behind the reference's RS_Resample,
    * rust/sedona-raster-gdal/src/register.rs). `factors` are integer
    * decimations of the full image (e.g. 2, 4, 8), nearest-pixel. */
  def writeCog(r: Raster, tileW: Int, tileH: Int, factors: Seq[Int],
      compressionCode: Int = 1, bigTiff: Boolean = false): Array[Byte] = {
    require(tileW > 0 && tileH > 0 && tileW % 16 == 0 && tileH % 16 == 0,
      s"writeCog: tile dims must be positive multiples of 16, got ${tileW}x$tileH")
    require(factors.forall(_ >= 2), "writeCog: overview factors must be >= 2")
    val images = r +: factors.sorted.map(f => decimate(r, f))
    var off = headerLen(bigTiff)
    val segs = images.zipWithIndex.map { case (img, i) =>
      val (bytes, ptr) = writeSegment(img, compressionCode, Some((tileW, tileH)),
        off, subfile = i > 0, bigTiff)
      val segOff = off
      off += bytes.length
      (bytes, ptr, segOff)
    }
    val out = header(bigTiff, off)
    segs.zipWithIndex.foreach { case ((bytes, ptr, segOff), i) =>
      val next = if (i == segs.length - 1) 0L else segs(i + 1)._3
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bigTiff) bb.putLong(ptr, next) else bb.putInt(ptr, next.toInt)
      out.position(segOff.toInt)
      out.put(bytes)
    }
    out.array()
  }

  /** Nearest-pixel integer decimation for overview levels; the
    * geotransform keeps the origin and scales the pixel size. */
  private def decimate(r: Raster, f: Int): Raster = {
    val w = math.max(1, (r.width + f - 1) / f)
    val h = math.max(1, (r.height + f - 1) / f)
    val bands = r.bands.map { b =>
      val in = ByteBuffer.wrap(b.data).order(ByteOrder.LITTLE_ENDIAN)
      val vals = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(y * f, r.height - 1)
        var x = 0
        while (x < w) {
          val sx = math.min(x * f, r.width - 1)
          vals(y * w + x) = in.getDouble((sy.toLong * r.width + sx).toInt * 8)
          x += 1
        }
        y += 1
      }
      graft.functions.RasterModel.Band(b.nodata,
        graft.functions.RasterModel.packDoubles(vals), ptype = b.ptype)
    }
    Raster(r.crs, Array(r.gt(0), r.gt(1) * f, r.gt(2) * f,
      r.gt(3), r.gt(4) * f, r.gt(5) * f), w, h, bands)
  }

  /** One image's IFD + payloads + chunk data laid out at `baseOffset`
    * (absolute file offsets inside), WITHOUT the file header. Returns
    * (bytes, relative position of the next-IFD slot) — the caller
    * patches the chain. `big` emits the BigTIFF IFD layout: u64 entry
    * count, 20-byte entries with 8-byte value slots, LONG8 (type 16)
    * chunk offset/bytecount tables, u64 next-IFD pointer. */
  private def writeSegment(r: Raster, compressionCode: Int,
      tile: Option[(Int, Int)], baseOffset: Long,
      subfile: Boolean, big: Boolean = false,
      quality: Double = 0.75): (Array[Byte], Int) = {
    require(r.bands.nonEmpty, "rs_asgeotiff: raster has no bands")
    require(r.bands.forall(b => b.dims == null || b.dims.length == 2),
      "rs_asgeotiff: N-D bands not representable in TIFF (slice first)")
    val nb = r.bands.length
    // (SampleFormat, BitsPerSample) from the shared declared ptype
    val ptypes = r.bands.map(b => if (b.ptype == null) "REAL_64BITS" else b.ptype).distinct
    val (sampleFmt, sampleBits) =
      (if (ptypes.length == 1) ptypes.head else "REAL_64BITS") match {
        case "UNSIGNED_8BITS" => (1, 8)
        case "SIGNED_8BITS" => (2, 8)
        case "UNSIGNED_16BITS" => (1, 16)
        case "SIGNED_16BITS" => (2, 16)
        case "UNSIGNED_32BITS" => (1, 32)
        case "SIGNED_32BITS" => (2, 32)
        case "UNSIGNED_64BITS" => (1, 64)
        case "SIGNED_64BITS" => (2, 64)
        case "REAL_32BITS" => (3, 32)
        case _ => (3, 64)
      }
    // narrow the model's f64 pixels to the declared dtype (LE)
    def narrow(data: Array[Byte]): Array[Byte] =
      if (sampleFmt == 3 && sampleBits == 64) data
      else {
        val in = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
        val n = data.length / 8
        val out = ByteBuffer.allocate(n * (sampleBits / 8)).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          val v = in.getDouble(i * 8)
          (sampleFmt, sampleBits) match {
            case (3, 32) => out.putFloat(v.toFloat)
            case (_, 8) => out.put(math.round(v).toByte)
            case (_, 16) => out.putShort(math.round(v).toShort)
            case (_, 32) => out.putInt(math.round(v).toInt)
            case (1, 64) =>
              // unsigned 64-bit: values above Long.MaxValue wrap through
              // the two's-complement bit pattern
              out.putLong(if (v >= 9.223372036854776E18)
                (v - 1.8446744073709552E19).toLong else math.round(v))
            case (_, 64) => out.putLong(math.round(v))
          }
          i += 1
        }
        out.array()
      }
    val bytesPerSample = sampleBits / 8
    // JPEG (code 7) is an 8-bit-unsigned codec: each plane-major chunk
    // becomes a standalone grayscale JPEG stream (spec-legal with
    // PlanarConfig=2 + Photometric=1; GDAL reads the layout), so the
    // quality knob is honored and no JPEGTables tag is needed
    if (compressionCode == 7)
      require(sampleFmt == 1 && sampleBits == 8,
        "rs_asgeotiff: JPEG compression requires UNSIGNED_8BITS bands " +
          s"(got fmt=$sampleFmt bits=$sampleBits)")
    def compress(raw: Array[Byte], rowBytes: Int): Array[Byte] = compressionCode match {
      case 1 => raw
      case 5 => lzwEncode(raw)
      case 7 => jpegEncodeGray(raw, rowBytes, quality)
      case 8 => deflateBytes(raw)
      case 32773 => packBitsEncode(raw, rowBytes)
      case other => throw new IllegalArgumentException(
        s"rs_asgeotiff: compression code $other not supported")
    }
    // chunk payloads, plane-major: one whole-band strip per band, or
    // down*across zero-padded tiles per band (TIFF 6.0 §15 tile order)
    val stripData: IndexedSeq[Array[Byte]] = tile match {
      case None => r.bands.toIndexedSeq.map { b =>
        compress(narrow(b.data), r.width * bytesPerSample)
      }
      case Some((tw, th)) =>
        val across = (r.width + tw - 1) / tw
        val down = (r.height + th - 1) / th
        r.bands.toIndexedSeq.flatMap { b =>
          val raw = narrow(b.data)
          for (ty <- 0 until down; tx <- 0 until across) yield {
            val block = new Array[Byte]((tw * th * bytesPerSample))
            val validRows = math.min(th, r.height - ty * th)
            val validCols = math.min(tw, r.width - tx * tw)
            var row = 0
            while (row < validRows) {
              System.arraycopy(raw,
                (((ty * th + row).toLong * r.width + tx.toLong * tw) * bytesPerSample).toInt,
                block, row * tw * bytesPerSample, validCols * bytesPerSample)
              row += 1
            }
            compress(block, tw * bytesPerSample)
          }
        }
    }
    val skewed = r.gt(2) != 0.0 || r.gt(4) != 0.0
    val srid =
      if (r.crs == null || r.crs.isEmpty) 0
      else graft.functions.GeomScalars.parseCrsSrid(r.crs)
    val nodata1 = r.bands.head.nodata

    // EPSG's 4xxx block holds the geographic-2D CRS codes (4326 WGS84,
    // 4269 NAD83, 4258 ETRS89, ...); anything else we can emit is a
    // projected CRS. Gate the GeoKey class on that, not on == 4326 —
    // minus the handful of projected/geocentric/3D codes that also live
    // in the 4xxx block.
    val nonGeographic4xxx = Set(4087, 4088, 4936, 4937, 4978, 4979)
    val geographic = srid >= 4000 && srid <= 4999 && !nonGeographic4xxx(srid)

    // GeoKeyDirectory: version 1.1.0, then (id, location=0, count=1, value)
    val geoKeys = {
      val keys = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      keys += GKModelType -> (if (geographic) 2 else 1) // 2 geographic, 1 projected
      keys += GKRasterType -> 1 // PixelIsArea
      if (geographic) keys += GKGeographicType -> srid
      else if (srid != 0) keys += GKProjectedCSType -> srid
      val arr = new Array[Int](4 * (keys.length + 1))
      arr(0) = 1; arr(1) = 1; arr(2) = 0; arr(3) = keys.length
      keys.zipWithIndex.foreach { case ((id, v), i) =>
        arr(4 * (i + 1)) = id; arr(4 * (i + 1) + 3) = v
      }
      arr
    }
    val nodataAscii: Option[Array[Byte]] =
      if (nodata1.isNaN) None
      else Some((nodata1.toString + "\u0000").getBytes("US-ASCII"))

    // entries sorted by tag; each: (tag, type, count, inline-or-deferred)
    // type codes: 2 ASCII, 3 SHORT, 4 LONG, 12 DOUBLE
    case class E(tag: Int, typ: Int, count: Int, inline: Option[Long],
        payload: Array[Byte] = Array.emptyByteArray)
    def shorts(vs: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putShort(v.toShort)); b.array()
    }
    def longs(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putInt(v.toInt)); b.array()
    }
    def longs8(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putLong); b.array()
    }
    // chunk offset/bytecount tables: LONG8 in BigTIFF, LONG classically
    val chunkTyp = if (big) 16 else 4
    def chunkArr(vs: Seq[Long]): Array[Byte] = if (big) longs8(vs) else longs(vs)
    def doubles(vs: Seq[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble); b.array()
    }

    val stripLens = stripData.map(_.length.toLong)
    val nChunks = stripData.length
    // the tag carrying chunk offsets (patched with real positions at
    // layout time): StripOffsets for strips, TileOffsets for tiles
    val offsetsTag = if (tile.isDefined) TTileOffsets else TStripOffsets
    var entries = scala.collection.mutable.ArrayBuffer[E](
      E(TImageWidth, 4, 1, Some(r.width.toLong)),
      E(TImageLength, 4, 1, Some(r.height.toLong)),
      E(TBitsPerSample, 3, nb,
        if (nb <= 2) Some(packShortsInline(Seq.fill(nb)(sampleBits))) else None,
        shorts(Seq.fill(nb)(sampleBits))),
      E(TCompression, 3, 1, Some(compressionCode.toLong)),
      E(TPhotometric, 3, 1, Some(1L)),
      E(offsetsTag, chunkTyp, nChunks, None, chunkArr(Seq.fill(nChunks)(0L))),
      E(TSamplesPerPixel, 3, 1, Some(nb.toLong)),
      E(TPlanarConfig, 3, 1, Some(2L)),
      E(TSampleFormat, 3, nb,
        if (nb <= 2) Some(packShortsInline(Seq.fill(nb)(sampleFmt))) else None,
        shorts(Seq.fill(nb)(sampleFmt))))
    tile match {
      case None =>
        entries += E(TRowsPerStrip, 4, 1, Some(r.height.toLong))
        entries += E(TStripByteCounts, chunkTyp, nChunks,
          if (nChunks == 1) Some(stripLens.head) else None, chunkArr(stripLens))
      case Some((tw, th)) =>
        entries += E(TTileWidth, 3, 1, Some(tw.toLong))
        entries += E(TTileLength, 3, 1, Some(th.toLong))
        entries += E(TTileByteCounts, chunkTyp, nChunks,
          if (nChunks == 1) Some(stripLens.head) else None, chunkArr(stripLens))
    }
    if (skewed)
      entries += E(TModelTransformation, 12, 16, None, doubles(Seq(
        r.gt(1), r.gt(2), 0, r.gt(0), r.gt(4), r.gt(5), 0, r.gt(3),
        0, 0, 0, 0, 0, 0, 0, 1)))
    else {
      entries += E(TModelPixelScale, 12, 3, None,
        doubles(Seq(r.gt(1), -r.gt(5), 0.0)))
      entries += E(TModelTiepoint, 12, 6, None,
        doubles(Seq(0, 0, 0, r.gt(0), r.gt(3), 0)))
    }
    entries += E(TGeoKeyDirectory, 3, geoKeys.length, None, shorts(geoKeys.toSeq))
    nodataAscii.foreach(b => entries += E(TGdalNoData, 2, b.length,
      if (b.length <= 4) Some(packBytesInline(b)) else None, b))
    if (subfile) entries += E(TNewSubfileType, 4, 1, Some(1L)) // reduced-resolution
    entries = entries.sortBy(_.tag)

    // layout at baseOffset: IFD + out-of-line payloads + strips (all
    // stored offsets are absolute file positions)
    val entrySize = if (big) 20 else 12
    val inlineCap = if (big) 8 else 4
    val ifdSize = (if (big) 8 else 2) + entries.length * entrySize + inlineCap
    var dataOff = baseOffset + ifdSize
    val payloadOffsets = entries.map { e =>
      if (e.inline.isDefined || e.payload.length <= inlineCap) None
      else { val o = dataOff; dataOff += e.payload.length + (e.payload.length & 1); Some(o) }
    }
    val stripOffsets = stripLens.scanLeft(dataOff)(_ + _).take(nChunks)
    val total = dataOff + stripLens.sum
    val out = ByteBuffer.allocate((total - baseOffset).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    def putVal(v: Long): Unit = if (big) out.putLong(v) else out.putInt(v.toInt)
    if (big) out.putLong(entries.length.toLong)
    else out.putShort(entries.length.toShort)
    entries.zip(payloadOffsets).foreach { case (e, po) =>
      out.putShort(e.tag.toShort).putShort(e.typ.toShort)
      if (big) out.putLong(e.count.toLong) else out.putInt(e.count)
      e.tag match {
        case t if t == offsetsTag =>
          if (nChunks == 1) putVal(stripOffsets.head)
          else putVal(po.get) // the offsets array itself lives out-of-line
        case _ => (e.inline, po) match {
          case (Some(v), _) => putVal(v)
          case (None, Some(o)) => putVal(o)
          case (None, None) => // payload fits inline
            val pad = e.payload ++ Array.fill(inlineCap - e.payload.length)(0.toByte)
            out.put(pad, 0, inlineCap)
        }
      }
    }
    val ptrPos = (if (big) 8 else 2) + entries.length * entrySize
    putVal(0L) // next-IFD slot; writeCog patches the chain here
    entries.zip(payloadOffsets).foreach { case (e, po) =>
      po.foreach { o =>
        // the offsets tag's payload needs the real chunk positions
        val bytes =
          if (e.tag == offsetsTag) chunkArr(stripOffsets)
          else e.payload
        out.position((o - baseOffset).toInt)
        out.put(bytes)
        if ((bytes.length & 1) == 1) out.put(0.toByte)
      }
    }
    stripData.zipWithIndex.foreach { case (d, i) =>
      out.position((stripOffsets(i) - baseOffset).toInt)
      out.put(d)
    }
    (out.array(), ptrPos)
  }

  private def deflateBytes(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 4))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** TIFF predictor 2: per-row horizontal differencing per channel
    * (stride = samples per pixel in chunky layout, 1 in planar), undone by
    * prefix-summing samples as integers of the file's width/byte order. */
  private def undoHorizontalPredictor(chunk: Array[Byte], samplesPerRow: Int,
      stride: Int, bytesPer: Int, order: ByteOrder): Array[Byte] = {
    val rowBytes = samplesPerRow * bytesPer
    val bb = ByteBuffer.wrap(chunk).order(order)
    var rowStart = 0
    while (rowStart + rowBytes <= chunk.length) {
      var s = stride
      while (s < samplesPerRow) {
        val pos = rowStart + s * bytesPer
        val prev = rowStart + (s - stride) * bytesPer
        bytesPer match {
          case 1 => bb.put(pos, (bb.get(pos) + bb.get(prev)).toByte)
          case 2 => bb.putShort(pos, (bb.getShort(pos) + bb.getShort(prev)).toShort)
          case 4 => bb.putInt(pos, bb.getInt(pos) + bb.getInt(prev))
          case 8 => bb.putLong(pos, bb.getLong(pos) + bb.getLong(prev))
          case other => throw new IllegalArgumentException(
            s"geotiff: predictor 2 with $other-byte samples")
        }
        s += 1
      }
      rowStart += rowBytes
    }
    chunk
  }

  /** TIFF predictor 3 (floating point): each row stores byte-delta-coded,
    * byte-plane-shuffled samples (MSB plane first). Undo the delta, then
    * re-interleave planes into samples in the file's byte order. */
  private def undoFloatPredictor(chunk: Array[Byte], samplesPerRow: Int,
      bytesPer: Int, order: ByteOrder): Array[Byte] = {
    val rowBytes = samplesPerRow * bytesPer
    val out = new Array[Byte](chunk.length)
    var rowStart = 0
    while (rowStart + rowBytes <= chunk.length) {
      var i = rowStart + 1
      while (i < rowStart + rowBytes) {
        chunk(i) = (chunk(i) + chunk(i - 1)).toByte; i += 1
      }
      var j = 0
      while (j < samplesPerRow) {
        var k = 0
        while (k < bytesPer) {
          val dst =
            if (order == ByteOrder.LITTLE_ENDIAN) rowStart + j * bytesPer + (bytesPer - 1 - k)
            else rowStart + j * bytesPer + k
          out(dst) = chunk(rowStart + k * samplesPerRow + j)
          k += 1
        }
        j += 1
      }
      rowStart += rowBytes
    }
    out
  }

  /** TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, ClearCode 256,
    * EOI 257, 9→12-bit codes with the "early change" width bump at
    * 2^n - 1 table entries. */
  private def lzwDecode(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len * 4)
    val table = new Array[Array[Byte]](4096)
    var tableSize = 0
    def resetTable(): Unit = {
      var i = 0
      while (i < 256) { table(i) = Array(i.toByte); i += 1 }
      tableSize = 258 // 256 Clear, 257 EOI
    }
    var bitPos = off.toLong * 8
    val endBit = (off + len).toLong * 8
    var width = 9
    def readCode(): Int = {
      if (bitPos + width > endBit) return 257 // ran off the end: treat as EOI
      var v = 0
      var i = 0
      while (i < width) {
        val b = data((bitPos >> 3).toInt) & 0xff
        v = (v << 1) | ((b >> (7 - (bitPos & 7)).toInt) & 1)
        bitPos += 1; i += 1
      }
      v
    }
    resetTable()
    var prev: Array[Byte] = null
    var code = readCode()
    while (code != 257) {
      if (code == 256) {
        resetTable(); width = 9; prev = null
      } else {
        val entry: Array[Byte] =
          if (code < tableSize && table(code) != null) table(code)
          else if (prev != null) prev :+ prev(0) // KwKwK case
          else throw new IllegalArgumentException("geotiff: corrupt LZW stream")
        out.write(entry)
        if (prev != null && tableSize < 4096) {
          table(tableSize) = prev :+ entry(0)
          tableSize += 1
        }
        // early change: TIFF bumps the code width one entry early
        if (tableSize == (1 << width) - 1 && width < 12) width += 1
        prev = entry
      }
      code = readCode()
    }
    out.toByteArray
  }

  /** TIFF-variant LZW encoder (TIFF 6.0 §13) — the mirror of lzwDecode:
    * MSB-first bit packing, leading ClearCode, "early change" width bump
    * when the table reaches 2^n - 1 entries, table reset before 4094. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    var bitBuf = 0L; var bitCount = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCount += width
      while (bitCount >= 8) {
        out.write(((bitBuf >> (bitCount - 8)) & 0xff).toInt)
        bitCount -= 8
      }
    }
    // dictionary of byte strings; key = (prefixCode << 8) | nextByte
    var dict = new java.util.HashMap[Int, Integer](8192)
    var nextCode = 258
    def reset(): Unit = { dict = new java.util.HashMap[Int, Integer](8192); nextCode = 258 }
    emit(256)
    var i = 0
    var cur = -1
    while (i < data.length) {
      val b = data(i) & 0xff
      if (cur < 0) cur = b
      else {
        val key = (cur << 8) | b
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          dict.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          // early change: the decoder's table runs one entry behind the
          // encoder's, so bumping when nextCode fills the current width
          // (libtiff's free_ent > maxcode) lands on the same code number
          // as lzwDecode's tableSize == 2^w - 1 rule
          if (nextCode == (1 << width) && width < 12) width += 1
          if (nextCode >= 4094) { emit(256); reset(); width = 9 }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) emit(cur)
    emit(257)
    if (bitCount > 0) out.write(((bitBuf << (8 - bitCount)) & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // JPEG (compression 7, the TTN2 "new-style" scheme GDAL writes): each
  // strip/tile is a standalone or abbreviated JPEG stream; tag 347
  // JPEGTables, when present, carries the shared DQT/DHT segments as a
  // tables-only stream (SOI..tables..EOI). Decode splices the tables
  // ahead of the chunk's entropy data and hands the result to the JDK's
  // ImageIO codec — the same baseline-JPEG decode GDAL delegates to
  // libjpeg, so decoded pixels match the de-facto reference decoder.

  /** tables minus its trailing EOI ++ chunk minus its leading SOI. */
  private def jpegMerge(tables: Array[Byte], chunk: Array[Byte]): Array[Byte] =
    if (tables == null || tables.length < 4) chunk
    else {
      require(chunk.length >= 2 && (chunk(0) & 0xff) == 0xff &&
        (chunk(1) & 0xff) == 0xd8, "geotiff: JPEG chunk missing SOI")
      require((tables(0) & 0xff) == 0xff && (tables(1) & 0xff) == 0xd8,
        "geotiff: JPEGTables missing SOI")
      val tl =
        if ((tables(tables.length - 2) & 0xff) == 0xff &&
            (tables(tables.length - 1) & 0xff) == 0xd9) tables.length - 2
        else tables.length
      val out = new Array[Byte](tl + chunk.length - 2)
      System.arraycopy(tables, 0, out, 0, tl)
      System.arraycopy(chunk, 2, out, tl, chunk.length - 2)
      out
    }

  /** Decode one JPEG chunk to 8-bit samples in the chunk's row-major
    * layout (`rowSamples` samples per row, `chans` samples per pixel —
    * 1 for grayscale/planar planes, 3 for chunky RGB/YCbCr, which
    * ImageIO hands back already converted to RGB). */
  private def jpegDecodeChunk(data: Array[Byte], tables: Array[Byte],
      rowSamples: Int, chans: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpegMerge(tables, data)))
    require(img != null, "geotiff: undecodable JPEG chunk")
    val w0 = img.getWidth
    val h0 = img.getHeight
    val out = new Array[Byte](h0 * rowSamples)
    if (chans == 1) {
      val ras = img.getRaster
      require(ras.getNumBands == 1,
        s"geotiff: JPEG chunk decoded ${ras.getNumBands} bands where the " +
          "tile layout holds 1 sample/pixel")
      val row = new Array[Int](w0)
      val cols = math.min(w0, rowSamples)
      var y = 0
      while (y < h0) {
        ras.getSamples(0, y, w0, 1, 0, row)
        var x = 0
        while (x < cols) { out(y * rowSamples + x) = row(x).toByte; x += 1 }
        y += 1
      }
    } else {
      require(chans == 3,
        s"geotiff: JPEG chunky layout supports 1 or 3 samples/pixel, got $chans")
      val px = img.getRGB(0, 0, w0, h0, null, 0, w0)
      val cols = math.min(w0, rowSamples / 3)
      var y = 0
      while (y < h0) {
        var x = 0
        while (x < cols) {
          val p = px(y * w0 + x)
          val o = y * rowSamples + x * 3
          out(o) = ((p >> 16) & 0xff).toByte
          out(o + 1) = ((p >> 8) & 0xff).toByte
          out(o + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
    }
    out
  }

  /** Encode one plane-major chunk (8-bit unsigned samples, `width`
    * samples per row) as a standalone grayscale JPEG at the given
    * ImageIO quality fraction. */
  private def jpegEncodeGray(raw: Array[Byte], width: Int,
      quality: Double): Array[Byte] = {
    val h0 = raw.length / width
    val img = new java.awt.image.BufferedImage(width, h0,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, h0, raw)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality.toFloat)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** PackBits decode (TIFF 6.0 §9): n in [0,127] copy n+1 literals,
    * n in [-127,-1] repeat next byte 1-n times, -128 is a no-op. */
  private def packBitsDecode(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len * 2)
    var i = off
    val end = off + len
    while (i < end) {
      val n = data(i).toInt; i += 1
      if (n >= 0) {
        val count = n + 1
        require(i + count <= end, "geotiff: truncated PackBits literal run")
        out.write(data, i, count); i += count
      } else if (n != -128) {
        require(i < end, "geotiff: truncated PackBits repeat run")
        val b = data(i); i += 1
        var k = 1 - n
        while (k > 0) { out.write(b); k -= 1 }
      }
    }
    out.toByteArray
  }

  /** PackBits encode, restarted at every row boundary as TIFF requires
    * (`rowBytes` = bytes per image row in this strip's layout). */
  private def packBitsEncode(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
    var rowStart = 0
    while (rowStart < data.length) {
      val rowEnd = math.min(rowStart + rowBytes, data.length)
      var i = rowStart
      while (i < rowEnd) {
        // find run length of identical bytes at i
        var run = 1
        while (i + run < rowEnd && run < 128 && data(i + run) == data(i)) run += 1
        if (run >= 2) {
          out.write(1 - run); out.write(data(i)); i += run
        } else {
          // literal run: until the next >=3 repeat or 128 bytes
          var j = i + 1
          var break = false
          while (j < rowEnd && j - i < 128 && !break) {
            if (j + 2 < rowEnd && data(j) == data(j + 1) && data(j) == data(j + 2))
              break = true
            else j += 1
          }
          out.write(j - i - 1); out.write(data, i, j - i); i = j
        }
      }
      rowStart = rowEnd
    }
    out.toByteArray
  }

  private def inflateBytes(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data, off, len)
    val out = new java.io.ByteArrayOutputStream(math.max(64, len * 4))
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) out.write(buf, 0, inf.inflate(buf))
    inf.end()
    out.toByteArray
  }

  /** First 1-2 SHORT values packed into the 4-byte inline slot (LE). */
  private def packShortsInline(vs: Seq[Int]): Long =
    vs.zipWithIndex.map { case (v, i) => (v.toLong & 0xffff) << (16 * i) }.sum

  private def packBytesInline(b: Array[Byte]): Long =
    b.zipWithIndex.map { case (v, i) => (v.toLong & 0xff) << (8 * i) }.sum

  // ------------------------------------------------------------------
  // reader

  def read(bytes: Array[Byte]): Raster = {
    require(bytes.length >= 8, "geotiff: truncated header")
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("geotiff: not a TIFF (bad byte order)")
    }
    val bb = ByteBuffer.wrap(bytes).order(order)
    val magic = bb.getShort(2)
    require(magic == 42 || magic == 43, "geotiff: bad TIFF magic")
    // BigTIFF (magic 43): 8-byte offsets, u64 IFD count, 20-byte entries,
    // 8-byte inline value slot — GDAL writes it whenever BIGTIFF=YES or
    // the payload nears 4 GB, so read-side interop has to speak it even
    // for small files
    val big = magic == 43
    if (big) require(bb.getShort(4) == 8 && bb.getShort(6) == 0,
      "geotiff: bad BigTIFF header")
    val ifdOff = if (big) bb.getLong(8).toInt else bb.getInt(4)
    val n = if (big) bb.getLong(ifdOff).toInt else bb.getShort(ifdOff) & 0xffff
    val entryBase = ifdOff + (if (big) 8 else 2)
    val entrySize = if (big) 20 else 12
    val valSlot = if (big) 12 else 8
    val inlineMax = if (big) 8 else 4
    @inline def readOff(pos: Int): Int =
      if (big) bb.getLong(pos).toInt else bb.getInt(pos)
    // tag -> (type, count, valueOffsetPos)
    val tags = (0 until n).map { i =>
      val p = entryBase + i * entrySize
      val count = if (big) bb.getLong(p + 4).toInt else bb.getInt(p + 4)
      (bb.getShort(p) & 0xffff, (bb.getShort(p + 2) & 0xffff, count, p + valSlot))
    }.toMap

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
      case 5 | 10 | 12 | 16 | 17 | 18 => 8
      case other => throw new IllegalArgumentException(s"geotiff: field type $other")
    }
    def valuesOf(tag: Int): Option[IndexedSeq[Long]] = tags.get(tag).map {
      case (typ, count, pos) =>
        val sz = typeSize(typ)
        val off = if (sz * count <= inlineMax) pos else readOff(pos)
        (0 until count).map { i =>
          typ match {
            case 1 | 2 | 7 => (bb.get(off + i) & 0xff).toLong
            case 6 => bb.get(off + i).toLong
            case 3 => (bb.getShort(off + i * 2) & 0xffff).toLong
            case 8 => bb.getShort(off + i * 2).toLong
            case 4 => bb.getInt(off + i * 4) & 0xffffffffL
            case 9 => bb.getInt(off + i * 4).toLong
            case 16 | 17 | 18 => bb.getLong(off + i * 8)
            case other => throw new IllegalArgumentException(
              s"geotiff: integer read of type $other")
          }
        }
    }
    def doublesOf(tag: Int): Option[IndexedSeq[Double]] = tags.get(tag).map {
      case (typ, count, pos) =>
        require(typ == 12, s"geotiff: tag $tag expected DOUBLE, got type $typ")
        val off = if (count * 8 <= inlineMax) pos else readOff(pos)
        (0 until count).map(i => bb.getDouble(off + i * 8))
    }
    def asciiOf(tag: Int): Option[String] = tags.get(tag).map { case (typ, count, pos) =>
      require(typ == 2, s"geotiff: tag $tag expected ASCII")
      val off = if (count <= inlineMax) pos else readOff(pos)
      new String(bytes, off, count, "US-ASCII").takeWhile(_ != '\u0000')
    }
    def one(tag: Int, default: => Long): Long =
      valuesOf(tag).map(_.head).getOrElse(default)

    val w = one(TImageWidth, throw new IllegalArgumentException("geotiff: no width")).toInt
    val h = one(TImageLength, throw new IllegalArgumentException("geotiff: no height")).toInt
    val nb = one(TSamplesPerPixel, 1L).toInt
    val compression = one(TCompression, 1L).toInt
    // 5 = LZW, 7 = JPEG (TTN2), 8 = Adobe deflate, 32946 = legacy
    // deflate, 32773 = PackBits
    require(compression == 1 || compression == 5 || compression == 7 ||
      compression == 8 || compression == 32946 || compression == 32773,
      s"geotiff: compression $compression not supported (NONE/LZW/JPEG/DEFLATE/PACKBITS only)")
    val jpegTables: Array[Byte] = tags.get(TJpegTables).map { case (_, count, pos) =>
      val off = if (count <= inlineMax) pos else readOff(pos)
      java.util.Arrays.copyOfRange(bytes, off, off + count)
    }.orNull
    val predictor = one(TPredictor, 1L).toInt
    val planar = one(TPlanarConfig, 1L).toInt
    val bits = valuesOf(TBitsPerSample).map(_.map(_.toInt)).getOrElse(IndexedSeq.fill(nb)(1))
    val formats = valuesOf(TSampleFormat).map(_.map(_.toInt))
      .getOrElse(IndexedSeq.fill(nb)(1))
    require(bits.distinct.length == 1 && formats.distinct.length == 1,
      "geotiff: mixed per-band sample layouts not supported")
    val bitsPer = bits.head
    val fmt = formats.head
    val bytesPer = bitsPer / 8
    val samplesPerRow = if (planar == 2) w else w * nb
    val stride = if (planar == 2) 1 else nb

    // decompress one strip/tile chunk and undo its row predictor
    def decode(off: Int, len: Int, rowSamples: Int): Array[Byte] = {
      val chunk = compression match {
        case 1 => java.util.Arrays.copyOfRange(bytes, off, off + len)
        case 5 => lzwDecode(bytes, off, len)
        case 7 => jpegDecodeChunk(
          java.util.Arrays.copyOfRange(bytes, off, off + len),
          jpegTables, rowSamples, stride)
        case 32773 => packBitsDecode(bytes, off, len)
        case _ => inflateBytes(bytes, off, len)
      }
      predictor match {
        case 1 => chunk
        case 2 => undoHorizontalPredictor(chunk, rowSamples, stride, bytesPer, order)
        case 3 => undoFloatPredictor(chunk, rowSamples, bytesPer, order)
        case p => throw new IllegalArgumentException(s"geotiff: predictor $p not supported")
      }
    }

    // assemble the whole-image sample buffer (plane-major for planar=2,
    // row-major chunky else) from strips or tiles
    val assembled: Array[Byte] =
      if (tags.contains(TTileWidth)) {
        val tw = one(TTileWidth, 0L).toInt
        val th = one(TTileLength, 0L).toInt
        require(tw > 0 && th > 0, "geotiff: bad tile size")
        val tOffs = valuesOf(TTileOffsets).getOrElse(
          throw new IllegalArgumentException("geotiff: no tile offsets"))
        val tCounts = valuesOf(TTileByteCounts).getOrElse(
          throw new IllegalArgumentException("geotiff: no tile byte counts"))
        val across = (w + tw - 1) / tw
        val down = (h + th - 1) / th
        val planes = if (planar == 2) nb else 1
        val chans = if (planar == 2) 1 else nb // sample channels per pixel in buffer
        val tileRowSamples = tw * chans
        val out = new Array[Byte](w.toLong.toInt * h * nb * bytesPer)
        var ti = 0
        while (ti < planes * down * across) {
          val pl = ti / (down * across)
          val ty = (ti % (down * across)) / across
          val tx = ti % across
          require(ti < tOffs.length && ti < tCounts.length, "geotiff: missing tiles")
          val tile = decode(tOffs(ti).toInt, tCounts(ti).toInt, tileRowSamples)
          val validRows = math.min(th, h - ty * th)
          val validCols = math.min(tw, w - tx * tw)
          var r0 = 0
          while (r0 < validRows) {
            val srcOff = r0 * tileRowSamples * bytesPer
            val dstSample =
              pl.toLong * w * h + ((ty.toLong * th + r0) * w + tx.toLong * tw) * chans
            System.arraycopy(tile, srcOff, out, (dstSample * bytesPer).toInt,
              validCols * chans * bytesPer)
            r0 += 1
          }
          ti += 1
        }
        out
      } else {
        val stripOffs = valuesOf(TStripOffsets).getOrElse(
          throw new IllegalArgumentException("geotiff: no strip offsets"))
        val stripCounts = valuesOf(TStripByteCounts).getOrElse(
          throw new IllegalArgumentException("geotiff: no strip byte counts"))
        val raw = new java.io.ByteArrayOutputStream()
        stripOffs.zip(stripCounts).foreach { case (o, c) =>
          raw.write(decode(o.toInt, c.toInt, samplesPerRow))
        }
        raw.toByteArray
      }
    val data = ByteBuffer.wrap(assembled).order(order)
    require(assembled.length >= w.toLong * h * nb * bytesPer,
      s"geotiff: pixel data truncated (${assembled.length} bytes for ${w}x$h x$nb x$bytesPer)")

    @inline def sample(idx: Int): Double = (fmt, bitsPer) match {
      case (3, 64) => data.getDouble(idx * 8)
      case (3, 32) => data.getFloat(idx * 4).toDouble
      case (1, 8) => (data.get(idx) & 0xff).toDouble
      case (2, 8) => data.get(idx).toDouble
      case (1, 16) => (data.getShort(idx * 2) & 0xffff).toDouble
      case (2, 16) => data.getShort(idx * 2).toDouble
      case (1, 32) => (data.getInt(idx * 4) & 0xffffffffL).toDouble
      case (2, 32) => data.getInt(idx * 4).toDouble
      case (1, 64) =>
        val v = data.getLong(idx * 8)
        if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552E19
      case (2, 64) => data.getLong(idx * 8).toDouble
      case other => throw new IllegalArgumentException(
        s"geotiff: unsupported sample layout $other")
    }
    val nodata = asciiOf(TGdalNoData).map { s =>
      if (s.equalsIgnoreCase("nan")) Double.NaN else s.trim.toDouble
    }.getOrElse(Double.NaN)
    val bands = (0 until nb).map { b =>
      val vals = new Array[Double](w * h)
      var i = 0
      while (i < w * h) {
        val idx = if (planar == 2) b * w * h + i else i * nb + b
        vals(i) = sample(idx)
        i += 1
      }
      Band(nodata, RasterModel.packDoubles(vals), ptype = pixelTypeName(fmt, bitsPer))
    }

    val gt = gtFrom(doublesOf(TModelTransformation), doublesOf(TModelPixelScale),
      doublesOf(TModelTiepoint))
    val crs = crsFrom(valuesOf(TGeoKeyDirectory))

    Raster(crs, gt, w, h, bands)
  }

  /** Declared source pixel type from (SampleFormat, BitsPerSample) —
    * reference raster.rs:210-223 names; null when unrecognized. */
  private def pixelTypeName(fmt: Int, bits: Int): String = (fmt, bits) match {
    case (1, 8) => "UNSIGNED_8BITS"
    case (1, 16) => "UNSIGNED_16BITS"
    case (1, 32) => "UNSIGNED_32BITS"
    case (1, 64) => "UNSIGNED_64BITS"
    case (2, 8) => "SIGNED_8BITS"
    case (2, 16) => "SIGNED_16BITS"
    case (2, 32) => "SIGNED_32BITS"
    case (2, 64) => "SIGNED_64BITS"
    case (3, 32) => "REAL_32BITS"
    case (3, 64) => "REAL_64BITS"
    case _ => null
  }

  private def gtFrom(transformation: Option[IndexedSeq[Double]],
      scale: Option[IndexedSeq[Double]],
      tiepoint: Option[IndexedSeq[Double]]): Array[Double] =
    transformation match {
      case Some(t) => Array(t(3), t(0), t(1), t(7), t(4), t(5))
      case None =>
        (scale, tiepoint) match {
          case (Some(sc), Some(tp)) =>
            // tiepoint: raster (i,j,k) -> model (x,y,z); gt shifts the
            // origin back to pixel (0,0)
            Array(tp(3) - tp(0) * sc(0), sc(0), 0.0,
              tp(4) + tp(1) * sc(1), 0.0, -sc(1))
          case _ => Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        }
    }

  private def crsFrom(geoKeys: Option[IndexedSeq[Long]]): String =
    geoKeys.map { dir =>
      // entries of 4 shorts after the 4-short header
      val epsg = (1 until dir.length / 4).collectFirst {
        case i if dir(4 * i) == GKProjectedCSType || dir(4 * i) == GKGeographicType =>
          dir(4 * i + 3).toInt
      }
      epsg.map(c => s"EPSG:$c").getOrElse("EPSG:0")
    }.getOrElse("EPSG:0")

  /** Fetch-based TIFF/BigTIFF IFD parser shared by the bounded-read
    * paths (readMeta, readWindow): 8-byte header, the IFD, and targeted
    * fetches of out-of-line tag values only. `fetch(off, len)` must
    * return exactly `len` bytes. */
  private final class TiffTags(fetch: (Long, Int) => Array[Byte],
      ifdAt: Long = -1L) {
    val order: ByteOrder = {
      val head0 = fetch(0L, 8)
      (head0(0).toChar, head0(1).toChar) match {
        case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
        case ('M', 'M') => ByteOrder.BIG_ENDIAN
        case _ => throw new IllegalArgumentException("geotiff: not a TIFF (bad byte order)")
      }
    }
    private val head = ByteBuffer.wrap(fetch(0L, 8)).order(order)
    private val magic = head.getShort(2)
    require(magic == 42 || magic == 43, "geotiff: bad TIFF magic")
    private val big = magic == 43
    private val (n, entrySize, valSlot, inlineMax, entries, nextIfdOff) =
      if (big) {
        require(head.getShort(4) == 8 && head.getShort(6) == 0,
          "geotiff: bad BigTIFF header")
        val o = if (ifdAt >= 0) ifdAt
          else ByteBuffer.wrap(fetch(8L, 8)).order(order).getLong(0)
        val cnt = ByteBuffer.wrap(fetch(o, 8)).order(order).getLong(0).toInt
        val next = ByteBuffer.wrap(fetch(o + 8 + cnt * 20L, 8)).order(order).getLong(0)
        (cnt, 20, 12, 8, ByteBuffer.wrap(fetch(o + 8, cnt * 20)).order(order), next)
      } else {
        val o = if (ifdAt >= 0) ifdAt else head.getInt(4) & 0xffffffffL
        val cnt = ByteBuffer.wrap(fetch(o, 2)).order(order).getShort(0) & 0xffff
        val next = ByteBuffer.wrap(fetch(o + 2 + cnt * 12L, 4))
          .order(order).getInt(0) & 0xffffffffL
        (cnt, 12, 8, 4, ByteBuffer.wrap(fetch(o + 2, cnt * 12)).order(order), next)
      }
    /** File offset of the next IFD in the chain; 0 terminates. */
    def nextIfd: Long = nextIfdOff

    // tag -> (type, count, byte offset of the inline value slot)
    private val tags: Map[Int, (Int, Int, Int)] = (0 until n).map { i =>
      val p = i * entrySize
      val count = if (big) entries.getLong(p + 4).toInt else entries.getInt(p + 4)
      (entries.getShort(p) & 0xffff) ->
        ((entries.getShort(p + 2) & 0xffff, count, p + valSlot))
    }.toMap
    def has(tag: Int): Boolean = tags.contains(tag)
    private def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
      case 5 | 10 | 12 | 16 | 17 | 18 => 8
      case other => throw new IllegalArgumentException(s"geotiff: field type $other")
    }
    // value bytes: inline when they fit the value slot, else one
    // targeted fetch at the stored offset
    private def bytesOf(typ: Int, count: Int, pos: Int): ByteBuffer = {
      val sz = typeSize(typ) * count
      val bb =
        if (sz <= inlineMax) {
          val out = new Array[Byte](sz)
          var i = 0
          while (i < sz) { out(i) = entries.get(pos + i); i += 1 }
          ByteBuffer.wrap(out)
        } else {
          val off = if (big) entries.getLong(pos) else entries.getInt(pos) & 0xffffffffL
          ByteBuffer.wrap(fetch(off, sz))
        }
      bb.order(order)
    }
    def longsOf(tag: Int): Option[IndexedSeq[Long]] = tags.get(tag).map {
      case (typ, count, pos) =>
        val bb = bytesOf(typ, count, pos)
        (0 until count).map { i =>
          typ match {
            case 1 | 2 | 7 => (bb.get(i) & 0xff).toLong
            case 6 => bb.get(i).toLong
            case 3 => (bb.getShort(i * 2) & 0xffff).toLong
            case 8 => bb.getShort(i * 2).toLong
            case 4 => bb.getInt(i * 4) & 0xffffffffL
            case 9 => bb.getInt(i * 4).toLong
            case 16 | 17 | 18 => bb.getLong(i * 8)
            case other => throw new IllegalArgumentException(
              s"geotiff: integer read of type $other")
          }
        }
    }
    def doublesOf(tag: Int): Option[IndexedSeq[Double]] = tags.get(tag).map {
      case (typ, count, pos) =>
        require(typ == 12, s"geotiff: tag $tag expected DOUBLE, got type $typ")
        val bb = bytesOf(typ, count, pos)
        (0 until count).map(i => bb.getDouble(i * 8))
    }
    def asciiOf(tag: Int): Option[String] = tags.get(tag).map {
      case (typ, count, pos) =>
        require(typ == 2, s"geotiff: tag $tag expected ASCII")
        val bb = bytesOf(typ, count, pos)
        val raw = new Array[Byte](count)
        bb.get(raw)
        new String(raw, "US-ASCII").takeWhile(_ != '\u0000')
    }
    def one(tag: Int, default: => Long): Long =
      longsOf(tag).map(_.head).getOrElse(default)
    /** Raw value bytes of a tag (e.g. UNDEFINED-typed JPEGTables). */
    def rawOf(tag: Int): Option[Array[Byte]] = tags.get(tag).map {
      case (typ, count, pos) =>
        val bb = bytesOf(typ, count, pos)
        val out = new Array[Byte](typeSize(typ) * count)
        bb.get(out)
        out
    }
  }

  /** Header-only metadata read for the out-db loader path: bounded
    * fetches — 8-byte header, the IFD, and the handful of referenced geo
    * tag values; strip/tile pixel bytes are never touched, so an S3
    * `rs_frompath` over a fleet of large tiles costs a few KB per file.
    * `fetch(off, len)` must return exactly `len` bytes.
    */
  def readMeta(fetch: (Long, Int) => Array[Byte]): Raster = {
    val t = new TiffTags(fetch)
    val w = t.longsOf(TImageWidth).map(_.head.toInt)
      .getOrElse(throw new IllegalArgumentException("geotiff: no width"))
    val h = t.longsOf(TImageLength).map(_.head.toInt)
      .getOrElse(throw new IllegalArgumentException("geotiff: no height"))
    val gt = gtFrom(t.doublesOf(TModelTransformation), t.doublesOf(TModelPixelScale),
      t.doublesOf(TModelTiepoint))
    Raster(crsFrom(t.longsOf(TGeoKeyDirectory)), gt, w, h, Vector.empty)
  }

  /** Windowed read: decodes ONLY the strips/tiles that intersect the
    * pixel window [xoff, xoff+ww) x [yoff, yoff+wh), fetching their byte
    * ranges individually — the out-db scale path for rasters far larger
    * than memory (a point sample over a tiled scene fetches one tile, not
    * the file). The returned raster has the window's dimensions and a
    * geotransform translated to the window origin, so world-coordinate
    * sampling on it agrees with the full image. The analog of the
    * reference's lazy per-band out-db fetch
    * (rust/sedona-schema/src/raster.rs outdb bands + async
    * RS_EnsureLoaded); GDAL calls this a RasterIO window. */
  /** Reduced-resolution overview levels of a COG-style multi-IFD file:
    * (ifdOffset, width, height) in chain order, coarsest last when the
    * writer follows COG convention. Bounded fetches only (headers). */
  def overviews(fetch: (Long, Int) => Array[Byte]): IndexedSeq[(Long, Int, Int)] = {
    val res = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
    var next = new TiffTags(fetch).nextIfd
    var guard = 0
    while (next != 0 && guard < 64) {
      val ov = new TiffTags(fetch, next)
      val w = ov.one(TImageWidth, 0L).toInt
      val h = ov.one(TImageLength, 0L).toInt
      // accept chained IFDs marked reduced-resolution (bit 0 of 254) or,
      // like GDAL, any smaller follow-on image in the chain
      if (w > 0 && h > 0) res += ((next, w, h))
      guard += 1
      next = ov.nextIfd
    }
    res.toIndexedSeq
  }

  /** True when the main IFD stores pixels in strips (row-contiguous
    * full-width chunks) rather than tiles — the layout that benefits
    * from full-width row-band windowing (tiled/COG files must stay on
    * the block-window path). Header-bounded fetches only. */
  def isStripLayout(fetch: (Long, Int) => Array[Byte]): Boolean =
    !new TiffTags(fetch, -1L).has(TTileWidth)

  def readWindow(fetch: (Long, Int) => Array[Byte],
      xoff: Int, yoff: Int, ww: Int, wh: Int,
      ifdAt: Long = -1L, fallbackGt: Array[Double] = null,
      fallbackCrs: String = null): Raster = {
    val t = new TiffTags(fetch, ifdAt)
    val w = t.one(TImageWidth, throw new IllegalArgumentException("geotiff: no width")).toInt
    val h = t.one(TImageLength, throw new IllegalArgumentException("geotiff: no height")).toInt
    require(xoff >= 0 && yoff >= 0 && ww > 0 && wh > 0 &&
      xoff.toLong + ww <= w && yoff.toLong + wh <= h,
      s"geotiff: window ($xoff,$yoff ${ww}x$wh) outside raster ${w}x$h")
    val nb = t.one(TSamplesPerPixel, 1L).toInt
    val compression = t.one(TCompression, 1L).toInt
    require(compression == 1 || compression == 5 || compression == 7 ||
      compression == 8 || compression == 32946 || compression == 32773,
      s"geotiff: compression $compression not supported (NONE/LZW/JPEG/DEFLATE/PACKBITS only)")
    val jpegTables: Array[Byte] = t.rawOf(TJpegTables).orNull
    val predictor = t.one(TPredictor, 1L).toInt
    val planar = t.one(TPlanarConfig, 1L).toInt
    val bits = t.longsOf(TBitsPerSample).map(_.map(_.toInt)).getOrElse(IndexedSeq.fill(nb)(1))
    val formats = t.longsOf(TSampleFormat).map(_.map(_.toInt))
      .getOrElse(IndexedSeq.fill(nb)(1))
    require(bits.distinct.length == 1 && formats.distinct.length == 1,
      "geotiff: mixed per-band sample layouts not supported")
    val bitsPer = bits.head
    val fmt = formats.head
    val bytesPer = bitsPer / 8
    val chans = if (planar == 2) 1 else nb
    val stride = if (planar == 2) 1 else nb
    val planes = if (planar == 2) nb else 1

    def decodeBytes(data: Array[Byte], rowSamples: Int): Array[Byte] = {
      val len = data.length
      val chunk = compression match {
        case 1 => data
        case 5 => lzwDecode(data, 0, len)
        case 7 => jpegDecodeChunk(data, jpegTables, rowSamples, chans)
        case 32773 => packBitsDecode(data, 0, len)
        case _ => inflateBytes(data, 0, len)
      }
      predictor match {
        case 1 => chunk
        case 2 => undoHorizontalPredictor(chunk, rowSamples, stride, bytesPer, t.order)
        case 3 => undoFloatPredictor(chunk, rowSamples, bytesPer, t.order)
        case p => throw new IllegalArgumentException(s"geotiff: predictor $p not supported")
      }
    }

    // window sample buffer: plane-major for planar=2, chunky row-major else
    val out = new Array[Byte](ww * wh * nb * bytesPer)
    if (t.has(TTileWidth)) {
      val tw = t.one(TTileWidth, 0L).toInt
      val th = t.one(TTileLength, 0L).toInt
      require(tw > 0 && th > 0, "geotiff: bad tile size")
      val tOffs = t.longsOf(TTileOffsets).getOrElse(
        throw new IllegalArgumentException("geotiff: no tile offsets"))
      val tCounts = t.longsOf(TTileByteCounts).getOrElse(
        throw new IllegalArgumentException("geotiff: no tile byte counts"))
      val across = (w + tw - 1) / tw
      val down = (h + th - 1) / th
      val tileRowSamples = tw * chans
      // enumerate the window's tiles up front so FetchPipeline can keep
      // the NEXT tile's fetch in flight while this one decompresses
      val tileIdx = for {
        pl <- 0 until planes
        ty <- (yoff / th) to ((yoff + wh - 1) / th)
        tx <- (xoff / tw) to ((xoff + ww - 1) / tw)
      } yield (pl, ty, tx)
      FetchPipeline.run(fetch, tileIdx.map { case (pl, ty, tx) =>
        val ti = pl * down * across + ty * across + tx
        require(ti < tOffs.length && ti < tCounts.length, "geotiff: missing tiles")
        (tOffs(ti), tCounts(ti).toInt)
      }) { (i, data) =>
        val (pl, ty, tx) = tileIdx(i)
        val tile = decodeBytes(data, tileRowSamples)
        val rowLo = math.max(yoff, ty * th)
        val rowHi = math.min(math.min(yoff + wh, ty * th + th), h)
        val colLo = math.max(xoff, tx * tw)
        val colHi = math.min(math.min(xoff + ww, tx * tw + tw), w)
        var r0 = rowLo
        while (r0 < rowHi) {
          val srcOff = ((r0 - ty * th) * tileRowSamples + (colLo - tx * tw) * chans) * bytesPer
          val dstSample =
            pl.toLong * ww * wh + ((r0 - yoff).toLong * ww + (colLo - xoff)) * chans
          System.arraycopy(tile, srcOff, out, (dstSample * bytesPer).toInt,
            (colHi - colLo) * chans * bytesPer)
          r0 += 1
        }
      }
    } else {
      val rps = math.max(1, t.one(TRowsPerStrip, h.toLong).toInt)
      val stripOffs = t.longsOf(TStripOffsets).getOrElse(
        throw new IllegalArgumentException("geotiff: no strip offsets"))
      val stripCounts = t.longsOf(TStripByteCounts).getOrElse(
        throw new IllegalArgumentException("geotiff: no strip byte counts"))
      val stripsPerPlane = (h + rps - 1) / rps
      val samplesPerRow = w * chans
      val rawStrips = compression == 1 && predictor == 1
      val stripIdx = for {
        pl <- 0 until planes
        s0 <- (yoff / rps) to ((yoff + wh - 1) / rps)
      } yield (pl, s0)
      FetchPipeline.run(fetch, stripIdx.map { case (pl, s0) =>
        val si = pl * stripsPerPlane + s0
        require(si < stripOffs.length && si < stripCounts.length,
          "geotiff: missing strips")
        if (rawStrips) {
          // uncompressed strips are row-addressable: fetch ONLY the
          // window's row range instead of the whole strip — with the
          // writer's default single-strip layout, this is what makes a
          // windowed read O(window) bytes instead of O(image)
          val rowLo = math.max(yoff, s0 * rps)
          val rowHi = math.min(math.min(yoff + wh, (s0 + 1) * rps), h)
          (stripOffs(si) + (rowLo - s0 * rps).toLong * samplesPerRow * bytesPer,
            (rowHi - rowLo) * samplesPerRow * bytesPer)
        } else (stripOffs(si), stripCounts(si).toInt)
      }) { (i, data) =>
        val (pl, s0) = stripIdx(i)
        val rowLo = math.max(yoff, s0 * rps)
        val rowHi = math.min(math.min(yoff + wh, (s0 + 1) * rps), h)
        val (strip, stripBase) =
          if (rawStrips) (data, rowLo)
          else (decodeBytes(data, samplesPerRow), s0 * rps)
        var r0 = rowLo
        while (r0 < rowHi) {
          val srcOff = ((r0 - stripBase) * samplesPerRow + xoff * chans) * bytesPer
          val dstSample =
            pl.toLong * ww * wh + (r0 - yoff).toLong * ww * chans
          System.arraycopy(strip, srcOff, out, (dstSample * bytesPer).toInt,
            ww * chans * bytesPer)
          r0 += 1
        }
      }
    }

    val data = ByteBuffer.wrap(out).order(t.order)
    @inline def sample(idx: Int): Double = (fmt, bitsPer) match {
      case (3, 64) => data.getDouble(idx * 8)
      case (3, 32) => data.getFloat(idx * 4).toDouble
      case (1, 8) => (data.get(idx) & 0xff).toDouble
      case (2, 8) => data.get(idx).toDouble
      case (1, 16) => (data.getShort(idx * 2) & 0xffff).toDouble
      case (2, 16) => data.getShort(idx * 2).toDouble
      case (1, 32) => (data.getInt(idx * 4) & 0xffffffffL).toDouble
      case (2, 32) => data.getInt(idx * 4).toDouble
      case (1, 64) =>
        val v = data.getLong(idx * 8)
        if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552E19
      case (2, 64) => data.getLong(idx * 8).toDouble
      case other => throw new IllegalArgumentException(
        s"geotiff: unsupported sample layout $other")
    }
    val nodata = t.asciiOf(TGdalNoData).map { s =>
      if (s.equalsIgnoreCase("nan")) Double.NaN else s.trim.toDouble
    }.getOrElse(Double.NaN)
    val bands = (0 until nb).map { b =>
      val vals = new Array[Double](ww * wh)
      var i = 0
      while (i < ww * wh) {
        val idx = if (planar == 2) b * ww * wh + i else i * nb + b
        vals(i) = sample(idx)
        i += 1
      }
      Band(nodata, RasterModel.packDoubles(vals), ptype = pixelTypeName(fmt, bitsPer))
    }

    // COG overview IFDs conventionally omit geo tags: fall back to the
    // caller-scaled main-image geotransform/CRS when absent
    val hasGeo = t.has(TModelTransformation) ||
      (t.has(TModelPixelScale) && t.has(TModelTiepoint))
    val gt =
      if (!hasGeo && fallbackGt != null) fallbackGt
      else gtFrom(t.doublesOf(TModelTransformation), t.doublesOf(TModelPixelScale),
        t.doublesOf(TModelTiepoint))
    val crs =
      if (!t.has(TGeoKeyDirectory) && fallbackCrs != null) fallbackCrs
      else crsFrom(t.longsOf(TGeoKeyDirectory))
    // geotransform translated to the window origin so world coordinates
    // of the windowed pixels match the full image
    val gtW = Array(
      gt(0) + xoff * gt(1) + yoff * gt(2), gt(1), gt(2),
      gt(3) + xoff * gt(4) + yoff * gt(5), gt(4), gt(5))
    Raster(crs, gtW, ww, wh, bands)
  }
}
